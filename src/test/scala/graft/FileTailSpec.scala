package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** FileTailSource: byte-offset tail semantics (the file input's sincedb
  * contract) — parallel batch splits lose/duplicate nothing at arbitrary
  * byte boundaries, a restarted stream resumes from the committed offset
  * exactly once, and an unterminated trailing line stays pending until its
  * newline arrives.
  */
class FileTailSpec extends SparkSpec {

  private def append(path: java.nio.file.Path, s: String): Unit =
    java.nio.file.Files.writeString(path, s,
      java.nio.file.StandardOpenOption.CREATE, java.nio.file.StandardOpenOption.APPEND)

  test("batch read: newline-aligned splits reproduce the file for every partition count") {
    val f = java.nio.file.Files.createTempFile("graft_tail_batch", ".log")
    val lines = (1 to 997).map(i => s"line-$i-${"x" * (i % 7)}")
    java.nio.file.Files.writeString(f, lines.mkString("", "\n", "\n"))
    for (parts <- Seq(1, 3, 8, 64)) {
      val got = spark.read.format("graft.sources.FileTailSource")
        .option("path", f.toString).option("partitions", parts).load()
        .orderBy("offset").collect()
      assert(got.length == lines.length, s"parts=$parts")
      assert(got.map(_.getString(1)).toSeq == lines, s"parts=$parts")
    }
    // offsets are real byte positions: re-reading each line at its offset
    val got = spark.read.format("graft.sources.FileTailSource")
      .option("path", f.toString).load().orderBy("offset").collect()
    val raf = new java.io.RandomAccessFile(f.toString, "r")
    try {
      val r = got(500)
      raf.seek(r.getLong(0))
      assert(raf.readLine() == r.getString(1))
    } finally raf.close()
  }

  test("streaming: offset-checkpointed restart emits appended lines exactly once") {
    val f = java.nio.file.Files.createTempFile("graft_tail_stream", ".log")
    val tmp = java.nio.file.Files.createTempDirectory("graft_tail_ck")
    val ck = s"$tmp/ck"; val out = s"$tmp/out"
    append(f, "a1\na2\na3\n")

    def runOnce(): Unit = {
      val q = spark.readStream.format("graft.sources.FileTailSource")
        .option("path", f.toString).load()
        .writeStream.option("checkpointLocation", ck)
        .trigger(Trigger.AvailableNow())
        .format("parquet").option("path", out).start()
      q.awaitTermination(60000); ()
    }

    runOnce()
    val r1 = spark.read.parquet(out)
    assert(r1.count() == 3)

    // append two complete lines and one UNTERMINATED line, then restart
    append(f, "b1\nb2\npartial")
    runOnce()
    val r2 = spark.read.parquet(out).orderBy("offset").collect()
    assert(r2.map(_.getString(1)).toSeq == Seq("a1", "a2", "a3", "b1", "b2"))

    // finishing the partial line makes it (and only it) appear
    append(f, "-done\nc1\n")
    runOnce()
    val r3 = spark.read.parquet(out).orderBy("offset").collect()
    assert(r3.map(_.getString(1)).toSeq ==
      Seq("a1", "a2", "a3", "b1", "b2", "partial-done", "c1"))
    // exactly-once: no duplicates across the three runs
    assert(r3.map(_.getLong(0)).distinct.length == r3.length)
  }

  test("LSCL file input mode => tail reads through the DSv2 source") {
    val f = java.nio.file.Files.createTempFile("graft_tail_lscl", ".log")
    java.nio.file.Files.writeString(f, "ERROR boom\nINFO fine\nERROR again\n")
    val cfg = graft.lscl.Lscl.parse(
      s"""input { file { path => "$f" mode => "tail" } }
         |filter {
         |  if [message] =~ /^ERROR/ { mutate { add_tag => ["err"] } }
         |}""".stripMargin, Map.empty)
    val df = graft.lscl.LsclRun.applyFilters(
      graft.lscl.LsclRun.source(spark, cfg.inputs), cfg.filters)
    assert(df.filter(array_contains(col("tags"), "err")).count() == 2)
    assert(df.count() == 3)
  }

  test("max_bytes_per_trigger: a backlog drains in bounded batches, exactly once") {
    val f = java.nio.file.Files.createTempFile("graft_tail_adm", ".log")
    val lines = (0 until 200).map(i => f"line-$i%03d")
    java.nio.file.Files.writeString(f, lines.mkString("", "\n", "\n"))
    val tmp = java.nio.file.Files.createTempDirectory("graft_tail_adm")
    val batches = new java.util.concurrent.atomic.AtomicInteger(0)
    val seen = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
    val q = spark.readStream.format("graft.sources.FileTailSource")
      .option("path", f.toString)
      .option("max_bytes_per_trigger", 256).load()
      .writeStream.option("checkpointLocation", s"$tmp/ck")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        val rows = b.collect()
        if (rows.nonEmpty) {
          batches.incrementAndGet()
          // per-batch byte cap honored (9 bytes per line incl. newline)
          assert(rows.length * 9 <= 256 + 9, s"batch too big: ${rows.length}")
          rows.foreach(r => seen.add(r.getString(1)))
        }
        ()
      }.start()
    q.awaitTermination(120000)
    assert(batches.get() >= 5, s"expected bounded batches, got ${batches.get()}")
    assert(seen.size == 200) // exactly-once across all admitted batches
  }
}
