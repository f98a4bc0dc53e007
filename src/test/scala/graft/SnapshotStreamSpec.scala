package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.operators.{SnapshotTable => ST}

/** Structured Streaming reads over the snapshot chain: offsets are snapshot
  * ids checkpointed by Spark, so a restarted query resumes from the
  * committed snapshot exactly once; admission control cuts on commit
  * boundaries; row-removing snapshots fail the stream loudly.
  */
class SnapshotStreamSpec extends SparkSpec {

  private def tmp() = java.nio.file.Files.createTempDirectory("graft_snapstream").toString

  private val Fmt = "graft.sources.SnapshotStreamSource"

  private def rows(ids: Range) = {
    import spark.implicits._
    ids.map(i => (i.toLong, s"v$i", Seq(i, i + 1, i + 2))).toDF("id", "v", "tokens")
  }

  test("drains the retained chain, then a restart streams only new commits") {
    val t = tmp(); val out = tmp(); val chk = tmp()
    ST.append(spark, rows(0 until 4), t)
    ST.append(spark, rows(4 until 10), t)
    def runOnce(): Unit = {
      val q = spark.readStream.format(Fmt).option("path", t).load()
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", chk)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(120000)
    }
    runOnce()
    val first = spark.read.parquet(out)
    assert(first.count() == 10)
    // byte-level row fidelity incl. the token-array column
    val got = first.orderBy("id").collect().map(r =>
      (r.getLong(0), r.getString(1), r.getSeq[Int](2)))
    assert(got.toSeq == (0 until 10).map(i => (i.toLong, s"v$i", Seq(i, i + 1, i + 2))))
    // nothing new: a rerun on the same checkpoint emits zero rows
    runOnce()
    assert(spark.read.parquet(out).count() == 10)
    // two more commits: only the delta streams
    ST.append(spark, rows(10 until 12), t)
    ST.compact(spark, t) // replace snapshot: same rows, must emit nothing
    ST.append(spark, rows(12 until 15), t)
    runOnce()
    assert(spark.read.parquet(out).count() == 15)
    assert(spark.read.parquet(out).select(sum("id")).collect()(0).getLong(0) ==
      (0 until 15).map(_.toLong).sum)
  }

  test("max_snapshots_per_trigger drains a backlog on commit boundaries") {
    val t = tmp(); val chk = tmp()
    (0 until 4).foreach(i => ST.append(spark, rows(i * 3 until i * 3 + 3), t))
    val batches = new java.util.concurrent.ConcurrentHashMap[Long, Long]()
    val q = spark.readStream.format(Fmt).option("path", t)
      .option("max_snapshots_per_trigger", "1").load()
      .writeStream.option("checkpointLocation", chk)
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, id: Long) =>
        batches.put(id, df.count()); ()
      }
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    import scala.jdk.CollectionConverters._
    val sizes = batches.asScala.toSeq.sortBy(_._1).map(_._2)
    // one commit (3 rows) per micro-batch, never a merged mega-batch
    assert(sizes == Seq(3L, 3L, 3L, 3L))
  }

  test("starting=latest sees only commits made after stream start") {
    val t = tmp(); val out = tmp(); val chk = tmp()
    ST.append(spark, rows(0 until 5), t) // pre-existing history: skipped
    def runOnce(): Unit = {
      val q = spark.readStream.format(Fmt).option("path", t)
        .option("starting", "latest").load()
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", chk)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(120000)
    }
    runOnce()
    assert(spark.read.parquet(out).count() == 0)
    ST.append(spark, rows(5 until 8), t)
    runOnce()
    assert(spark.read.parquet(out).select("id").collect().map(_.getLong(0)).sorted.toSeq ==
      Seq(5L, 6L, 7L))
  }

  test("schema evolution: pre-ADD-COLUMN commits stream the new column as null") {
    import spark.implicits._
    val t = tmp(); val out = tmp(); val chk = tmp()
    ST.append(spark, Seq((0L, "a")).toDF("id", "v"), t)
    ST.append(spark, Seq((1L, "b", 0.5)).toDF("id", "v", "score"), t)
    val q = spark.readStream.format(Fmt).option("path", t).load()
      .writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", chk)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val got = spark.read.parquet(out).orderBy("id").collect()
    assert(got.length == 2)
    assert(got(0).isNullAt(2) && got(1).getDouble(2) == 0.5)
  }

  test("a row-removing snapshot in range fails the stream loudly") {
    import spark.implicits._
    val t = tmp(); val chk = tmp()
    ST.append(spark, rows(0 until 5), t)
    ST.deleteKeys(spark, t, Seq(2L).toDF("id"), "id")
    val q = spark.readStream.format(Fmt).option("path", t).load()
      .writeStream.option("checkpointLocation", chk)
      .foreachBatch { (_: org.apache.spark.sql.DataFrame, _: Long) => () }
      .trigger(Trigger.AvailableNow()).start()
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q.awaitTermination(120000)
    }
    assert(e.getMessage.contains("mor-delete") ||
      Option(e.getCause).exists(_.getMessage.contains("mor-delete")))
  }
}
