package graft

import java.util.concurrent.Executors

import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration._

import org.apache.spark.sql.functions._
import graft.operators.{SnapshotTable => ST}

/** Optimistic multi-writer appends: CAS on the manifest rename, rebase from
  * the current head on a lost race, exactly-once batch ids under contention.
  * Deterministic interleavings use the `beforeCommit` seam; the threaded
  * stress case covers the nondeterministic schedule.
  */
class SnapshotConcurrencySpec extends SparkSpec {

  private def tmp() = java.nio.file.Files.createTempDirectory("graft_conc").toString

  private def band(b: Int, n: Int = 100) = {
    import spark.implicits._
    (0 until n).map(i => (b * 1000L + i, s"w$b-$i", b)).toDF("id", "v", "writer")
  }

  test("the CAS primitive: hard-link claims atomically; rename would not") {
    // why link(2) and not rename: POSIX rename silently REPLACES an existing
    // destination — two racing committers would tear each other's manifests
    // (this actually happened: torn data/crc under a 4-writer race)
    val d = java.nio.file.Paths.get(tmp())
    val a = d.resolve("a"); val b = d.resolve("b"); val c = d.resolve("c")
    java.nio.file.Files.write(a, "A".getBytes)
    java.nio.file.Files.write(b, "B".getBytes)
    assert(a.toFile.renameTo(b.toFile), "POSIX rename replaces — not a CAS")
    // link onto a fresh name claims it and exposes complete content at once
    java.nio.file.Files.createLink(c, b)
    assert(new String(java.nio.file.Files.readAllBytes(c)) == "A")
    // link onto an existing name fails atomically in the kernel
    intercept[java.nio.file.FileAlreadyExistsException] {
      java.nio.file.Files.createLink(c, b)
    }
  }

  test("8 threads appending concurrently: all commit, no loss, contiguous chain") {
    val t = tmp()
    val pool = Executors.newFixedThreadPool(8)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    val commits = try {
      Await.result(Future.sequence((0 until 8).map { b =>
        Future(ST.appendConcurrent(spark, band(b), t,
          batchId = Some(s"batch-$b"), statsBy = Seq("id"), maxRetries = 64))
      }), 120.seconds)
    } finally pool.shutdown()
    assert(commits.forall(!_.skippedExisting))
    assert(commits.map(_.snapshotId).sorted == (0L until 8L))
    val m = ST.manifest(spark, t, 7)
    assert(m.totalRows == 800 && m.live.size == 8)
    // chain integrity: every manifest's parent is its predecessor
    (1L to 7L).foreach { id =>
      assert(ST.manifest(spark, t, id).parentId.contains(id - 1))
    }
    // ledger carries every batch exactly once
    assert(m.batchCommits.map(_._1).sorted == (0 until 8).map(b => s"batch-$b"))
    // no row lost, no row duplicated
    val got = ST.read(spark, t)
    assert(got.count() == 800)
    assert(got.select("id").distinct().count() == 800)
    (0 until 8).foreach { b =>
      assert(got.filter(col("writer") === b).count() == 100)
    }
    // replayed batch under no contention: skipped via the merged ledger
    val replay = ST.appendConcurrent(spark, band(3), t, batchId = Some("batch-3"))
    assert(replay.skippedExisting && ST.read(spark, t).count() == 800)
    // stats followed every winner's final dir name: a band predicate prunes
    // to exactly one dir
    val (kept, pruned) = ST.planScan(m, ST.KeyRange("id", Some(3000L), Some(3099L)))
    assert(kept.size == 1 && pruned.size == 7)
  }

  test("lost race rebases: dir renamed to the final id, stats/sidecars follow") {
    val t = tmp()
    ST.append(spark, band(0), t, batchId = Some("b0"), statsBy = Seq("id"), bloomBy = Seq("v"))
    // rival commits snapshot 1 between our manifest build and our CAS
    var armed = true
    val c = ST.appendConcurrent(spark, band(2), t, batchId = Some("b2"),
      bloomBy = Seq("v"),
      beforeCommit = () => if (armed) { armed = false; ST.append(spark, band(1), t, Some("b1")) })
    assert(c.snapshotId == 2 && !c.skippedExisting)
    val m = ST.manifest(spark, t, 2)
    // the concurrent dir's name embeds the FINAL id (addSeq correctness for
    // merge-on-read deletes), not the id of the losing first attempt
    val concDir = m.added.head
    assert(concDir.matches("snap-000002-c[0-9a-f]{8}"), s"got $concDir")
    assert(m.live == Seq("snap-000000", "snap-000001", concDir))
    assert(m.totalRows == 300)
    // manifest stats relabeled onto the final name
    assert(m.stats.exists(st => st.dir == concDir && st.column == "id"))
    assert(!m.stats.exists(_.dir.contains("snap-000001-c")))
    // exactly one sidecar for our dir, under the final name (the stale
    // first-attempt sidecar was deleted)
    val fs = new org.apache.hadoop.fs.Path(t).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val sidecars = fs.listStatus(new org.apache.hadoop.fs.Path(t, "_manifests/bloom"))
      .map(_.getPath.getName).filter(_.contains("-c")).toSeq
    assert(sidecars == Seq(s"$concDir.v.bloom"), s"got $sidecars")
    // the sketch is probeable through the normal point-lookup path
    val hit = ST.readWhereEq(spark, t, "v", "w2-5")
    assert(hit.count() == 1)
    // a later MOR delete reaches the concurrently-appended rows (addSeq from
    // the suffixed name), and the read path applies it
    import spark.implicits._
    ST.deleteKeys(spark, t, Seq(2005L).toDF("id"), "id")
    assert(ST.read(spark, t).filter(col("id") === 2005L).count() == 0)
    assert(ST.read(spark, t).count() == 299)
  }

  test("same batch id racing: the loser skips, cleans its staged dir, keeps one copy") {
    val t = tmp()
    ST.append(spark, band(0), t, Some("seed"))
    var armed = true
    val c = ST.appendConcurrent(spark, band(5), t, batchId = Some("dup"),
      beforeCommit = () => if (armed) { armed = false; ST.append(spark, band(5), t, Some("dup")) })
    assert(c.skippedExisting && c.snapshotId == 1)
    assert(ST.latestId(spark, t).contains(1L))
    assert(ST.read(spark, t).count() == 200)
    // the loser's staged dir is gone without waiting for vacuum
    val fs = new org.apache.hadoop.fs.Path(t).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dataDirs = fs.listStatus(new org.apache.hadoop.fs.Path(t, "data"))
      .map(_.getPath.getName).toSeq
    assert(!dataDirs.exists(_.contains("-c")), s"staged leftovers: $dataDirs")
  }

  test("retry exhaustion fails loudly and leaves a vacuum-reapable orphan") {
    val t = tmp()
    ST.append(spark, band(0), t)
    val e = intercept[RuntimeException] {
      ST.appendConcurrent(spark, band(1), t, maxRetries = 0,
        beforeCommit = () => ST.append(spark, band(9), t))
    }
    assert(e.getMessage.contains("lost the commit race"))
    // the staged dir is an orphan until vacuum reaps it
    val reaped = ST.vacuum(spark, t)
    assert(reaped.exists(_.contains("-c")), s"vacuum reaped $reaped")
    assert(ST.read(spark, t).count() == 200) // band 0 + the rival's band 9
  }

  test("concurrent appends onto a schema-evolving table merge per-head") {
    import spark.implicits._
    val t = tmp()
    ST.append(spark, Seq((1L, "a")).toDF("id", "v"), t)
    // rival evolves the schema (adds w) between our build and CAS
    var armed = true
    val c = ST.appendConcurrent(spark,
      Seq((2L, 7.5)).toDF("id", "x"), t,
      beforeCommit = () => if (armed) { armed = false
        ST.append(spark, Seq((3L, "c", true)).toDF("id", "v", "w"), t) })
    assert(c.snapshotId == 2)
    val got = ST.read(spark, t)
    // union of all three schemas: the rebase re-merged against the rival's
    // stamped schema, not the stale base
    assert(got.columns.sorted.toSeq == Seq("id", "v", "w", "x"))
    assert(got.count() == 3)
    assert(got.filter(col("id") === 2L).select("x").as[Double].head() == 7.5)
    assert(got.filter(col("id") === 3L).select("w").as[Boolean].head())
  }
}
