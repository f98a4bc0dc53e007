package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.{SnapshotPipe, SnapshotTable => ST}

class SnapshotPipeSpec extends SparkSpec {

  private def tbl(): String =
    java.nio.file.Files.createTempDirectory("graft_snappipe").toString

  private def ids(df: DataFrame): Set[Long] =
    df.select("id").collect().map(_.getLong(0)).toSet

  test("pipe materializes chunks in order, sees history, resumes as a no-op") {
    import spark.implicits._
    val src = tbl(); val sink = tbl()
    ST.append(spark, Seq(1L, 2L).toDF("id"), src)        // snap 0
    ST.append(spark, Seq(3L).toDF("id"), src)            // snap 1
    ST.append(spark, Seq(4L, 5L).toDF("id"), src)        // snap 2

    var seen = Vector.empty[(Set[Long], Option[Set[Long]])]
    val commits = SnapshotPipe.run(spark, src, sink, maxSnapshotsPerChunk = 1) {
      (delta, hist) =>
        seen :+= ((ids(delta), hist.map(ids)))
        delta.withColumn("id", col("id") * 10)
    }
    assert(commits.size == 3 && commits.forall(!_.skippedExisting))
    // chunks in snapshot order; history = sink-so-far (None on the virgin sink)
    assert(seen == Vector(
      (Set(1L, 2L), None),
      (Set(3L), Some(Set(10L, 20L))),
      (Set(4L, 5L), Some(Set(10L, 20L, 30L)))))
    assert(ids(ST.read(spark, sink)) == Set(10L, 20L, 30L, 40L, 50L))
    assert(SnapshotPipe.lastProcessed(spark, sink, src).contains(2L))

    // caught up: a rerun does nothing
    assert(SnapshotPipe.run(spark, src, sink)((d, _) => d).isEmpty)

    // new source snapshot -> exactly one more chunk, with full history visible
    ST.append(spark, Seq(6L).toDF("id"), src)
    val more = SnapshotPipe.run(spark, src, sink) { (d, h) =>
      assert(h.map(ids).contains(Set(10L, 20L, 30L, 40L, 50L)))
      d.withColumn("id", col("id") * 10)
    }
    assert(more.map(_.skippedExisting) == Seq(false))
    assert(ids(ST.read(spark, sink)) == Set(10L, 20L, 30L, 40L, 50L, 60L))
  }

  test("crash-after-commit replay is skipped; crash-before-commit reruns") {
    import spark.implicits._
    val src = tbl(); val sink = tbl()
    ST.append(spark, Seq(1L).toDF("id"), src)            // snap 0
    ST.append(spark, Seq(2L).toDF("id"), src)            // snap 1

    // simulate a run that crashed after committing chunk (-1, 0] but before
    // (0, 1]: the sink already holds the chunk's batch id
    ST.append(spark, Seq(1L).toDF("id"), sink,
      Some(s"incr-${SnapshotPipe.srcToken(src)}-0"))
    val commits = SnapshotPipe.run(spark, src, sink, maxSnapshotsPerChunk = 1) {
      (d, _) => d
    }
    // resume starts PAST the committed bound — only (0, 1] runs, no replay
    assert(commits.map(_.skippedExisting) == Seq(false))
    assert(ids(ST.read(spark, sink)) == Set(1L, 2L))

    // a transform failure (crash before commit) leaves no ledger entry,
    // so the failed chunk reruns from scratch
    ST.append(spark, Seq(3L).toDF("id"), src)            // snap 2
    intercept[RuntimeException] {
      SnapshotPipe.run(spark, src, sink)((_, _) => sys.error("mid-chunk crash"))
    }
    assert(SnapshotPipe.lastProcessed(spark, sink, src).contains(1L))
    val retried = SnapshotPipe.run(spark, src, sink)((d, _) => d)
    assert(retried.map(_.skippedExisting) == Seq(false))
    assert(ids(ST.read(spark, sink)) == Set(1L, 2L, 3L))
  }

  test("virgin source and oversize chunk bounds") {
    import spark.implicits._
    val src = tbl(); val sink = tbl()
    assert(SnapshotPipe.run(spark, src, sink)((d, _) => d).isEmpty)
    ST.append(spark, Seq(1L).toDF("id"), src)
    ST.append(spark, Seq(2L).toDF("id"), src)
    // one chunk spanning both snapshots when no admission bound is given
    val c = SnapshotPipe.run(spark, src, sink)((d, _) => d)
    assert(c.size == 1)
    assert(ids(ST.read(spark, sink)) == Set(1L, 2L))
  }

  test("two sources into one sink keep independent cursors") {
    import spark.implicits._
    val srcA = tbl(); val srcB = tbl(); val sink = tbl()
    ST.append(spark, Seq(1L, 2L).toDF("id"), srcA)       // A snap 0
    ST.append(spark, Seq(3L).toDF("id"), srcA)           // A snap 1
    ST.append(spark, Seq(10L).toDF("id"), srcB)          // B snap 0
    assert(SnapshotPipe.run(spark, srcA, sink)((d, _) => d).size == 1)
    // B starts from ITS OWN virgin cursor — A's committed bound (1) must
    // not be mistaken for B's progress, and B's chunks must not be skipped
    val cb = SnapshotPipe.run(spark, srcB, sink)((d, _) => d)
    assert(cb.size == 1 && cb.forall(!_.skippedExisting))
    assert(ids(ST.read(spark, sink)) == Set(1L, 2L, 3L, 10L))
    assert(SnapshotPipe.lastProcessed(spark, sink, srcA).contains(1L))
    assert(SnapshotPipe.lastProcessed(spark, sink, srcB).contains(0L))
  }

  test("virgin sink bootstraps from a partially-expired source via asOf") {
    import spark.implicits._
    val src = tbl(); val sink = tbl()
    ST.append(spark, Seq(1L).toDF("id"), src)            // snap 0 (will expire)
    ST.append(spark, Seq(2L).toDF("id"), src)            // snap 1 (will expire)
    ST.append(spark, Seq(3L).toDF("id"), src)            // snap 2
    ST.append(spark, Seq(4L).toDF("id"), src)            // snap 3
    ST.expire(spark, src, keepLast = 2)                  // retained: 2, 3
    var chunks = Vector.empty[Set[Long]]
    val c = SnapshotPipe.run(spark, src, sink, maxSnapshotsPerChunk = 1) {
      (d, _) => chunks :+= ids(d); d
    }
    assert(c.size == 2 && c.forall(!_.skippedExisting))
    // bootstrap chunk = FULL state as of snap 2 (rows 1..3), then the delta
    assert(chunks == Vector(Set(1L, 2L, 3L), Set(4L)))
    assert(ids(ST.read(spark, sink)) == Set(1L, 2L, 3L, 4L))
    // resume after bootstrap is incremental, not a re-bootstrap
    ST.append(spark, Seq(5L).toDF("id"), src)
    assert(SnapshotPipe.run(spark, src, sink)((d, _) => d).size == 1)
    assert(ids(ST.read(spark, sink)) == Set(1L, 2L, 3L, 4L, 5L))
  }

  test("fails loudly when the cursor fell behind retention or the source regressed") {
    import spark.implicits._
    val src = tbl(); val sink = tbl()
    (0 to 3).foreach(i => ST.append(spark, Seq(i.toLong).toDF("id"), src))
    // sink processed through snap 0, then source snaps 0..1 expire
    ST.append(spark, Seq(0L).toDF("id"), sink,
      Some(s"incr-${SnapshotPipe.srcToken(src)}-0"))
    ST.expire(spark, src, keepLast = 2)                  // retained: 2, 3
    val e1 = intercept[IllegalArgumentException] {
      SnapshotPipe.run(spark, src, sink)((d, _) => d)
    }
    assert(e1.getMessage.contains("expired"))

    // cursor ahead of the source's latest snapshot = wiped/mismatched source
    val src2 = tbl(); val sink2 = tbl()
    ST.append(spark, Seq(1L).toDF("id"), src2)
    ST.append(spark, Seq(1L).toDF("id"), sink2,
      Some(s"incr-${SnapshotPipe.srcToken(src2)}-7"))
    val e2 = intercept[IllegalArgumentException] {
      SnapshotPipe.run(spark, src2, sink2)((d, _) => d)
    }
    assert(e2.getMessage.contains("ahead of source"))
  }
}
