package graft

import graft.operators.{SnapshotTable => ST}

/** Model-based randomized check for the snapshot-table commit protocol: a
  * deterministic random sequence of append / replayed-append / compact /
  * expire operations is mirrored in an in-memory model, and after every
  * operation the table's `read`, `asOf` and `changelog` views must agree
  * with the model exactly.
  */
class SnapshotPropertySpec extends SparkSpec {

  /** Model of one committed snapshot: `live` = its data-dir count (append =
    * parent's + 1, replace = 1) — expiry never changes it, only drops old
    * snapshots from the retained chain.
    */
  private case class Snap(id: Long, op: String, added: Set[Long],
                          total: Set[Long], live: Int)

  private def rowsOf(df: org.apache.spark.sql.DataFrame): Set[Long] =
    df.select("id").collect().map(_.getLong(0)).toSet

  test("random op sequences agree with an in-memory model") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val t = java.nio.file.Files.createTempDirectory("graft_snapprop").toString
    var chain = Vector.empty[Snap]          // retained (non-expired) snapshots
    var nextVal = 0L
    var batchSeq = 0
    var usedBatchIds = Vector.empty[String] // batch ids known committed

    for (step <- 0 until 22) {
      rnd.nextInt(10) match {
        case n if n <= 4 => // fresh append
          val k = 1 + rnd.nextInt(5)
          val rows = (nextVal until nextVal + k).toSet
          nextVal += k
          batchSeq += 1
          val bid = s"b$batchSeq"
          val c = ST.append(spark, rows.toSeq.toDF("id"), t, Some(bid))
          assert(!c.skippedExisting, s"step $step: fresh batch $bid must commit")
          usedBatchIds :+= bid
          chain :+= Snap(c.snapshotId, "append", rows,
            chain.lastOption.map(_.total).getOrElse(Set.empty) ++ rows,
            chain.lastOption.map(_.live).getOrElse(0) + 1)
        case n if n <= 6 && usedBatchIds.nonEmpty => // replayed append: must skip
          val bid = usedBatchIds(rnd.nextInt(usedBatchIds.size))
          val c = ST.append(spark, Seq(999999L).toDF("id"), t, Some(bid))
          assert(c.skippedExisting, s"step $step: replay of $bid must be skipped")
        case n if n <= 8 && chain.nonEmpty => // compact
          val c = ST.compact(spark, t)
          if (chain.last.live > 1) {
            assert(!c.skippedExisting, s"step $step: compact must commit")
            chain :+= Snap(c.snapshotId, "replace", Set.empty, chain.last.total, 1)
          } else assert(c.skippedExisting, s"step $step: 1-dir compact must skip")
        case _ if chain.size > 1 => // expire
          val keep = 1 + rnd.nextInt(chain.size - 1)
          ST.expire(spark, t, keepLast = keep)
          val dropped = chain.dropRight(keep)
          chain = chain.takeRight(keep)
          // expired snapshots must fail loudly
          dropped.lastOption.foreach { s =>
            intercept[IllegalArgumentException](ST.asOf(spark, t, s.id)); ()
          }
        case _ => () // nothing applicable yet
      }

      if (chain.nonEmpty) {
        assert(rowsOf(ST.read(spark, t)) == chain.last.total, s"step $step: read mismatch")
        // time travel to one random retained snapshot
        val pick = chain(rnd.nextInt(chain.size))
        assert(rowsOf(ST.asOf(spark, t, pick.id)) == pick.total,
          s"step $step: asOf(${pick.id}) mismatch")
      }
    }

    // final changelog over the whole retained chain: appended rows, each
    // tagged with the snapshot that committed it; replaces contribute nothing
    if (chain.size > 1) {
      val from = chain.head.id
      val to = chain.last.id
      val got = ST.changelog(spark, t, from, to)
        .select("id", "_snapshot_id").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toSet
      val want = chain.filter(s => s.id > from && s.op == "append")
        .flatMap(s => s.added.map(_ -> s.id)).toSet
      assert(got == want, s"changelog($from,$to] mismatch")
    }
  }
}
