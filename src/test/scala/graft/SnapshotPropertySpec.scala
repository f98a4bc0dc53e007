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

  test("partitioned table: random append/dynoverwrite sequences agree with a per-partition model") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val rnd = new scala.util.Random(7)
    val t = java.nio.file.Files.createTempDirectory("graft_snapdynprop").toString
    val parts = Vector("p0", "p1", "p2", "p3")
    // model history: one per-partition row-set map per committed snapshot
    var states = Vector.empty[(Long, Map[String, Set[Long]])]
    def model: Map[String, Set[Long]] =
      states.lastOption.map(_._2).getOrElse(Map.empty)
    var nextVal = 0L
    var batchSeq = 0
    var committed = Vector.empty[(String, Boolean)] // (batch id, wasOverwrite)

    def frame(rows: Map[String, Set[Long]]) =
      rows.toSeq.flatMap { case (p, ids) => ids.map(i => (i, p)) }
        .toDF("id", "part")

    for (step <- 0 until 20) {
      rnd.nextInt(10) match {
        case n if n <= 4 => // partitioned append: new rows across random parts
          val touched = parts.filter(_ => rnd.nextBoolean()) match {
            case Vector() => Vector(parts(rnd.nextInt(parts.size)))
            case ps => ps
          }
          val rows = touched.map { p =>
            val k = 1 + rnd.nextInt(3)
            val ids = (nextVal until nextVal + k).toSet
            nextVal += k
            p -> ids
          }.toMap
          batchSeq += 1
          val bid = s"a$batchSeq"
          val c = ST.appendPartitioned(spark, frame(rows), t, col("part"), Some(bid))
          assert(!c.skippedExisting, s"step $step: fresh append $bid must commit")
          committed :+= (bid, false)
          states :+= (c.snapshotId,
            (parts.map(p => p -> (model.getOrElse(p, Set.empty[Long]) ++
              rows.getOrElse(p, Set.empty))).toMap))
        case n if n <= 7 && states.nonEmpty => // dynamic overwrite of a subset
          val touched = parts.filter(_ => rnd.nextBoolean()) match {
            case Vector() => Vector(parts(rnd.nextInt(parts.size)))
            case ps => ps
          }
          val rows = touched.map { p =>
            val k = 1 + rnd.nextInt(3)
            val ids = (nextVal until nextVal + k).toSet
            nextVal += k
            p -> ids
          }.toMap
          batchSeq += 1
          val bid = s"o$batchSeq"
          val c = ST.overwritePartitions(spark, frame(rows), t, col("part"), Some(bid))
          assert(!c.skippedExisting, s"step $step: fresh overwrite $bid must commit")
          committed :+= (bid, true)
          states :+= (c.snapshotId, model ++ rows)
        case _ if committed.nonEmpty => // replay either op kind: must skip
          val (bid, wasOv) = committed(rnd.nextInt(committed.size))
          val junk = frame(Map(parts(rnd.nextInt(parts.size)) -> Set(888888L)))
          val c =
            if (wasOv) ST.overwritePartitions(spark, junk, t, col("part"), Some(bid))
            else ST.appendPartitioned(spark, junk, t, col("part"), Some(bid))
          assert(c.skippedExisting, s"step $step: replay of $bid must skip")
        case _ => ()
      }

      if (states.nonEmpty) {
        val got = ST.read(spark, t).select("id", "part").collect()
          .map(r => r.getString(1) -> r.getLong(0))
          .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
        val want = model.filter(_._2.nonEmpty)
        assert(got == want, s"step $step: read mismatch")
        // manifest row totals stay consistent under partition swaps
        val m = ST.manifest(spark, t, states.last._1)
        assert(m.totalRows == model.values.map(_.size).sum,
          s"step $step: totalRows ${m.totalRows}")
        // time travel to one random retained snapshot
        val (sid, snap) = states(rnd.nextInt(states.size))
        val gotAs = ST.asOf(spark, t, sid).select("id").collect()
          .map(_.getLong(0)).toSet
        assert(gotAs == snap.values.flatten.toSet, s"step $step: asOf($sid) mismatch")
      }
    }
  }
}
