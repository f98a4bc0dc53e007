package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Incremental table-to-table materialization over [[SnapshotTable]] chains —
  * the "streaming read of an Iceberg table" surface, built as a resumable
  * batch pipe rather than a DSv2 reader on purpose: a custom
  * `PartitionReader` would have to re-implement parquet decoding (bypassing
  * Spark's vectorized reader), while here every chunk is an ordinary
  * `incremental(a, b]` DataFrame planned through the native parquet scan,
  * and the SINK TABLE'S OWN batch-commit ledger is the checkpoint.
  *
  * Exactly-once by construction, with ZERO extra state files: chunk
  * `(a, b]` commits under batch id `incr-<src>-<b>` (`<src>` = a hash of
  * the source table path, so two pipes feeding one sink from different
  * sources keep independent cursors); resume reads the max committed upper
  * bound for THIS source back out of the sink's ledger
  * ([[SnapshotTable.Manifest.batchCommits]], one driver-side manifest
  * read). A crash BEFORE the commit leaves no ledger entry — the rerun
  * re-processes the chunk; a crash AFTER leaves the entry — the rerun's
  * append is skipped. This is the same recovery contract as the
  * reference's PQ `firstUnackedSeqNum` replay (Checkpoint.java:24-44),
  * with the sink commit as the ack.
  *
  * Source expiry: a virgin sink against a source whose early history was
  * expired BOOTSTRAPS from the earliest retained snapshot — the first
  * chunk is that snapshot's FULL table state (`asOf`, the Delta/Iceberg
  * "initial snapshot" of a streaming read), and incremental chunks follow.
  * A non-virgin sink whose cursor has fallen behind the retained horizon
  * fails loudly (the missed deltas are physically gone — silently skipping
  * them would drop data), as does a cursor AHEAD of the source's latest
  * snapshot (the source was wiped or the path points at a different
  * table).
  *
  * The transform sees the chunk's delta AND the sink's history frame
  * (`None` on a virgin sink), so incremental corpus maintenance composes
  * directly: quality-gate the new shard, dedup it against everything
  * already curated ([[graft.functions.Dedup.incrementalNew]] is the
  * scale-shaped partner — bloom-gated, broadcast-only), append survivors.
  * Cost per run scales with the DELTA (only the new snapshots' data dirs
  * are listed or scanned) plus whatever the transform reads of history —
  * never with the table size by construction.
  */
object SnapshotPipe {

  /** Stable 8-hex-char token identifying a source table path inside the
    * sink ledger's batch ids.
    */
  private[graft] def srcToken(srcDir: String): String = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(srcDir.getBytes("UTF-8"))
    d.take(4).map(b => f"${b & 0xff}%02x").mkString
  }

  /** Upper bound (source snapshot id) of the last chunk committed into
    * `sinkDir` FROM `srcDir`, recovered from the sink ledger; None for a
    * virgin sink or one never written by a pipe over this source.
    */
  def lastProcessed(spark: SparkSession, sinkDir: String,
                    srcDir: String): Option[Long] = {
    val re = s"incr-${srcToken(srcDir)}-(\\d+)".r
    SnapshotTable.latestId(spark, sinkDir).flatMap { id =>
      val ledger = SnapshotTable.manifest(spark, sinkDir, id).batchCommits
      val bounds = ledger.collect { case (re(b), _) => b.toLong }
      if (bounds.isEmpty) None else Some(bounds.max)
    }
  }

  /** Process every source snapshot not yet materialized into `sinkDir`, in
    * chunks of at most `maxSnapshotsPerChunk` source snapshots (admission
    * control — the `max_bytes_per_trigger` analogue: bound each run's
    * working set under a backlog instead of swallowing it whole). Returns
    * the commits made, in order; empty when already caught up.
    *
    * `transform(delta, history)` maps one chunk's incremental rows (plus
    * the sink-so-far, `None` when the sink is empty) to the rows to
    * append. Chunks run strictly in snapshot order, so arrival order is
    * preserved across crashes and reruns.
    */
  def run(spark: SparkSession, srcDir: String, sinkDir: String,
          maxSnapshotsPerChunk: Int = Int.MaxValue)
         (transform: (DataFrame, Option[DataFrame]) => DataFrame): Seq[SnapshotTable.Commit] = {
    require(maxSnapshotsPerChunk >= 1, "chunk size must be >= 1")
    val latest = SnapshotTable.latestId(spark, srcDir).getOrElse(
      return Nil) // virgin source: nothing to do
    val earliest = SnapshotTable.earliestId(spark, srcDir).get
    val tok = srcToken(srcDir)
    val cursor = lastProcessed(spark, sinkDir, srcDir)
    require(cursor.forall(_ <= latest),
      s"sink $sinkDir is ahead of source $srcDir (cursor ${cursor.get} > " +
        s"latest $latest): the source was recreated or the path points at " +
        "a different table — refusing to silently re-baseline")
    require(cursor.forall(_ >= earliest - 1),
      s"sink $sinkDir resumes at snapshot ${cursor.get} but source history " +
        s"before $earliest was expired — the missed deltas are gone; " +
        "re-bootstrap into a fresh sink or widen source retention")

    def history(): Option[DataFrame] =
      if (SnapshotTable.latestId(spark, sinkDir).isEmpty) None
      else Some(SnapshotTable.read(spark, sinkDir))

    // Bootstrap: a virgin cursor against a partially-expired source takes
    // snapshot `earliest`'s FULL state as the first chunk (incremental
    // history before it no longer exists; its live set is the complete
    // table as of that snapshot).
    val boot: Seq[SnapshotTable.Commit] =
      if (cursor.isEmpty && earliest > 0)
        Seq(SnapshotTable.append(spark,
          transform(SnapshotTable.asOf(spark, srcDir, earliest), history()),
          sinkDir, Some(s"incr-$tok-$earliest")))
      else Nil
    val from = if (boot.nonEmpty) earliest else cursor.getOrElse(-1L)

    // chunk boundaries over (from, latest], each at most K snapshots wide
    val bounds = (from until latest by maxSnapshotsPerChunk.toLong) :+ latest
    boot ++ bounds.sliding(2).collect { case Seq(a, b) if a < b =>
      val delta = SnapshotTable.incremental(spark, srcDir, a, b)
      SnapshotTable.append(spark, transform(delta, history()), sinkDir,
        Some(s"incr-$tok-$b"))
    }.toSeq
  }
}
