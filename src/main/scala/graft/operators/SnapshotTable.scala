package graft.operators

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.model.Json

/** Snapshot-chained sink tables: the "Iceberg sink table" surface of the
  * north star — append-only batches committed as numbered snapshots, with
  * time-travel reads, incremental/changelog reads between snapshots,
  * exactly-once batch idempotence, small-file compaction, and snapshot
  * expiry.
  *
  * This is the lake-native generalization of the reference's two durability
  * devices: the persistent queue's checkpoint files — a checkpoint is "a
  * picture of some of the queue state" committed as ONE small file whose
  * write is the commit point (Checkpoint.java:24-44,
  * FileCheckpointIO.java:94-110) — and the DLQ's immutable, rotated segment
  * files (DeadLetterQueueWriter.java). Here every ingested batch is an
  * immutable data directory, and the commit point is the atomic rename of a
  * tiny JSON manifest; data files are never the commit.
  *
  * Layout under the table root:
  * {{{
  *   data/snap-000000/            immutable parquet dir per committed batch
  *   _manifests/manifest-000000.json
  * }}}
  *
  * Each manifest records the FULL list of live data dirs (like an Iceberg
  * manifest list), so readers plan entirely from ONE driver-side metadata
  * file: `asOf(k)` lists only snapshot k's live dirs — never the whole
  * table directory. At 100 TB that is the difference between a metadata
  * read and a full-listing of millions of files; it is also what makes
  * REPLACE (compaction) invisible to time travel and changelogs.
  *
  * Concurrency contract: single writer per table (the reference pipeline is
  * also the sole writer of its PQ/DLQ dirs). The manifest rename is a
  * commit-or-fail-loudly guard, not a retry loop; a production multi-writer
  * would layer Iceberg's optimistic CAS + uniquely-named data files on the
  * same structure.
  *
  * Crash safety: a data dir written without its manifest is garbage — the
  * next append of that snapshot id overwrites it, and no reader ever lists
  * it (readers only see manifest-referenced dirs).
  */
object SnapshotTable {

  /** One committed snapshot. `operation` is `append` (new rows) or
    * `replace` (compaction — same rows, new files). `live` is the complete
    * data-dir set of the table as of this snapshot; `added` the dirs this
    * snapshot introduced. `batchCommits` is the CUMULATIVE batch-id →
    * snapshot-id ledger carried parent→child, so exactly-once replay
    * detection reads ONE manifest (the latest) and SURVIVES snapshot expiry —
    * an expired snapshot's rows are still in the table (expiry drops history,
    * not data), so its batch id must keep skipping replays. The ledger grows
    * with batch count, not data size (one ingest per minute for a year is
    * ~500k short strings — low MBs of driver-side metadata, the same trade
    * Iceberg's metadata.json snapshot log makes).
    */
  final case class Manifest(snapshotId: Long, parentId: Option[Long],
                            operation: String, batchId: Option[String],
                            added: Seq[String], live: Seq[String],
                            addedRows: Long, totalRows: Long,
                            batchCommits: Seq[(String, Long)] = Nil,
                            schemaJson: Option[String] = None) {
    /** Table schema AS OF this snapshot (None on pre-schema manifests —
      * readers fall back to parquet footer inference).
      */
    def schema: Option[org.apache.spark.sql.types.StructType] =
      schemaJson.map(org.apache.spark.sql.types.DataType.fromJson(_)
        .asInstanceOf[org.apache.spark.sql.types.StructType])
  }

  final case class Commit(snapshotId: Long, skippedExisting: Boolean)

  private def fsOf(spark: SparkSession, dir: String): (FileSystem, Path) = {
    val p = new Path(dir)
    (p.getFileSystem(spark.sparkContext.hadoopConfiguration), p)
  }

  private def manifestDir(root: Path) = new Path(root, "_manifests")
  private def dataDir(root: Path) = new Path(root, "data")
  private val ManifestName = "manifest-(\\d{6})\\.json".r

  private def manifestIds(fs: FileSystem, root: Path): Seq[Long] = {
    val d = manifestDir(root)
    if (!fs.exists(d)) Nil
    else fs.listStatus(d).map(_.getPath.getName)
      .collect { case ManifestName(n) => n.toLong }.sorted.toIndexedSeq
  }

  def latestId(spark: SparkSession, dir: String): Option[Long] = {
    val (fs, root) = fsOf(spark, dir)
    manifestIds(fs, root).lastOption
  }

  /** Oldest RETAINED snapshot id (expiry moves this forward). */
  def earliestId(spark: SparkSession, dir: String): Option[Long] = {
    val (fs, root) = fsOf(spark, dir)
    manifestIds(fs, root).headOption
  }

  private def render(m: Manifest): String = {
    def strList(xs: Seq[String]) = xs.map(Json.quote).mkString("[", ",", "]")
    s"""{"snapshot_id":${m.snapshotId},""" +
      s""""parent_id":${m.parentId.getOrElse("null")},""" +
      s""""operation":${Json.quote(m.operation)},""" +
      s""""batch_id":${m.batchId.map(Json.quote).getOrElse("null")},""" +
      s""""added_rows":${m.addedRows},"total_rows":${m.totalRows},""" +
      s""""added":${strList(m.added)},"live":${strList(m.live)},""" +
      // '|' is outside the validated batch-id charset, so "bid|snap" is
      // an unambiguous pair encoding
      s""""batch_commits":${strList(m.batchCommits.map { case (b, s) => s"$b|$s" })},""" +
      // base64 keeps the embedded schema JSON out of the regex decoder's way
      s""""schema_b64":${m.schemaJson.map(j => Json.quote(
        java.util.Base64.getEncoder.encodeToString(j.getBytes("UTF-8"))))
        .getOrElse("null")}}"""
  }

  // Manifest fields are machine-written with constrained values (numeric ids,
  // snap-NNNNNN dir names, batch ids validated to [A-Za-z0-9._:-]), so a
  // regex decode is exact — same stance as Route.latestManifest.
  private def parse(s: String): Manifest = {
    def num(k: String): Option[Long] =
      s"""\"$k\":(-?\\d+)""".r.findFirstMatchIn(s).map(_.group(1).toLong)
    def str(k: String): Option[String] =
      s"""\"$k\":\"([^\"]*)\"""".r.findFirstMatchIn(s).map(_.group(1))
    def list(k: String): Seq[String] = {
      val body = s"""\"$k\":\\[([^\\]]*)\\]""".r.findFirstMatchIn(s).map(_.group(1)).getOrElse("")
      "\"([^\"]*)\"".r.findAllMatchIn(body).map(_.group(1)).toIndexedSeq
    }
    Manifest(
      snapshotId = num("snapshot_id").getOrElse(sys.error(s"bad manifest: $s")),
      parentId = num("parent_id"),
      operation = str("operation").getOrElse("append"),
      batchId = str("batch_id"),
      added = list("added"), live = list("live"),
      addedRows = num("added_rows").getOrElse(0L),
      totalRows = num("total_rows").getOrElse(0L),
      batchCommits = list("batch_commits").map { e =>
        val cut = e.lastIndexOf('|')
        (e.substring(0, cut), e.substring(cut + 1).toLong)
      },
      schemaJson = str("schema_b64").map(b =>
        new String(java.util.Base64.getDecoder.decode(b), "UTF-8")))
  }

  /** Manifest of snapshot `id`; fails loudly when it was never committed or
    * has been expired (the Iceberg "snapshot not found" contract — a reader
    * pinned to an expired snapshot must error, not silently read newer data).
    */
  def manifest(spark: SparkSession, dir: String, id: Long): Manifest = {
    val (fs, root) = fsOf(spark, dir)
    val p = new Path(manifestDir(root), f"manifest-$id%06d.json")
    require(fs.exists(p),
      s"snapshot $id of $dir does not exist (never committed, or expired); " +
        s"available: ${manifestIds(fs, root).mkString(",")}")
    val in = fs.open(p)
    try parse(scala.io.Source.fromInputStream(in, "UTF-8").mkString) finally in.close()
  }

  private def commitManifest(fs: FileSystem, root: Path, m: Manifest): Unit = {
    val dir = manifestDir(root)
    fs.mkdirs(dir)
    val tmp = new Path(dir, f".manifest-${m.snapshotId}%06d.json.tmp")
    val dst = new Path(dir, f"manifest-${m.snapshotId}%06d.json")
    val out = fs.create(tmp, true)
    try out.write(render(m).getBytes("UTF-8")) finally out.close()
    require(fs.rename(tmp, dst),
      s"concurrent commit detected for snapshot ${m.snapshotId} of $root — " +
        "SnapshotTable is single-writer per table (see scaladoc)")
  }

  /** Append `df` as a new snapshot. `batchId` is the exactly-once token: a
    * batch id already committed in the table is skipped (the original
    * snapshot id returned), so a retried/replayed ingest job never
    * duplicates rows — the batch analogue of the PQ's acked-sequence
    * dedup on replay (Checkpoint.java firstUnackedSeqNum). The check reads
    * ONE manifest (the latest, via its cumulative `batchCommits` ledger),
    * so the cost is O(1) regardless of chain length, and a replay is still
    * skipped after the committing snapshot has been EXPIRED — the rows are
    * still in the table, only the history entry is gone.
    *
    * The row count is taken from the written parquet footers (a
    * metadata-only job at any scale — at production scale the writer's task
    * metrics would be carried instead, same number).
    */
  def append(spark: SparkSession, df: DataFrame, dir: String,
             batchId: Option[String] = None): Commit = {
    val (fs, root) = fsOf(spark, dir)
    batchId.foreach { b =>
      require(b.matches("[A-Za-z0-9._:-]+"),
        s"batch id '$b' must match [A-Za-z0-9._:-]+")
    }
    val ids = manifestIds(fs, root)
    val parent = ids.lastOption.map(manifest(spark, dir, _))
    // Legacy migration: a chain written before the ledger existed carries
    // per-snapshot batch_id but no cumulative ledger — when a batch-id
    // append lands on such a chain, reconstruct the ledger ONCE from the
    // retained manifests (exactly what the old full-chain replay scan
    // read); the new manifest then carries it forward, so this costs
    // O(chain) at most once per table. Batch ids of legacy snapshots that
    // were ALREADY expired are unrecoverable (the old format never
    // persisted them cumulatively).
    val ledger = parent.map(_.batchCommits).getOrElse(Nil) match {
      case Nil if batchId.nonEmpty && ids.nonEmpty =>
        ids.map(manifest(spark, dir, _))
          .flatMap(m => m.batchId.map(_ -> m.snapshotId))
      case l => l
    }
    val existing = batchId.flatMap(b => ledger.find(_._1 == b))
    existing match {
      case Some((_, snap)) => Commit(snap, skippedExisting = true)
      case None =>
        val next = ids.lastOption.map(_ + 1).getOrElse(0L)
        val name = f"snap-$next%06d"
        val dataPath = new Path(dataDir(root), name).toString
        // Overwrite: an existing dir here is an UNCOMMITTED crash leftover
        // (no manifest references it) — rewriting it is the recovery path.
        df.write.mode("overwrite").parquet(dataPath)
        val rows = spark.read.parquet(dataPath).count()
        // schema evolution: fresh tables stamp the frame's schema; evolved
        // appends merge new columns in. A LEGACY chain (parent without a
        // stamped schema) stays in footer-inference mode — stamping only
        // the new snapshot's columns would hide the older dirs' columns.
        val schemaNow: Option[String] = parent match {
          case None => Some(df.schema.json)
          case Some(p) => p.schema.map(ps => mergeSchemas(ps, df.schema).json)
        }
        val m = Manifest(next, ids.lastOption, "append", batchId,
          added = Seq(name), live = parent.map(_.live).getOrElse(Nil) :+ name,
          addedRows = rows, totalRows = parent.map(_.totalRows).getOrElse(0L) + rows,
          batchCommits = ledger ++ batchId.map(_ -> next),
          schemaJson = schemaNow)
        commitManifest(fs, root, m)
        Commit(next, skippedExisting = false)
    }
  }

  private def readDirs(spark: SparkSession, root: Path, dirs: Seq[String],
                       schema: Option[org.apache.spark.sql.types.StructType]): DataFrame = {
    require(dirs.nonEmpty, s"snapshot of $root has no data dirs")
    // Schema comes from the MANIFEST (schema-as-of-snapshot): data dirs
    // written before a column was added simply read it as null, no parquet
    // footer scan or mergeSchema pass is ever needed, and time travel sees
    // the schema the table had THEN. Pre-schema (legacy) manifests fall
    // back to footer inference.
    val reader = schema.map(spark.read.schema).getOrElse(spark.read)
    reader.parquet(dirs.map(n => new Path(dataDir(root), n).toString): _*)
  }

  /** Evolved table schema: existing columns keep their types (a type
    * change fails loudly — this surface models Iceberg ADD COLUMN, not
    * type promotion), new columns append, everything nullable (old files
    * have no values for new columns).
    */
  private def mergeSchemas(parent: org.apache.spark.sql.types.StructType,
                           incoming: org.apache.spark.sql.types.StructType) = {
    val byName = parent.fields.map(f => f.name -> f).toMap
    incoming.fields.foreach { f =>
      byName.get(f.name).foreach { pf =>
        require(pf.dataType.catalogString == f.dataType.catalogString,
          s"schema evolution cannot change column '${f.name}' from " +
            s"${pf.dataType.catalogString} to ${f.dataType.catalogString}")
      }
    }
    org.apache.spark.sql.types.StructType(
      parent.fields.map(_.copy(nullable = true)) ++
        incoming.fields.filterNot(f => byName.contains(f.name)).map(_.copy(nullable = true)))
  }

  /** Time-travel read: the table exactly as of snapshot `id`, planned from
    * that snapshot's manifest alone — later appends, compactions and (not
    * yet expired) history are invisible.
    */
  def asOf(spark: SparkSession, dir: String, id: Long): DataFrame = {
    val (_, root) = fsOf(spark, dir)
    val m = manifest(spark, dir, id)
    readDirs(spark, root, m.live, m.schema)
  }

  /** Current table = latest snapshot. */
  def read(spark: SparkSession, dir: String): DataFrame = {
    val id = latestId(spark, dir).getOrElse(
      sys.error(s"$dir has no committed snapshot"))
    asOf(spark, dir, id)
  }

  private def appendedIn(spark: SparkSession, dir: String,
                         fromExclusive: Long, toInclusive: Long): Seq[Manifest] = {
    require(fromExclusive <= toInclusive,
      s"bad incremental range ($fromExclusive, $toInclusive]")
    ((fromExclusive + 1) to toInclusive)
      .map(manifest(spark, dir, _)) // fails loudly on an expired id in range
      .filter(_.operation == "append") // replace = same rows, not a change
  }

  /** Incremental read: rows ADDED in snapshots (from, to] — only the new
    * data dirs are listed or scanned, so the cost scales with the delta,
    * not the table. `replace` snapshots (compaction) contribute nothing:
    * they rewrite files, not rows.
    */
  def incremental(spark: SparkSession, dir: String,
                  fromExclusive: Long, toInclusive: Long): DataFrame = {
    val (_, root) = fsOf(spark, dir)
    val dirs = appendedIn(spark, dir, fromExclusive, toInclusive).flatMap(_.added)
    if (dirs.isEmpty) asOf(spark, dir, toInclusive).limit(0)
    // rows surface with the range-END's schema: deltas written before a
    // column was added read it as null, like any other read as of `to`
    else readDirs(spark, root, dirs, manifest(spark, dir, toInclusive).schema)
  }

  /** Changelog read: incremental rows tagged with the `_snapshot_id` that
    * committed them (insert-only CDC over the snapshot chain).
    */
  def changelog(spark: SparkSession, dir: String,
                fromExclusive: Long, toInclusive: Long): DataFrame = {
    val (_, root) = fsOf(spark, dir)
    val toSchema = manifest(spark, dir, toInclusive).schema
    val parts = appendedIn(spark, dir, fromExclusive, toInclusive).map { m =>
      readDirs(spark, root, m.added, toSchema)
        .withColumn("_snapshot_id", lit(m.snapshotId))
    }
    parts.reduceOption(_ unionByName _).getOrElse(
      asOf(spark, dir, toInclusive).limit(0).withColumn("_snapshot_id", lit(-1L)))
  }

  /** Small-file compaction: rewrite the live file set into `targetFiles`
    * files committed as a `replace` snapshot — row set provably unchanged
    * (counted and required equal), invisible to time travel and changelogs,
    * and every later read plans over the compacted files. The ingest-side
    * answer to many-small-batch appends.
    *
    * `sortBy` additionally CLUSTERS the rewrite (range-partition on the
    * keys, sort within each file): parquet footers then carry disjoint
    * min/max ranges on the leading key, so later point/range predicates
    * skip whole files and row groups — the OPTIMIZE-with-sort analogue,
    * and the 100 TB reason compaction exists at all (append order is
    * arrival order, which clusters nothing).
    */
  def compact(spark: SparkSession, dir: String, targetFiles: Int = 1,
              sortBy: Seq[String] = Nil): Commit = {
    val (fs, root) = fsOf(spark, dir)
    val ids = manifestIds(fs, root)
    val last = ids.lastOption.getOrElse(sys.error(s"$dir has no committed snapshot"))
    val m = manifest(spark, dir, last)
    if (m.live.size <= targetFiles && sortBy.isEmpty)
      return Commit(last, skippedExisting = true)
    val next = last + 1
    val name = f"snap-$next%06d"
    val dataPath = new Path(dataDir(root), name).toString
    val base = readDirs(spark, root, m.live, m.schema)
    val arranged =
      if (sortBy.isEmpty) base.coalesce(targetFiles)
      else base.repartitionByRange(targetFiles, sortBy.map(col): _*)
        .sortWithinPartitions(sortBy.map(col): _*)
    arranged.write.mode("overwrite").parquet(dataPath)
    val rows = spark.read.parquet(dataPath).count()
    require(rows == m.totalRows,
      s"compaction row mismatch: rewrote $rows rows, expected ${m.totalRows}")
    commitManifest(fs, root, Manifest(next, Some(last), "replace", None,
      added = Seq(name), live = Seq(name), addedRows = 0L, totalRows = m.totalRows,
      batchCommits = m.batchCommits, schemaJson = m.schemaJson))
    Commit(next, skippedExisting = false)
  }

  /** Expire all but the last `keepLast` snapshots: their manifest files are
    * deleted (time travel to them now fails loudly) and data dirs referenced
    * by NO retained snapshot are physically removed. Returns the deleted
    * data-dir names. The retention analogue of the DLQ's age/size policies —
    * bounded metadata + storage under continuous ingest.
    */
  def expire(spark: SparkSession, dir: String, keepLast: Int): Seq[String] = {
    require(keepLast >= 1, "must keep at least the latest snapshot")
    val (fs, root) = fsOf(spark, dir)
    val ids = manifestIds(fs, root)
    val drop = ids.dropRight(keepLast)
    if (drop.isEmpty) return Nil
    val keepDirs = ids.takeRight(keepLast).flatMap(manifest(spark, dir, _).live).toSet
    val dropDirs = drop.flatMap(manifest(spark, dir, _).live).toSet -- keepDirs
    dropDirs.toSeq.sorted.foreach { n =>
      fs.delete(new Path(dataDir(root), n), true)
    }
    drop.foreach { id =>
      fs.delete(new Path(manifestDir(root), f"manifest-$id%06d.json"), false)
    }
    dropDirs.toSeq.sorted
  }

  /** Orphan cleanup: delete data dirs referenced by NO retained manifest —
    * crash leftovers (a dir written whose commit never happened) and any
    * debris under `data/`. Never touches referenced dirs; safe between
    * operations under the single-writer contract (the Delta VACUUM
    * analogue, with zero retention delay because a concurrent reader of an
    * uncommitted dir cannot exist — readers only plan from manifests).
    * Returns the deleted dir names.
    */
  def vacuum(spark: SparkSession, dir: String): Seq[String] = {
    val (fs, root) = fsOf(spark, dir)
    val referenced = manifestIds(fs, root)
      .flatMap(manifest(spark, dir, _).live).toSet
    val dd = dataDir(root)
    if (!fs.exists(dd)) return Nil
    val orphans = fs.listStatus(dd).map(_.getPath.getName)
      .filterNot(referenced).sorted.toIndexedSeq
    orphans.foreach(n => fs.delete(new Path(dd, n), true))
    orphans
  }

  /** Route integration: append every sink's routed frame to its own
    * snapshot table under `tableRoot/<sink>`, all sharing one batch id —
    * the north star's "conditional fan-out routing to multiple Iceberg sink
    * tables", resumable: a retried run re-appends only the sinks whose
    * (sink, batch) commit is missing, so a crash between sink commits
    * resumes exactly-once per sink. The trunk is flagged once and persisted
    * so the fan-out costs one input scan (same stance as Route.run).
    */
  def appendSinks(spark: SparkSession, trunk: DataFrame, sinks: Seq[Route.SinkSpec],
                  tableRoot: String, batchId: String): Map[String, Commit] =
    graft.plans.CacheScope.scoped {
      // persist is eager (one populate job), so sink writes share the cache
      val flagged = graft.plans.CacheScope.persist(Route.withSinkFlags(trunk, sinks))
      sinks.map { s =>
        s.name -> append(spark, Route.sinkFrame(flagged, s), s"$tableRoot/${s.name}",
          Some(batchId))
      }.toMap
    }
}
