package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column => SqlColumn, DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.analysis.{NoSuchTableException, TableAlreadyExistsException}
import org.apache.spark.sql.connector.catalog.{Identifier, SupportsDelete, SupportsRead, SupportsWrite, Table, TableCapability, TableCatalog, TableInfo}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.MicroBatchStream
import org.apache.spark.sql.connector.write.{LogicalWriteInfo, SupportsTruncate, V1Write, Write, WriteBuilder}
import org.apache.spark.sql.connector.write.streaming.StreamingWrite
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.sources.{EqualTo => SEqualTo, Filter => SFilter, GreaterThan => SGreaterThan, GreaterThanOrEqual => SGreaterThanOrEqual, IsNotNull => SIsNotNull, LessThan => SLessThan, LessThanOrEqual => SLessThanOrEqual, And => SAnd}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.operators.SnapshotTable

/** SQL catalog over [[graft.operators.SnapshotTable]] chains — the Iceberg-
  * shaped surface, Spark-first:
  *
  * {{{
  *   spark.sql.catalog.graft      = graft.sources.SnapshotCatalog
  *   spark.sql.catalog.graft.root = /warehouse          // tables are subdirs
  *   spark.sql.extensions         = graft.GraftExtensions
  *
  *   CREATE TABLE graft.logs (ts BIGINT, level STRING, msg STRING)
  *     TBLPROPERTIES (stats_by = 'ts', bloom_by = 'level')
  *   INSERT INTO graft.logs SELECT ...          -- one ledgered commit
  *   INSERT OVERWRITE graft.logs SELECT ...     -- atomic replace commit
  *   SELECT * FROM graft.logs WHERE ts BETWEEN a AND b   -- manifest-pruned
  *   SELECT count(*), min(ts), max(ts) FROM graft.logs   -- answered from
  *                                                       -- the manifest, 0 IO
  *   SELECT * FROM graft.logs VERSION AS OF 3            -- time travel (id,
  *                                          -- tag name, or 'branch:<name>')
  *   SELECT * FROM graft.logs TIMESTAMP AS OF '...'
  *   SELECT * FROM graft.logs.history                    -- metadata tables:
  *                             -- history/files/partitions/refs/branches
  *   DELETE FROM graft.logs WHERE ts < cutoff            -- copy-on-write
  *   spark.readStream.table("graft.logs")                -- incremental CDC
  *   df.writeStream.toTable("graft.logs")                -- ledgered epochs
  * }}}
  *
  * Architecture: analysis resolves identifiers here (schema from the
  * manifest — no file IO), then [[SnapshotSqlRule]] (injected by
  * `graft.GraftExtensions` as a pre-CBO rule) replaces each batch relation
  * with the table's NATIVE logical plan — the same vectorized parquet scan,
  * merge-on-read anti-joins, and schema-as-of-snapshot projection every
  * API-level read uses — after pruning data dirs driver-side with the
  * manifest's min/max stats and Bloom sidecars against the query's pushed
  * predicates. Catalyst then optimizes the substituted subtree like any
  * hand-built DataFrame: filters reach parquet row groups, scans stay in
  * whole-stage codegen, AQE re-plans shuffles. Batch writes go through the
  * DSv2 `V1Write` seam straight into [[SnapshotTable.append]]/
  * [[SnapshotTable.overwrite]], so SQL inserts get the exactly-once batch
  * ledger, manifest stats, Bloom sidecars, and schema evolution for free.
  *
  * Reference anchors: the ES output's index/upsert semantics
  * (logstash-core docs) are the sink this table family models; the
  * manifest/snapshot design notes live on [[SnapshotTable]].
  */
class SnapshotCatalog extends TableCatalog
  with org.apache.spark.sql.connector.catalog.ProcedureCatalog {

  private var catalogName: String = _
  private var root: String = _

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    root = Option(options.get("root")).getOrElse(
      throw new IllegalArgumentException(
        s"catalog '$name': set spark.sql.catalog.$name.root to the warehouse dir"))
  }

  override def name(): String = catalogName

  private def spark = SparkSession.active
  private def dirOf(table: String) = s"$root/$table"

  private def isTable(table: String): Boolean = {
    val p = new Path(dirOf(table), "_manifests")
    p.getFileSystem(spark.sessionState.newHadoopConf()).exists(p)
  }

  private val metaKinds = Set("history", "files", "partitions", "refs", "branches")

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    require(namespace.isEmpty, s"catalog '$catalogName' has a single flat namespace")
    val rp = new Path(root)
    val fs = rp.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(rp)) Array.empty
    else fs.listStatus(rp).filter(_.isDirectory).map(_.getPath.getName)
      .filter(isTable).sorted.map(Identifier.of(Array.empty, _))
  }

  override def tableExists(ident: Identifier): Boolean =
    (ident.namespace.isEmpty && isTable(ident.name)) ||
      (ident.namespace.length == 1 && metaKinds(ident.name) && isTable(ident.namespace.head))

  override def loadTable(ident: Identifier): Table = ident.namespace match {
    case Array() if isTable(ident.name) =>
      GraftSqlTable.latest(spark, dirOf(ident.name), s"$catalogName.${ident.name}")
    case Array(t) if metaKinds(ident.name) && isTable(t) =>
      new GraftMetaTable(spark, dirOf(t), s"$catalogName.$t.${ident.name}", ident.name)
    case _ => throw new NoSuchTableException(ident)
  }

  /** VERSION AS OF: a snapshot id, a tag name, or `branch:<name>`. */
  override def loadTable(ident: Identifier, version: String): Table = {
    if (ident.namespace.nonEmpty || !isTable(ident.name))
      throw new NoSuchTableException(ident)
    val dir = dirOf(ident.name)
    val qn = s"$catalogName.${ident.name}"
    if (version.startsWith("branch:"))
      GraftSqlTable.branch(spark, dir, qn, version.stripPrefix("branch:"))
    else {
      val id =
        if (version.forall(_.isDigit)) version.toLong
        else SnapshotTable.refs(spark, dir).getOrElse(version,
          sys.error(s"$qn has no tag '$version' (and it is not a snapshot id)"))
      GraftSqlTable.atId(spark, dir, qn, id, s"version $version")
    }
  }

  /** TIMESTAMP AS OF (micros since epoch, per the DSv2 contract). */
  override def loadTable(ident: Identifier, timestampMicros: Long): Table = {
    if (ident.namespace.nonEmpty || !isTable(ident.name))
      throw new NoSuchTableException(ident)
    val dir = dirOf(ident.name)
    val id = SnapshotTable.idAsOfTimestamp(spark, dir, timestampMicros / 1000L)
    GraftSqlTable.atId(spark, dir, s"$catalogName.${ident.name}", id,
      s"timestamp $timestampMicros")
  }

  override def createTable(ident: Identifier, info: TableInfo): Table =
    doCreate(ident, info.schema, info.partitions, info.properties)

  @deprecated("TableInfo variant is the entry point", "")
  override def createTable(ident: Identifier, schema: StructType,
                           partitions: Array[Transform],
                           properties: util.Map[String, String]): Table =
    doCreate(ident, schema, partitions, properties)

  private def doCreate(ident: Identifier, schema: StructType,
                       partitions: Array[Transform],
                       properties: util.Map[String, String]): Table = {
    require(ident.namespace.isEmpty,
      s"catalog '$catalogName' has a single flat namespace")
    require(partitions.isEmpty,
      "PARTITIONED BY is not mapped — use SnapshotTable.appendPartitioned " +
        "(hidden partitioning: one dir per transform value with its own stats)")
    if (isTable(ident.name)) throw new TableAlreadyExistsException(ident)
    val props = properties.asScala
    def cols(k: String): Seq[String] =
      props.get(k).map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq).getOrElse(Nil)
    SnapshotTable.create(spark, dirOf(ident.name), schema,
      statsBy = cols("stats_by"), bloomBy = cols("bloom_by"))
    loadTable(ident)
  }

  /** ALTER TABLE ADD/DROP COLUMNS — one metadata-only `alter` commit via
    * [[SnapshotTable.alterSchema]] (appends also evolve schemas
    * implicitly; this is the declaration-first DDL path). Everything else
    * (renames, type changes) needs field-id tracking this format doesn't
    * carry, and fails loudly.
    */
  override def alterTable(ident: Identifier,
                          changes: org.apache.spark.sql.connector.catalog.TableChange*): Table = {
    import org.apache.spark.sql.connector.catalog.TableChange
    if (ident.namespace.nonEmpty || !isTable(ident.name))
      throw new NoSuchTableException(ident)
    def top(names: Array[String], what: String): String = {
      require(names.length == 1,
        s"$what of nested field ${names.mkString(".")} is not mapped")
      names.head
    }
    val add = Seq.newBuilder[org.apache.spark.sql.types.StructField]
    val drop = Seq.newBuilder[String]
    changes.foreach {
      case a: TableChange.AddColumn =>
        require(a.position() == null,
          "ADD COLUMN ... FIRST/AFTER is not mapped (columns append)")
        add += org.apache.spark.sql.types.StructField(
          top(a.fieldNames(), "ADD COLUMN"), a.dataType(), a.isNullable)
      case d: TableChange.DeleteColumn =>
        drop += top(d.fieldNames(), "DROP COLUMN")
      case other => sys.error(s"ALTER TABLE change $other is not mapped — " +
        "only ADD COLUMNS and DROP COLUMNS commit (renames/type changes " +
        "need field ids this format does not carry)")
    }
    SnapshotTable.alterSchema(spark, dirOf(ident.name),
      add = add.result(), drop = drop.result())
    loadTable(ident)
  }

  override def dropTable(ident: Identifier): Boolean = {
    if (ident.namespace.nonEmpty || !isTable(ident.name)) false
    else {
      val p = new Path(dirOf(ident.name))
      p.getFileSystem(spark.sessionState.newHadoopConf()).delete(p, true)
    }
  }

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit = {
    if (oldIdent.namespace.nonEmpty || !isTable(oldIdent.name))
      throw new NoSuchTableException(oldIdent)
    require(newIdent.namespace.isEmpty, "rename cannot change namespace")
    if (isTable(newIdent.name)) throw new TableAlreadyExistsException(newIdent)
    val fs = new Path(root).getFileSystem(spark.sessionState.newHadoopConf())
    require(fs.rename(new Path(dirOf(oldIdent.name)), new Path(dirOf(newIdent.name))),
      s"rename ${oldIdent.name} -> ${newIdent.name} failed")
  }

  // ---- maintenance procedures: CALL <cat>.system.<proc>(...) — the
  // Iceberg stored-procedure surface over the table-maintenance API.
  // Results come back as LocalScan rows (driver-side metadata; none of
  // these return data-plane rows).

  import org.apache.spark.sql.catalyst.InternalRow
  import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter, UnboundProcedure}
  import org.apache.spark.sql.connector.read.LocalScan
  import org.apache.spark.sql.types.{ArrayType, BooleanType, DataType, IntegerType, LongType, StringType}
  import org.apache.spark.sql.catalyst.util.GenericArrayData
  import org.apache.spark.unsafe.types.UTF8String

  private def p(name: String, dt: DataType) =
    ProcedureParameter.in(name, dt).build()
  private def pDef(name: String, dt: DataType, sql: String) =
    ProcedureParameter.in(name, dt).defaultValue(sql).build()
  private def utf(s: String) = UTF8String.fromString(s)
  private def csvOf(v: UTF8String): Seq[String] =
    Option(v).map(_.toString.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
      .getOrElse(Nil)
  private def commitRow(c: SnapshotTable.Commit): InternalRow =
    InternalRow(c.snapshotId, c.skippedExisting)
  private def dirsRow(ds: Seq[String]): InternalRow =
    InternalRow(new GenericArrayData(ds.map(utf)))

  private class Proc(procName: String, params: Seq[ProcedureParameter],
                     out: StructType, body: InternalRow => InternalRow)
    extends UnboundProcedure with BoundProcedure {
    override def name(): String = procName
    override def description(): String = s"graft snapshot-table $procName"
    override def bind(inputType: StructType): BoundProcedure = this
    override def parameters(): Array[ProcedureParameter] = params.toArray
    override def isDeterministic: Boolean = false
    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val result = Array(body(input))
      java.util.List.of[Scan](new LocalScan {
        override def rows(): Array[InternalRow] = result
        override def readSchema(): StructType = out
      }).iterator()
    }
  }

  private val commitOut = StructType(Seq(
    org.apache.spark.sql.types.StructField("snapshot_id", LongType, nullable = false),
    org.apache.spark.sql.types.StructField("skipped", BooleanType, nullable = false)))
  private val dirsOut = StructType(Seq(
    org.apache.spark.sql.types.StructField("deleted_dirs",
      ArrayType(StringType, containsNull = false), nullable = false)))
  private val okOut = StructType(Seq(
    org.apache.spark.sql.types.StructField("ok", BooleanType, nullable = false)))

  private def tdir(in: InternalRow): String = {
    val t = in.getUTF8String(0).toString
    require(isTable(t), s"catalog '$catalogName' has no table '$t'")
    dirOf(t)
  }

  private lazy val procs: Map[String, UnboundProcedure] = Seq[Proc](
    new Proc("compact",
      Seq(p("table", StringType), pDef("target_files", IntegerType, "1"),
        pDef("sort_by", StringType, "''"), pDef("zorder_by", StringType, "''")),
      commitOut, in => commitRow(SnapshotTable.compact(spark, tdir(in),
        in.getInt(1), csvOf(in.getUTF8String(2)), csvOf(in.getUTF8String(3))))),
    new Proc("compact_small",
      Seq(p("table", StringType), p("max_bytes", LongType),
        pDef("min_input_dirs", IntegerType, "2"),
        pDef("target_files", IntegerType, "1")),
      commitOut, in => commitRow(SnapshotTable.compactSmall(spark, tdir(in),
        in.getLong(1), in.getInt(2), in.getInt(3)))),
    new Proc("expire_snapshots",
      Seq(p("table", StringType), p("keep_last", IntegerType)),
      dirsOut, in => dirsRow(SnapshotTable.expire(spark, tdir(in), in.getInt(1)))),
    new Proc("vacuum", Seq(p("table", StringType)),
      dirsOut, in => dirsRow(SnapshotTable.vacuum(spark, tdir(in)))),
    new Proc("rollback_to_snapshot",
      Seq(p("table", StringType), p("snapshot_id", LongType)),
      commitOut, in => commitRow(SnapshotTable.rollback(spark, tdir(in),
        in.getLong(1)))),
    new Proc("create_tag",
      Seq(p("table", StringType), p("tag", StringType), p("snapshot_id", LongType)),
      okOut, in => { SnapshotTable.tag(spark, tdir(in),
        in.getUTF8String(1).toString, in.getLong(2)); InternalRow(true) }),
    new Proc("drop_ref",
      Seq(p("table", StringType), p("name", StringType)),
      okOut, in => { SnapshotTable.dropRef(spark, tdir(in),
        in.getUTF8String(1).toString); InternalRow(true) }),
    new Proc("create_branch",
      Seq(p("table", StringType), p("branch", StringType), p("from_id", LongType)),
      okOut, in => { SnapshotTable.createBranch(spark, tdir(in),
        in.getUTF8String(1).toString, in.getLong(2)); InternalRow(true) }),
    new Proc("fast_forward",
      Seq(p("table", StringType), p("branch", StringType)),
      commitOut, in => commitRow(SnapshotTable.fastForward(spark, tdir(in),
        in.getUTF8String(1).toString))),
    new Proc("drop_branch",
      Seq(p("table", StringType), p("branch", StringType)),
      okOut, in => { SnapshotTable.dropBranch(spark, tdir(in),
        in.getUTF8String(1).toString); InternalRow(true) })
  ).map(pr => pr.name() -> (pr: UnboundProcedure)).toMap

  override def loadProcedure(ident: Identifier): UnboundProcedure = {
    require(ident.namespace.sameElements(Array("system")),
      s"procedures live under the 'system' namespace: CALL $catalogName.system.<name>(...)")
    procs.getOrElse(ident.name, sys.error(
      s"unknown procedure '${ident.name}' — available: ${procs.keys.toSeq.sorted.mkString(", ")}"))
  }

  override def listProcedures(namespace: Array[String]): Array[Identifier] = {
    if (!namespace.sameElements(Array("system"))) Array.empty
    else procs.keys.toSeq.sorted.map(Identifier.of(Array("system"), _)).toArray
  }
}

/** A snapshot table resolved for ONE query: the manifest is pinned at
  * analysis time (per-query snapshot isolation — the Delta/Iceberg stance),
  * so every read in the query sees one consistent state even while writers
  * commit. Mutations (insert/delete/truncate) always act on the CURRENT
  * chain head, never the pinned manifest.
  */
private[graft] class GraftSqlTable(
    spark: SparkSession,
    private[graft] val dir: String,
    qualifiedName: String,
    /** Pinned manifest (main chain or branch head); None only for a legacy
      * chain read whose manifest carries no stamped schema. */
    private[graft] val manifest: SnapshotTable.Manifest,
    /** Non-latest pins (time travel, branches) reject writes. */
    private[graft] val pinned: Boolean,
    /** Set when this is a branch read — the native-plan recipe differs. */
    private[graft] val branchName: Option[String],
    pinDesc: String)
  extends Table with SupportsRead with SupportsWrite with SupportsDelete {

  override def name(): String =
    if (pinDesc.isEmpty) qualifiedName else s"$qualifiedName ($pinDesc)"

  override lazy val schema: StructType =
    manifest.schema.getOrElse(
      // legacy chain without a stamped schema: footer inference (driver-side
      // metadata read, same as any parquet path resolution)
      SnapshotTable.readSubset(spark, dir, manifest, manifest.live).schema)

  /** The table state as ONE native DataFrame — what [[SnapshotSqlRule]]
    * grafts into the query plan (possibly dir-pruned via [[readSubset]]).
    */
  private[graft] def nativeRead(dirs: Seq[String]): DataFrame =
    SnapshotTable.readSubset(spark, dir, manifest, dirs)

  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE,
      // V1_BATCH_WRITE routes batch inserts through the V1Write fallback
      // below (AppendDataExecV1) — without it Spark's DSv2 strategy calls
      // Write.toBatch, which this table deliberately does not implement
      TableCapability.V1_BATCH_WRITE,
      // OVERWRITE_DYNAMIC lets OverwritePartitionsDynamic pass analysis so
      // the DML rule can lower it (or, without extensions, the builder's
      // overwriteDynamicPartitions() hint can point at them)
      TableCapability.OVERWRITE_DYNAMIC,
      TableCapability.TRUNCATE, TableCapability.MICRO_BATCH_READ,
      TableCapability.STREAMING_WRITE)

  private def withPath(opts: CaseInsensitiveStringMap): CaseInsensitiveStringMap = {
    val merged = new util.HashMap[String, String](opts)
    merged.put("path", dir)
    new CaseInsensitiveStringMap(merged)
  }

  /** Batch SELECTs never reach this scan: [[SnapshotSqlRule]] replaces the
    * relation with the native plan pre-CBO. Streaming reads delegate to
    * [[SnapshotStreamSource]]'s incremental micro-batch machinery.
    */
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    require(!pinned, s"streaming/batch scan of a pinned table ($name) — " +
      "time travel is a batch SELECT concern; drop the VERSION/TIMESTAMP clause")
    new ScanBuilder with Scan {
      override def build(): Scan = this
      override def readSchema(): StructType = schema
      override def toBatch: org.apache.spark.sql.connector.read.Batch =
        sys.error(s"batch read of $qualifiedName needs the substitution rule — " +
          "set spark.sql.extensions=graft.GraftExtensions (the rule grafts the " +
          "native vectorized plan; this DSv2 scan only serves streaming)")
      override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
        new SnapshotStreamScan(SnapshotTable.latestSchema(spark, dir),
          withPath(options)).toMicroBatchStream(checkpointLocation)
    }
  }

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    require(!pinned,
      s"cannot write to a pinned table ($name) — writes go to the chain head")
    val opts = info.options
    val batchId = Option(opts.get("batch_id"))
    def csv(k: String): Seq[String] =
      Option(opts.get(k)).map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
        .getOrElse(Nil)
    new WriteBuilder with SupportsTruncate
        with org.apache.spark.sql.connector.write.SupportsDynamicOverwrite {
      private var replace = false
      override def truncate(): WriteBuilder = { replace = true; this }
      // advertises dynamic-overwrite capability for analysis; the actual
      // lowering happens in SnapshotDmlRule (OverwritePartitionsDynamic →
      // SnapshotTable.overwritePartitions command) because Spark has no V1
      // fallback exec for dynamic overwrite — this builder never sees it
      override def overwriteDynamicPartitions(): WriteBuilder = sys.error(
        s"dynamic overwrite of $qualifiedName needs the substitution rule — " +
          "set spark.sql.extensions=graft.GraftExtensions")
      override def build(): Write = new V1Write {
        // the V1 seam hands the WHOLE frame to the table's own commit
        // protocol — SQL inserts get the exactly-once ledger, manifest
        // stats, blooms, and schema evolution of the API path verbatim
        override def toInsertableRelation =
          new org.apache.spark.sql.sources.InsertableRelation {
            override def insert(data: DataFrame, overwrite: Boolean): Unit = {
              if (replace || overwrite)
                SnapshotTable.overwrite(data.sparkSession, data, dir, batchId,
                  statsBy = csv("stats_by"), bloomBy = csv("bloom_by"))
              else
                SnapshotTable.append(data.sparkSession, data, dir, batchId,
                  statsBy = csv("stats_by"), bloomBy = csv("bloom_by"))
            }
          }
        override def toStreaming: StreamingWrite =
          new SnapshotStreamTable(info.schema, withPath(opts))
            .newWriteBuilder(info).build().toStreaming
      }
    }
  }

  // ---- DELETE FROM: conjunction of comparisons on ONE column -> the
  // copy-on-write range delete (manifest-stats pruned rewrite of only the
  // intersecting dirs; strict bounds stay exact via the sharpened
  // predicate, pruning uses the inclusive hull) ----

  private def atoms(fs: Seq[SFilter]): Option[Seq[SFilter]] = {
    val out = Seq.newBuilder[SFilter]
    def go(f: SFilter): Boolean = f match {
      case SAnd(l, r) => go(l) && go(r)
      case a @ (_: SEqualTo | _: SGreaterThan | _: SGreaterThanOrEqual |
                _: SLessThan | _: SLessThanOrEqual | _: SIsNotNull) =>
        out += a; true
      case _ => false
    }
    if (fs.forall(go)) Some(out.result()) else None
  }

  private def deletePlan(filters: Array[SFilter])
      : Option[(SnapshotTable.KeyRange, SqlColumn)] =
    atoms(filters.toSeq).flatMap { as =>
      if (as.isEmpty)
        Some((SnapshotTable.KeyRange(schema.fields.head.name), lit(true)))
      else {
        val colNames = as.map {
          case SEqualTo(c, _) => c
          case SGreaterThan(c, _) => c
          case SGreaterThanOrEqual(c, _) => c
          case SLessThan(c, _) => c
          case SLessThanOrEqual(c, _) => c
          case SIsNotNull(c) => c
        }.distinct
        if (colNames.length != 1) None
        else {
          val c = colNames.head
          // inclusive hull for dir pruning; the exact predicate keeps
          // strictness (delete() filters with it)
          def tighterLo(a: Option[Any], v: Any) =
            Some(a.filter(x => cmpAny(x, v) >= 0).getOrElse(v))
          def tighterHi(a: Option[Any], v: Any) =
            Some(a.filter(x => cmpAny(x, v) <= 0).getOrElse(v))
          var lo: Option[Any] = None
          var hi: Option[Any] = None
          var exact: SqlColumn = lit(true)
          var ok = true
          as.foreach {
            case SEqualTo(_, v) =>
              lo = tighterLo(lo, v); hi = tighterHi(hi, v)
              exact = exact && (col(c) === lit(v))
            case SGreaterThan(_, v) =>
              lo = tighterLo(lo, v); exact = exact && (col(c) > lit(v))
            case SGreaterThanOrEqual(_, v) =>
              lo = tighterLo(lo, v); exact = exact && (col(c) >= lit(v))
            case SLessThan(_, v) =>
              hi = tighterHi(hi, v); exact = exact && (col(c) < lit(v))
            case SLessThanOrEqual(_, v) =>
              hi = tighterHi(hi, v); exact = exact && (col(c) <= lit(v))
            case SIsNotNull(_) =>
              // rows with a null key never match a comparison (and the CoW
              // delete retains null-keyed rows) — the conjunct is implied
              ()
            case _ => ok = false
          }
          if (ok) Some((SnapshotTable.KeyRange(c, lo, hi), exact)) else None
        }
      }
    }

  private def cmpAny(a: Any, b: Any): Int = (a, b) match {
    case (x: Number, y: Number) =>
      java.lang.Double.compare(x.doubleValue(), y.doubleValue())
    case (x: String, y: String) => x.compareTo(y)
    case _ => 0 // incomparable: keep both bounds (hull only widens — sound)
  }

  override def canDeleteWhere(filters: Array[SFilter]): Boolean =
    !pinned && deletePlan(filters).nonEmpty

  override def deleteWhere(filters: Array[SFilter]): Unit = {
    require(!pinned, s"cannot DELETE from a pinned table ($name)")
    val (range, exact) = deletePlan(filters).getOrElse(
      sys.error(s"DELETE predicate not mapped for $qualifiedName — " +
        "supported: a conjunction of comparisons on one column " +
        "(use SnapshotTable.deleteKeys for keyed merge-on-read deletes)"))
    SnapshotTable.delete(spark, dir, range, Some(exact))
  }

  override def truncateTable(): Boolean = {
    require(!pinned, s"cannot TRUNCATE a pinned table ($name)")
    SnapshotTable.truncate(spark, dir)
    true
  }
}

private[graft] object GraftSqlTable {
  def latest(spark: SparkSession, dir: String, qn: String): GraftSqlTable = {
    val id = SnapshotTable.latestId(spark, dir).getOrElse(
      sys.error(s"$qn has no committed snapshot"))
    new GraftSqlTable(spark, dir, qn, SnapshotTable.manifest(spark, dir, id),
      pinned = false, branchName = None, pinDesc = "")
  }
  def atId(spark: SparkSession, dir: String, qn: String, id: Long,
           desc: String): GraftSqlTable =
    new GraftSqlTable(spark, dir, qn, SnapshotTable.manifest(spark, dir, id),
      pinned = true, branchName = None, pinDesc = desc)
  def branch(spark: SparkSession, dir: String, qn: String, name: String): GraftSqlTable =
    new GraftSqlTable(spark, dir, qn,
      SnapshotTable.branchHeadManifest(spark, dir, name),
      pinned = true, branchName = Some(name), pinDesc = s"branch $name")
}

/** Iceberg-style metadata tables: `catalog.table.history` / `.files` /
  * `.partitions` / `.refs` / `.branches` — driver-side manifest reads
  * surfaced as SQL relations (the substitution rule grafts the DataFrame).
  */
private[graft] class GraftMetaTable(spark: SparkSession, dir: String,
                                    qualifiedName: String, kind: String)
  extends Table with SupportsRead {

  private[graft] def recipe(): DataFrame = kind match {
    case "history" => SnapshotTable.history(spark, dir)
    case "files" => SnapshotTable.files(spark, dir)
    case "partitions" => SnapshotTable.partitions(spark, dir)
    case "refs" =>
      val rows = SnapshotTable.refs(spark, dir).toSeq.sortBy(_._1)
        .map { case (n, id) => Row(n, id) }
      spark.createDataFrame(rows.asJava, StructType(
        Seq(org.apache.spark.sql.types.StructField("name",
            org.apache.spark.sql.types.StringType, nullable = false),
          org.apache.spark.sql.types.StructField("snapshot_id",
            org.apache.spark.sql.types.LongType, nullable = false))))
    case "branches" =>
      val rows = SnapshotTable.branches(spark, dir).toSeq.sortBy(_._1)
        .map { case (n, (fork, head)) => Row(n, fork, head) }
      spark.createDataFrame(rows.asJava, StructType(
        Seq(org.apache.spark.sql.types.StructField("name",
            org.apache.spark.sql.types.StringType, nullable = false),
          org.apache.spark.sql.types.StructField("fork_id",
            org.apache.spark.sql.types.LongType, nullable = false),
          org.apache.spark.sql.types.StructField("head_id",
            org.apache.spark.sql.types.LongType, nullable = false))))
  }

  override def name(): String = qualifiedName
  override lazy val schema: StructType = recipe().schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    sys.error(s"metadata table $qualifiedName needs the substitution rule — " +
      "set spark.sql.extensions=graft.GraftExtensions")
}
