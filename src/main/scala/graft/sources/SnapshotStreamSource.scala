package graft.sources

import java.util
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.connector.write.LogicalWriteInfo
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.operators.SnapshotTable

/** Structured Streaming read over a [[graft.operators.SnapshotTable]] chain —
  * the Iceberg streaming-read analogue (`spark.readStream.format(...)` on a
  * table path): each micro-batch is the rows APPENDED by the snapshots in
  * `(start, end]`, planned from manifests alone, so a batch costs the delta
  * and the OFFSET IS THE SNAPSHOT ID. Spark's checkpoint holds that offset;
  * a restarted query resumes from the committed snapshot exactly — no second
  * ledger, and since appends are immutable the replayed range is
  * deterministic while its manifests are retained (keep expiry behind the
  * checkpoint lag, same contract as Iceberg's stream-from-snapshot).
  *
  *   spark.readStream.format("graft.sources.SnapshotStreamSource")
  *     .option("path", table).load()
  *
  * Options: `starting` = `earliest` (default — begin at the contiguous
  * retained horizon, so the whole retained chain drains as the first
  * batches) or `latest` (only commits after stream start);
  * `start_snapshot_id` = explicit EXCLUSIVE lower bound;
  * `max_snapshots_per_trigger` = admission control on COMMIT granularity (a
  * backlog of many snapshots drains in bounded batches; one snapshot always
  * admits whole — the progress guarantee). Trigger.AvailableNow pins the
  * head once and drains to it in capped batches.
  *
  * Insert-only contract, enforced: a range crossing a row-removing snapshot
  * (delete / mor-delete / mor-upsert / rollback) fails loudly — stream
  * row-level changes with [[graft.operators.SnapshotPipe.runCdc]] instead.
  * Compaction (`replace`) commits pass through silently: same rows, new
  * files, nothing re-emitted.
  *
  * Readers decode parquet row-by-row on the executor (parquet-hadoop's
  * column-assembled record API — one partition per appended FILE, so a big
  * commit fans out). That trades the vectorized reader's raw scan rate for
  * zero coupling to Spark internals; streaming deltas are commit-sized, and
  * the batch path ([[SnapshotTable.read]]) keeps the vectorized scan.
  * Supported column types: boolean/int/long/float/double/string/binary/
  * date/timestamp + one-level arrays of primitives (the token-sequence
  * shape); anything else fails loudly at plan time.
  */
class SnapshotStreamSource extends TableProvider {
  // a VIRGIN table (no committed snapshot yet) infers empty: the streaming
  // WRITE path needs no table schema (the first epoch stamps the query's),
  // while the read path fails loudly at scan creation
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    if (SnapshotTable.latestId(SparkSession.active,
        SnapshotStreamSource.pathOf(options)).isEmpty) new StructType()
    else SnapshotTable.latestSchema(SparkSession.active,
      SnapshotStreamSource.pathOf(options))

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new SnapshotStreamTable(schema, new CaseInsensitiveStringMap(properties))
}

object SnapshotStreamSource {
  private[sources] def pathOf(options: CaseInsensitiveStringMap): String =
    Option(options.get("path")).getOrElse(
      throw new IllegalArgumentException("SnapshotStreamSource: path option required"))

  /** Fail at PLAN time on any column the executor-side decoder cannot
    * produce — a reader-side error would surface mid-batch instead.
    */
  private[sources] def validate(schema: StructType): Unit = {
    def primitive(dt: DataType): Boolean = dt match {
      case BooleanType | IntegerType | LongType | FloatType | DoubleType |
           StringType | BinaryType | DateType | TimestampType | TimestampNTZType => true
      case _ => false
    }
    schema.fields.foreach { f =>
      val ok = primitive(f.dataType) || (f.dataType match {
        case ArrayType(et, _) => primitive(et)
        case _ => false
      })
      require(ok, s"SnapshotStreamSource cannot decode column '${f.name}' of type " +
        s"${f.dataType.catalogString} — supported: primitive types and arrays of them")
    }
  }
}

private class SnapshotStreamTable(tschema: StructType, options: CaseInsensitiveStringMap)
  extends Table with SupportsRead
  with org.apache.spark.sql.connector.catalog.SupportsWrite {

  override def name(): String = s"graft_snapshot_stream(${options.get("path")})"
  override def schema(): StructType = tschema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.MICRO_BATCH_READ, TableCapability.STREAMING_WRITE)

  override def newScanBuilder(opts: CaseInsensitiveStringMap): ScanBuilder = {
    val merged = new util.HashMap[String, String](options)
    merged.putAll(opts)
    new SnapshotStreamScan(tschema, new CaseInsensitiveStringMap(merged))
  }

  override def newWriteBuilder(info: org.apache.spark.sql.connector.write.LogicalWriteInfo)
      : org.apache.spark.sql.connector.write.WriteBuilder = {
    // writeStream options arrive on the LogicalWriteInfo; table-level ones
    // (the getTable properties) fill any gaps — path usually rides on both
    val merged = new util.HashMap[String, String](options)
    merged.putAll(info.options())
    new SnapshotStreamWriteBuilder(new LogicalWriteInfo {
      override def options() = new CaseInsensitiveStringMap(merged)
      override def queryId(): String = info.queryId()
      override def schema(): StructType = info.schema()
    })
  }
}

private class SnapshotStreamScan(tschema: StructType, options: CaseInsensitiveStringMap)
  extends ScanBuilder with Scan {

  override def build(): Scan = this
  override def readSchema(): StructType = tschema

  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream = {
    require(tschema.fields.nonEmpty,
      "streaming read of a table with no committed snapshot — append once " +
        "first (a virgin table has no schema to plan with)")
    SnapshotStreamSource.validate(tschema)
    new SnapshotMicroBatch(SnapshotStreamSource.pathOf(options), tschema,
      Option(options.get("starting")).getOrElse("earliest"),
      Option(options.get("start_snapshot_id")).map(_.toLong),
      options.getLong("max_snapshots_per_trigger", 0L))
  }
}

/** Offset = highest CONSUMED snapshot id (−1 = nothing yet). */
private case class SnapId(id: Long) extends Offset {
  override def json(): String = id.toString
}

private class SnapshotMicroBatch(dir: String, schema: StructType, starting: String,
                                 startId: Option[Long], maxSnapshotsPerTrigger: Long)
  extends MicroBatchStream
  with org.apache.spark.sql.connector.read.streaming.SupportsTriggerAvailableNow {

  // planning happens on the driver, where the session that started the
  // query is active — manifests are driver-side metadata, like every other
  // SnapshotTable planner
  private def spark = SparkSession.active

  override def initialOffset(): Offset = SnapId(startId.getOrElse(starting match {
    case "latest" => SnapshotTable.latestId(spark, dir).getOrElse(-1L)
    case "earliest" =>
      // the CONTIGUOUS retained horizon, never a ref-pinned island beyond
      // an expired gap (same bootstrap rule as SnapshotPipe)
      SnapshotTable.earliestContiguousId(spark, dir).map(_ - 1).getOrElse(-1L)
    case other => sys.error(s"bad starting option '$other' (earliest|latest)")
  }))

  private def head(): Long = SnapshotTable.latestId(spark, dir).getOrElse(-1L)

  @volatile private var availableNowEnd: Option[Long] = None
  override def prepareForTriggerAvailableNow(): Unit =
    availableNowEnd = Some(head())

  override def latestOffset(): Offset = SnapId(head())

  override def getDefaultReadLimit
      : org.apache.spark.sql.connector.read.streaming.ReadLimit =
    org.apache.spark.sql.connector.read.streaming.ReadLimit.allAvailable()

  override def latestOffset(start: Offset,
      limit: org.apache.spark.sql.connector.read.streaming.ReadLimit): Offset = {
    val end = availableNowEnd.getOrElse(head())
    val s = start.asInstanceOf[SnapId].id
    if (maxSnapshotsPerTrigger <= 0 || end <= s) SnapId(end)
    else SnapId(math.min(end, s + maxSnapshotsPerTrigger))
  }

  override def deserializeOffset(json: String): Offset = SnapId(json.toLong)

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[SnapId].id
    val e = end.asInstanceOf[SnapId].id
    if (e <= s) return Array.empty
    // one partition per appended file: a large commit fans out across the
    // cluster; the insert-only guard (appendedIn) fails loudly here when
    // the range crosses a row-removing snapshot
    SnapshotTable.incrementalFiles(spark, dir, s, e)
      .flatMap(_._2)
      .map(f => SnapshotFilePartition(f): InputPartition)
      .toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new SnapshotFileReaderFactory(schema)

  override def commit(end: Offset): Unit = () // the table's manifests are the retention
  override def stop(): Unit = ()
}

private case class SnapshotFilePartition(file: String) extends InputPartition

private class SnapshotFileReaderFactory(schema: StructType)
  extends PartitionReaderFactory {

  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val file = partition.asInstanceOf[SnapshotFilePartition].file
    new PartitionReader[InternalRow] {
      private val reader = org.apache.parquet.hadoop.ParquetReader
        .builder(new org.apache.parquet.hadoop.example.GroupReadSupport(),
          new org.apache.hadoop.fs.Path(file))
        .withConf(new org.apache.hadoop.conf.Configuration())
        .build()
      private var current: org.apache.parquet.example.data.Group = _

      override def next(): Boolean = {
        current = reader.read()
        current != null
      }

      override def get(): InternalRow =
        InternalRow.fromSeq(schema.fields.map(f =>
          SnapshotParquetDecode.field(current, f)).toIndexedSeq)

      override def close(): Unit = reader.close()
    }
  }
}

/** Group-record → Catalyst value decode for the supported type matrix.
  * Column resolution is BY NAME against the file's own schema (schema
  * evolution: files written before an ADD COLUMN read it as null, extra
  * file columns are ignored — the same rule as the manifest-schema batch
  * read). Timestamps decode from INT64 MILLIS/MICROS/NANOS annotations and
  * from legacy INT96; arrays from both the standard 3-level and legacy
  * 2-level parquet list shapes.
  */
private object SnapshotParquetDecode {
  import org.apache.parquet.example.data.Group
  import org.apache.parquet.schema.{GroupType, LogicalTypeAnnotation, Type => PType}

  def field(g: Group, f: StructField): Any = {
    val gt = g.getType
    if (!gt.containsField(f.name)) return null
    val idx = gt.getFieldIndex(f.name)
    if (g.getFieldRepetitionCount(idx) == 0) return null
    f.dataType match {
      case ArrayType(et, _) => array(g.getGroup(idx, 0), et, f.name)
      case dt => primitive(g, gt.getType(idx), idx, 0, dt, f.name)
    }
  }

  private def primitive(g: Group, pt: PType, idx: Int, rep: Int,
                        dt: DataType, name: String): Any = dt match {
    case BooleanType => g.getBoolean(idx, rep)
    case IntegerType => g.getInteger(idx, rep)
    case LongType => g.getLong(idx, rep)
    case FloatType => g.getFloat(idx, rep)
    case DoubleType => g.getDouble(idx, rep)
    case DateType => g.getInteger(idx, rep)
    case StringType => UTF8String.fromBytes(g.getBinary(idx, rep).getBytes)
    case BinaryType => g.getBinary(idx, rep).getBytes
    case TimestampType | TimestampNTZType => timestampMicros(g, pt, idx, rep, name)
    case other => sys.error(s"unsupported decode type ${other.catalogString} for '$name'")
  }

  private def timestampMicros(g: Group, pt: PType, idx: Int, rep: Int,
                              name: String): Long = {
    val prim = pt.asPrimitiveType().getPrimitiveTypeName
    prim match {
      case org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName.INT96 =>
        // legacy INT96: 8 bytes little-endian nanos-of-day + 4 bytes
        // little-endian julian day
        val b = g.getInt96(idx, rep).getBytes
        val bb = java.nio.ByteBuffer.wrap(b).order(java.nio.ByteOrder.LITTLE_ENDIAN)
        val nanos = bb.getLong
        val julian = bb.getInt
        (julian - 2440588L) * 86400L * 1000000L + nanos / 1000L
      case org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName.INT64 =>
        val raw = g.getLong(idx, rep)
        pt.getLogicalTypeAnnotation match {
          case ts: LogicalTypeAnnotation.TimestampLogicalTypeAnnotation =>
            ts.getUnit match {
              case LogicalTypeAnnotation.TimeUnit.MILLIS => raw * 1000L
              case LogicalTypeAnnotation.TimeUnit.MICROS => raw
              case LogicalTypeAnnotation.TimeUnit.NANOS => raw / 1000L
            }
          case _ => raw // unannotated int64: assume micros (Spark's own default)
        }
      case other => sys.error(s"cannot decode timestamp '$name' from parquet $other")
    }
  }

  private def array(listGroup: Group, et: DataType, name: String): GenericArrayData = {
    val lt = listGroup.getType.asInstanceOf[GroupType]
    require(lt.getFieldCount == 1,
      s"unexpected parquet list shape for '$name' (${lt.getFieldCount} fields)")
    val repType = lt.getType(0)
    val n = listGroup.getFieldRepetitionCount(0)
    val out = new Array[Any](n)
    if (repType.isPrimitive) {
      // legacy 2-level list: elements repeat directly
      var i = 0
      while (i < n) {
        out(i) = primitive(listGroup, repType, 0, i, et, name)
        i += 1
      }
    } else {
      // standard 3-level list: repeated group wrapping one element field
      var i = 0
      while (i < n) {
        val eg = listGroup.getGroup(0, i)
        val egt = eg.getType
        require(egt.getFieldCount == 1,
          s"unexpected parquet list element shape for '$name'")
        out(i) =
          if (eg.getFieldRepetitionCount(0) == 0) null
          else primitive(eg, egt.getType(0), 0, 0, et, name)
        i += 1
      }
    }
    new GenericArrayData(out)
  }
}
