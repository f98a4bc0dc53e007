package graft.sources

import java.util.UUID

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.example.data.simple.SimpleGroup
import org.apache.parquet.hadoop.example.ExampleParquetWriter
import org.apache.parquet.hadoop.metadata.CompressionCodecName
import org.apache.parquet.io.api.Binary
import org.apache.parquet.schema.{LogicalTypeAnnotation, MessageType, Type => PType, Types}
import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName._
import org.apache.parquet.schema.Type.Repetition
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.connector.write.streaming.{StreamingDataWriterFactory, StreamingWrite}
import org.apache.spark.sql.types._

import graft.operators.SnapshotTable

/** Structured Streaming WRITE into a [[graft.operators.SnapshotTable]] chain —
  * the sink half of [[SnapshotStreamSource]] (`df.writeStream.format(...)
  * .option("path", table)`), exactly-once WITHOUT a second ledger: executors
  * write each micro-batch's rows as parquet files into a staging area under
  * the table, and the driver-side epoch commit renames exactly the committed
  * tasks' files into one `snap-NNNNNN` dir and commits one manifest whose
  * batch id is `stream:<queryId>:<epochId>`. A replayed epoch (restart after
  * a crash between the table commit and Spark's own commit log) hits the
  * table's batch ledger and SKIPS — the table is the source of truth, the
  * same stance as [[graft.operators.SnapshotPipe]]. Speculative or aborted
  * task files never appear in the commit messages, so they never enter the
  * table (epoch-dir cleanup reaps them).
  *
  * Options: `path` (the table), `sink_id` (overrides the query id in the
  * batch token — set it when one logical sink is fed by differently-
  * checkpointed queries over time). Append output mode only — a snapshot
  * table is an append+retract log, Complete-mode truncation is not a thing
  * it does.
  *
  * Supported column types: the same matrix as the read side
  * ([[SnapshotStreamSource.validate]]); the first epoch of a virgin table
  * stamps the write schema, later epochs evolve it like [[SnapshotTable.append]].
  */
private[sources] class SnapshotStreamWriteBuilder(info: LogicalWriteInfo)
  extends WriteBuilder {

  override def build(): Write = new Write {
    override def toStreaming: StreamingWrite = {
      SnapshotStreamSource.validate(info.schema())
      val dir = SnapshotStreamSource.pathOf(info.options())
      val sinkId = Option(info.options().get("sink_id")).getOrElse(info.queryId())
      require(sinkId.matches("[A-Za-z0-9._-]+"),
        s"sink_id '$sinkId' must match [A-Za-z0-9._-]+")
      new SnapshotStreamingWrite(dir, sinkId, info.schema())
    }
  }
}

private final case class SnapshotFileCommit(file: String, rows: Long)
  extends WriterCommitMessage

private class SnapshotStreamingWrite(dir: String, sinkId: String, schema: StructType)
  extends StreamingWrite {

  private def stagingRoot = s"$dir/_streaming/$sinkId"

  override def createStreamingWriterFactory(info: PhysicalWriteInfo): StreamingDataWriterFactory =
    new SnapshotStreamWriterFactory(stagingRoot, schema)

  override def commit(epochId: Long, messages: Array[WriterCommitMessage]): Unit = {
    val spark = SparkSession.active
    val files = messages.collect { case m: SnapshotFileCommit => m }.toIndexedSeq
    if (files.nonEmpty) {
      SnapshotTable.adoptFiles(spark, dir, files.map(_.file), files.map(_.rows).sum,
        Some(s"stream:$sinkId:$epochId"), schema)
    }
    // reap this epoch's staging dir (aborted-task orphans) and any stale
    // older ones a crashed run left behind — epochs serialize, so nothing
    // at id <= epochId is still being written
    val fs = new Path(dir).getFileSystem(spark.sessionState.newHadoopConf())
    val sr = new Path(stagingRoot)
    if (fs.exists(sr)) {
      val Epoch = "epoch-(\\d+)".r
      fs.listStatus(sr).map(_.getPath).foreach(p => p.getName match {
        case Epoch(e) if e.toLong <= epochId => fs.delete(p, true)
        case _ =>
      })
    }
  }

  override def abort(epochId: Long, messages: Array[WriterCommitMessage]): Unit = {
    val spark = SparkSession.active
    val fs = new Path(dir).getFileSystem(spark.sessionState.newHadoopConf())
    fs.delete(new Path(s"$stagingRoot/epoch-$epochId"), true)
  }
}

private class SnapshotStreamWriterFactory(stagingRoot: String, schema: StructType)
  extends StreamingDataWriterFactory {

  override def createWriter(partitionId: Int, taskId: Long, epochId: Long)
      : DataWriter[InternalRow] = {
    // uuid-unique name: retried/speculative attempts of the same partition
    // never collide, and only the committed attempt's name reaches the driver
    val file = f"$stagingRoot/epoch-$epochId/part-$partitionId%05d-$taskId-${UUID.randomUUID()}.parquet"
    new SnapshotFileDataWriter(file, schema)
  }
}

private class SnapshotFileDataWriter(file: String, schema: StructType)
  extends DataWriter[InternalRow] {

  private val mt = SnapshotParquetEncode.messageType(schema)
  private val conf = new Configuration()
  private val writer = {
    org.apache.parquet.hadoop.example.GroupWriteSupport.setSchema(mt, conf)
    ExampleParquetWriter.builder(new Path(file))
      .withConf(conf)
      .withType(mt)
      .withCompressionCodec(CompressionCodecName.SNAPPY)
      .build()
  }
  private var rows = 0L
  private var closed = false

  override def write(row: InternalRow): Unit = {
    writer.write(SnapshotParquetEncode.toGroup(mt, schema, row))
    rows += 1L
  }

  override def commit(): WriterCommitMessage = {
    close()
    SnapshotFileCommit(file, rows)
  }

  override def abort(): Unit = {
    close()
    val p = new Path(file)
    p.getFileSystem(conf).delete(p, false)
  }

  override def close(): Unit = if (!closed) { closed = true; writer.close() }
}

/** StructType → parquet MessageType and InternalRow → Group record encode —
  * the exact mirror of [[SnapshotParquetDecode]]'s type matrix (primitives +
  * one-level arrays of primitives). Timestamps write as INT64
  * TIMESTAMP(MICROS) (adjusted-to-UTC for TimestampType, not for NTZ),
  * dates as INT32 DATE, strings as UTF8 BINARY, arrays in the standard
  * 3-level LIST shape — all of which Spark's vectorized batch reader (the
  * [[SnapshotTable.read]] path) reads natively.
  */
private[sources] object SnapshotParquetEncode {

  def messageType(schema: StructType): MessageType = {
    val b = Types.buildMessage()
    schema.fields.foreach(f => b.addField(fieldType(f)))
    b.named("spark_schema")
  }

  private def fieldType(f: StructField): PType = f.dataType match {
    case ArrayType(et, _) =>
      Types.optionalList()
        .setElementType(primType(et, "element", Repetition.OPTIONAL))
        .named(f.name)
    case dt => primType(dt, f.name, Repetition.OPTIONAL)
  }

  private def primType(dt: DataType, name: String, rep: Repetition): PType = dt match {
    case BooleanType => Types.primitive(BOOLEAN, rep).named(name)
    case IntegerType => Types.primitive(INT32, rep).named(name)
    case LongType    => Types.primitive(INT64, rep).named(name)
    case FloatType   => Types.primitive(FLOAT, rep).named(name)
    case DoubleType  => Types.primitive(DOUBLE, rep).named(name)
    case StringType  => Types.primitive(BINARY, rep)
      .as(LogicalTypeAnnotation.stringType()).named(name)
    case BinaryType  => Types.primitive(BINARY, rep).named(name)
    case DateType    => Types.primitive(INT32, rep)
      .as(LogicalTypeAnnotation.dateType()).named(name)
    case TimestampType => Types.primitive(INT64, rep)
      .as(LogicalTypeAnnotation.timestampType(true, LogicalTypeAnnotation.TimeUnit.MICROS))
      .named(name)
    case TimestampNTZType => Types.primitive(INT64, rep)
      .as(LogicalTypeAnnotation.timestampType(false, LogicalTypeAnnotation.TimeUnit.MICROS))
      .named(name)
    case other => sys.error(s"unsupported encode type ${other.catalogString} for '$name'")
  }

  def toGroup(mt: MessageType, schema: StructType, row: InternalRow): SimpleGroup = {
    val g = new SimpleGroup(mt)
    var i = 0
    while (i < schema.fields.length) {
      if (!row.isNullAt(i)) {
        schema.fields(i).dataType match {
          case ArrayType(et, _) =>
            val listG = g.addGroup(i)
            val arr = row.getArray(i)
            var j = 0
            while (j < arr.numElements()) {
              val el = listG.addGroup(0)
              if (!arr.isNullAt(j)) addPrim(el, 0, et, arr, j)
              j += 1
            }
          case dt => addTop(g, i, dt, row)
        }
      }
      i += 1
    }
    g
  }

  private def addTop(g: SimpleGroup, i: Int, dt: DataType, row: InternalRow): Unit =
    dt match {
      case BooleanType => g.add(i, row.getBoolean(i))
      case IntegerType | DateType => g.add(i, row.getInt(i))
      case LongType | TimestampType | TimestampNTZType => g.add(i, row.getLong(i))
      case FloatType => g.add(i, row.getFloat(i))
      case DoubleType => g.add(i, row.getDouble(i))
      case StringType => g.add(i, Binary.fromString(row.getUTF8String(i).toString))
      case BinaryType => g.add(i, Binary.fromConstantByteArray(row.getBinary(i)))
      case other => sys.error(s"unsupported encode type ${other.catalogString}")
    }

  private def addPrim(g: org.apache.parquet.example.data.Group, idx: Int,
                      dt: DataType,
                      arr: org.apache.spark.sql.catalyst.util.ArrayData,
                      j: Int): Unit = dt match {
    case BooleanType => g.add(idx, arr.getBoolean(j))
    case IntegerType | DateType => g.add(idx, arr.getInt(j))
    case LongType | TimestampType | TimestampNTZType => g.add(idx, arr.getLong(j))
    case FloatType => g.add(idx, arr.getFloat(j))
    case DoubleType => g.add(idx, arr.getDouble(j))
    case StringType => g.add(idx, Binary.fromString(arr.getUTF8String(j).toString))
    case BinaryType => g.add(idx, Binary.fromConstantByteArray(arr.getBinary(j)))
    case other => sys.error(s"unsupported encode element type ${other.catalogString}")
  }
}
