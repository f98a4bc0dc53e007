package graft.sources

import java.util
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Logstash `generator` input as a native DataSourceV2 batch source
  * (reference: logstash-plugins generator input — emits `count` events whose
  * `message` cycles through `lines`, with a per-event `sequence` number).
  *
  *   spark.read.format("graft.sources.GeneratorSource")
  *     .option("count", 100000)      // total rows
  *     .option("partitions", 32)     // parallel splits
  *     .option("lines", "a|b|c")     // '|'-separated message templates
  *     .load()                       // -> (seq BIGINT, message STRING)
  *
  * Scale shape: rows are generated IN the executors (each partition emits
  * its contiguous [start, end) range) — no driver materialization, no
  * shuffle; the moral twin of `spark.range` with the generator's message
  * semantics. This is also the §2.8 "input plugin Java API" row: a full
  * TableProvider/ScanBuilder/PartitionReader implementation.
  */
class GeneratorSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    GeneratorSource.Schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new GeneratorTable(new CaseInsensitiveStringMap(properties))
}

object GeneratorSource {
  val Schema: StructType = StructType(Seq(
    StructField("seq", LongType, nullable = false),
    StructField("message", StringType, nullable = false)))
}

private class GeneratorTable(options: CaseInsensitiveStringMap)
  extends Table with SupportsRead {

  override def name(): String = "graft_generator"
  override def schema(): StructType = GeneratorSource.Schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ)

  override def newScanBuilder(opts: CaseInsensitiveStringMap): ScanBuilder = {
    val merged = new util.HashMap[String, String](options)
    merged.putAll(opts)
    new GeneratorScan(new CaseInsensitiveStringMap(merged))
  }
}

private class GeneratorScan(options: CaseInsensitiveStringMap)
  extends ScanBuilder with Scan with Batch {

  private val count = options.getLong("count", 1000L)
  private val partitions = options.getInt("partitions", 8)
  private val lines: Array[String] =
    Option(options.get("lines")).map(_.split("\\|", -1)).getOrElse(Array("Hello world!"))

  override def build(): Scan = this
  override def readSchema(): StructType = GeneratorSource.Schema
  override def toBatch: Batch = this

  /** Streaming form: the generator as a bounded MicroBatchStream — the
    * whole `count` range is available immediately (the reference generator
    * input pushes its events and finishes), so an AvailableNow/Once stream
    * emits everything exactly once and checkpoint offsets are plain row
    * sequence numbers.
    */
  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new GeneratorMicroBatch(count, partitions, lines)

  override def planInputPartitions(): Array[InputPartition] = {
    val per = math.max(1L, (count + partitions - 1) / partitions)
    (0L until count by per)
      .map(start => GeneratorPartition(start, math.min(start + per, count)): InputPartition)
      .toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new GeneratorReaderFactory(lines) // serialize the array, not the scan
}

private class GeneratorReaderFactory(lines: Array[String])
  extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[GeneratorPartition]
    new PartitionReader[InternalRow] {
      private var i = p.start - 1
      override def next(): Boolean = { i += 1; i < p.end }
      override def get(): InternalRow =
        InternalRow(i, UTF8String.fromString(lines((i % lines.length).toInt)))
      override def close(): Unit = ()
    }
  }
}

private case class GeneratorPartition(start: Long, end: Long) extends InputPartition

private case class SeqOffset(seq: Long) extends Offset {
  override def json(): String = seq.toString
}

private class GeneratorMicroBatch(count: Long, partitions: Int, lines: Array[String])
  extends MicroBatchStream {

  override def initialOffset(): Offset = SeqOffset(0L)
  override def latestOffset(): Offset = SeqOffset(count)
  override def deserializeOffset(json: String): Offset = SeqOffset(json.toLong)

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[SeqOffset].seq
    val e = end.asInstanceOf[SeqOffset].seq
    val n = e - s
    if (n <= 0) Array.empty
    else {
      val per = math.max(1L, (n + partitions - 1) / partitions)
      (s until e by per)
        .map(a => GeneratorPartition(a, math.min(a + per, e)): InputPartition)
        .toArray
    }
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new GeneratorReaderFactory(lines)

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}
