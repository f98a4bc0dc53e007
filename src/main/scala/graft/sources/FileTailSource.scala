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

/** Logstash `file` input in TAIL mode as a native DataSourceV2 source — the
  * real streaming front door the generator only gestures at (reference
  * contract: `lib/logstash/inputs/base.rb` + the file input's tail mode with
  * sincedb offset tracking; implementation is original, no filewatch code).
  *
  *   spark.readStream.format("graft.sources.FileTailSource")
  *     .option("path", "/var/log/app.log").load()
  *     // -> (offset BIGINT, message STRING)
  *
  * Offsets are BYTE positions in the file — exactly the reference's sincedb
  * contract — checkpointed by Structured Streaming, so a restarted query
  * resumes from the committed byte offset and each appended line is emitted
  * exactly once. `latestOffset` truncates to the last complete line (bytes
  * after the final newline stay pending until the writer finishes the line,
  * like filewatch's delimiter handling).
  *
  * Scale shape: micro-batches read only the [start, end) DELTA. The batch
  * read splits the whole file into `partitions` newline-aligned ranges with
  * the standard skip-partial-first-line / read-through-last-line technique —
  * the same splitting contract as Hadoop text splits, so a large file scans
  * in parallel. The path must be visible to executors (shared storage on a
  * real cluster).
  */
class FileTailSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    FileTailSource.Schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new FileTailTable(new CaseInsensitiveStringMap(properties))
}

object FileTailSource {
  val Schema: StructType = StructType(Seq(
    StructField("offset", LongType, nullable = false),
    StructField("message", StringType, nullable = false)))

  /** Byte position just after the LAST newline at or before `len` (0 when
    * the file has no complete line yet). Reads backwards in 64 KiB chunks —
    * only the unfinished tail is ever scanned, not the file.
    */
  def lastLineEnd(path: String, len: Long): Long = {
    // a listener that has received nothing yet has no journal file — that
    // reads as empty, not as an error (scans can precede the first append)
    if (!new java.io.File(path).exists()) return 0L
    val raf = new java.io.RandomAccessFile(path, "r")
    try {
      val buf = new Array[Byte](64 * 1024)
      var end = len
      while (end > 0) {
        val start = math.max(0L, end - buf.length)
        val n = (end - start).toInt
        raf.seek(start)
        raf.readFully(buf, 0, n)
        var i = n - 1
        while (i >= 0) {
          if (buf(i) == '\n') return start + i + 1
          i -= 1
        }
        end = start
      }
      0L
    } finally raf.close()
  }
}

private class FileTailTable(options: CaseInsensitiveStringMap)
  extends Table with SupportsRead {

  override def name(): String = s"graft_file_tail(${options.get("path")})"
  override def schema(): StructType = FileTailSource.Schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ)

  override def newScanBuilder(opts: CaseInsensitiveStringMap): ScanBuilder = {
    val merged = new util.HashMap[String, String](options)
    merged.putAll(opts)
    new FileTailScan(new CaseInsensitiveStringMap(merged))
  }
}

private class FileTailScan(options: CaseInsensitiveStringMap)
  extends ScanBuilder with Scan with Batch {

  private val path = Option(options.get("path")).getOrElse(
    throw new IllegalArgumentException("FileTailSource: path option required"))
  private val partitions = options.getInt("partitions", 8)

  override def build(): Scan = this
  override def readSchema(): StructType = FileTailSource.Schema
  override def toBatch: Batch = this

  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new FileTailMicroBatch(path, options.getLong("max_bytes_per_trigger", 0L))

  /** Batch: split [0, lastLineEnd) into newline-aligned ranges. A range with
    * start > 0 skips up to its first newline (that partial line belongs to
    * the previous range) and every range reads through the end of the line
    * that STARTS before its end bound.
    */
  override def planInputPartitions(): Array[InputPartition] = {
    val len = FileTailSource.lastLineEnd(path, new java.io.File(path).length())
    if (len == 0) return Array.empty
    val per = math.max(1L, (len + partitions - 1) / partitions)
    (0L until len by per)
      .map(s => FileTailPartition(path, s, math.min(s + per, len),
        exact = false): InputPartition)
      .toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = new FileTailReaderFactory
}

/** `exact = true` (streaming delta): both bounds are newline-aligned — no
  * first-line skip, read lines starting in [start, end).
  * `exact = false` (batch split): Hadoop text-split convention — a split
  * with start > 0 skips through its first newline, and every split also
  * reads the line that starts exactly AT its end bound (the next split
  * skips it), so arbitrary byte boundaries never lose or duplicate a line.
  */
private case class FileTailPartition(path: String, start: Long, end: Long,
                                     exact: Boolean) extends InputPartition

private class FileTailReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[FileTailPartition]
    new PartitionReader[InternalRow] {
      private val in = new java.io.DataInputStream(new java.io.BufferedInputStream({
        val fis = new java.io.FileInputStream(p.path)
        fis.getChannel.position(p.start)
        fis
      }, 256 * 1024))
      private var pos = p.start
      private var lineStart = 0L
      private var line: Array[Byte] = _
      private val buf = new java.io.ByteArrayOutputStream(4096)

      // batch split with start > 0: the partial first line belongs to the
      // previous split (Hadoop text-split convention)
      if (!p.exact && p.start > 0) {
        var b = in.read()
        pos += (if (b >= 0) 1 else 0)
        while (b >= 0 && b != '\n') { b = in.read(); if (b >= 0) pos += 1 }
      }

      override def next(): Boolean = {
        // exact (streaming): lines starting before end; batch: ALSO the line
        // starting exactly at end (its split-convention owner is this split)
        if (if (p.exact) pos >= p.end else pos > p.end) return false
        lineStart = pos
        buf.reset()
        var b = in.read()
        if (b < 0) return false // no complete line (streaming end is aligned)
        while (b >= 0 && b != '\n') { buf.write(b); pos += 1; b = in.read() }
        if (b < 0) return false // trailing bytes without newline stay pending
        pos += 1 // the newline
        line = buf.toByteArray
        true
      }

      override def get(): InternalRow =
        InternalRow(lineStart, UTF8String.fromBytes(line))
      override def close(): Unit = in.close()
    }
  }
}

private case class BytePos(pos: Long) extends Offset {
  override def json(): String = pos.toString
}

/** `maxBytesPerTrigger > 0` = ADMISSION CONTROL (the backpressure analogue
  * of the reference's bounded in-flight queue): each micro-batch admits at
  * most that many newline-aligned bytes, so a huge backlog drains in
  * bounded batches instead of one giant one. A single line longer than the
  * cap still admits whole (progress guarantee — same rule as Spark's own
  * maxOffsetsPerTrigger admitting at least one record).
  */
private class FileTailMicroBatch(path: String, maxBytesPerTrigger: Long = 0L)
  extends MicroBatchStream
  with org.apache.spark.sql.connector.read.streaming.SupportsTriggerAvailableNow {

  override def initialOffset(): Offset = BytePos(0L)

  private def fileEnd(): Long = {
    val f = new java.io.File(path)
    if (!f.exists()) 0L else FileTailSource.lastLineEnd(path, f.length())
  }

  // Trigger.AvailableNow contract: pin the target end ONCE; the engine then
  // loops micro-batches (each admitted by latestOffset(start, limit)) until
  // the pinned end is reached — bounded batches over the whole backlog.
  @volatile private var availableNowEnd: Option[Long] = None
  override def prepareForTriggerAvailableNow(): Unit =
    availableNowEnd = Some(fileEnd())

  override def latestOffset(): Offset = BytePos(fileEnd())

  override def getDefaultReadLimit
      : org.apache.spark.sql.connector.read.streaming.ReadLimit =
    org.apache.spark.sql.connector.read.streaming.ReadLimit.allAvailable()

  override def latestOffset(start: Offset,
      limit: org.apache.spark.sql.connector.read.streaming.ReadLimit): Offset = {
    val end = availableNowEnd.getOrElse(fileEnd())
    if (maxBytesPerTrigger <= 0) return BytePos(end)
    val s = start.asInstanceOf[BytePos].pos
    if (end <= s) return BytePos(end)
    val capped = FileTailSource.lastLineEnd(path, math.min(end, s + maxBytesPerTrigger))
    if (capped > s) BytePos(capped)
    else {
      // one line exceeds the cap: admit through its end (never stall)
      val raf = new java.io.RandomAccessFile(path, "r")
      try {
        raf.seek(s)
        var pos = s
        var b = raf.read()
        while (b >= 0 && b != '\n' && pos < end) { pos += 1; b = raf.read() }
        BytePos(math.min(end, pos + 1))
      } finally raf.close()
    }
  }

  override def deserializeOffset(json: String): Offset = BytePos(json.toLong)

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[BytePos].pos
    val e = end.asInstanceOf[BytePos].pos
    if (e <= s) Array.empty
    // one delta range per micro-batch; both bounds are newline-aligned by
    // construction, so the reader emits whole appended lines exactly once
    else Array(FileTailPartition(path, s, e, exact = true))
  }

  override def createReaderFactory(): PartitionReaderFactory = new FileTailReaderFactory

  override def commit(end: Offset): Unit = () // the file is the retention
  override def stop(): Unit = ()
}
