package graft.sources

import java.util
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Logstash `beats` input as a native DataSourceV2 source, speaking the
  * PUBLIC lumberjack v2 wire protocol (the Beats transport; spec published
  * with elastic/go-lumber and the beats protocol docs — implementation here
  * is original, written from the framing rules):
  *
  *   frame  = version '2' + type byte
  *   'W'    window size: uint32 count (events before the client expects ack)
  *   'J'    json data:   uint32 seq, uint32 len, payload (one event as JSON)
  *   'D'    data:        uint32 seq, uint32 npairs, then per pair
  *                       uint32 klen + key, uint32 vlen + value
  *   'C'    compressed:  uint32 len, zlib payload of concatenated frames
  *   ack    server -> client: '2' 'A' uint32 seq (highest processed)
  *
  * Same replayable-journal architecture as [[TcpSource]]: the accept-loop
  * listener decodes frames and journals ONE JSON LINE PER EVENT ('J'
  * payloads verbatim, 'D' pairs encoded as a flat JSON object), acking
  * AFTER the journal append — ack implies durable, the protocol's
  * at-least-once contract. The micro-batch stream then reads byte-offset
  * deltas via the FileTail machinery; a `json` filter (with schema)
  * recovers the event fields downstream.
  */
class BeatsSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    FileTailSource.Schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new BeatsTable(new CaseInsensitiveStringMap(properties))
}

object BeatsSource {

  private def jsonEscape(s: String): String = graft.model.Json.escape(s)

  final class Listener(port: Int, journal: java.nio.file.Path) {
    private val server = new java.net.ServerSocket(port)
    @volatile private var closed = false
    def localPort: Int = server.getLocalPort
    def journalPath: java.nio.file.Path = journal

    private def append(lines: String): Unit = synchronized {
      java.nio.file.Files.writeString(journal, lines,
        java.nio.file.StandardOpenOption.CREATE,
        java.nio.file.StandardOpenOption.APPEND)
    }

    private def sendAck(out: java.io.OutputStream, seq: Int): Unit = {
      val b = java.nio.ByteBuffer.allocate(6)
      b.put('2'.toByte).put('A'.toByte).putInt(seq)
      out.write(b.array()); out.flush()
    }

    private final class ConnState {
      var window: Int = 0
      var inWindow: Int = 0 // events since the last ack (a 'C' frame counts each inner event)
      var maxSeq: Int = 0
    }

    /** Decode one frame from `in`, journaling data events and updating the
      * connection's window counters (inner frames of a compressed batch each
      * count); throws EOFException at stream end.
      */
    private def handleFrame(in: java.io.DataInputStream,
                            state: ConnState): Unit = {
      in.readByte() // protocol version ('2'; v1 frames share the layout used here)
      in.readByte().toChar match {
        case 'W' =>
          state.window = in.readInt()
        case 'J' =>
          val seq = in.readInt()
          val len = in.readInt()
          val payload = new Array[Byte](len)
          in.readFully(payload)
          val line = new String(payload, java.nio.charset.StandardCharsets.UTF_8)
            .replace("\n", " ") // journal is line-framed; payloads are one event
          append(line + "\n")
          state.maxSeq = math.max(state.maxSeq, seq); state.inWindow += 1
        case 'D' =>
          val seq = in.readInt()
          val n = in.readInt()
          val sb = new java.lang.StringBuilder("{")
          var i = 0
          while (i < n) {
            val k = new Array[Byte](in.readInt()); in.readFully(k)
            val v = new Array[Byte](in.readInt()); in.readFully(v)
            if (i > 0) sb.append(',')
            sb.append('"').append(jsonEscape(new String(k, "UTF-8"))).append("\":\"")
              .append(jsonEscape(new String(v, "UTF-8"))).append('"')
            i += 1
          }
          sb.append('}')
          append(sb.toString + "\n")
          state.maxSeq = math.max(state.maxSeq, seq); state.inWindow += 1
        case 'C' =>
          val len = in.readInt()
          val packed = new Array[Byte](len)
          in.readFully(packed)
          val inner = new java.io.DataInputStream(new java.util.zip.InflaterInputStream(
            new java.io.ByteArrayInputStream(packed)))
          try { while (true) handleFrame(inner, state) }
          catch { case _: java.io.EOFException => () }
        case other =>
          throw new java.io.IOException(s"unknown lumberjack frame type `$other`")
      }
    }

    private val acceptLoop = new Thread(() => {
      while (!closed) {
        try {
          val sock = server.accept()
          val t = new Thread(() => {
            val in = new java.io.DataInputStream(
              new java.io.BufferedInputStream(sock.getInputStream))
            val out = sock.getOutputStream
            val state = new ConnState
            try {
              while (true) {
                handleFrame(in, state)
                // ack after the journal append once the window fills —
                // ack implies durable (at-least-once contract)
                if (state.window > 0 && state.inWindow >= state.window) {
                  sendAck(out, state.maxSeq); state.inWindow = 0
                }
              }
            } catch {
              case _: java.io.EOFException =>
                if (state.inWindow > 0)
                  try sendAck(out, state.maxSeq) catch { case _: Throwable => () }
              case _: Throwable => ()
            } finally sock.close()
          }, s"graft-beats-conn-$port")
          t.setDaemon(true); t.start()
        } catch { case _: Throwable if closed => () case _: Throwable => () }
      }
    }, s"graft-beats-accept-$port")
    acceptLoop.setDaemon(true)
    acceptLoop.start()

    def close(): Unit = { closed = true; server.close() }
  }

  private val listeners =
    scala.collection.concurrent.TrieMap.empty[Int, Listener]

  def ensureListener(port: Int, journal: java.nio.file.Path): Listener = {
    val l = listeners.getOrElseUpdate(port, new Listener(port, journal))
    require(l.journalPath == journal,
      s"beats port $port already journals to ${l.journalPath}, not $journal — " +
        "stopListener first or reuse the existing journal")
    l
  }

  def stopListener(port: Int): Unit =
    listeners.remove(port).foreach(_.close())

  def defaultJournal(port: Int): java.nio.file.Path =
    java.nio.file.Paths.get(sys.props("java.io.tmpdir"), s"graft_beats_$port.journal")
}

private class BeatsTable(options: CaseInsensitiveStringMap)
  extends Table with SupportsRead {

  private val port = options.getInt("port", 0)
  private val journal = Option(options.get("journal"))
    .map(java.nio.file.Paths.get(_))
    .getOrElse(BeatsSource.defaultJournal(port))

  override def name(): String = s"graft_beats($port -> $journal)"
  override def schema(): StructType = FileTailSource.Schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ)

  override def newScanBuilder(opts: CaseInsensitiveStringMap): ScanBuilder = {
    BeatsSource.ensureListener(port, journal)
    val merged = new util.HashMap[String, String](options)
    merged.putAll(opts)
    merged.put("path", journal.toString)
    new FileTailScan(new CaseInsensitiveStringMap(merged))
  }
}
