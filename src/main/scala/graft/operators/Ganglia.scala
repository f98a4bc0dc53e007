package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ganglia gmond codec (logstash-input-ganglia; the wire format is ganglia's
  * PUBLIC XDR protocol, gm_protocol.x — message id, then XDR-encoded fields:
  * u32 big-endian ints, strings as u32 length + bytes + pad-to-4, IEEE
  * big-endian float/double).
  *
  * Message ids handled:
  *   128 gmetadata_full — hostname, metric name, spoof, then the metadata
  *       block: value type, name (again), units, slope enum, tmax, dmax,
  *       extra (name,value) pairs (skipped);
  *   129 ushort / 130 short / 131 int / 132 uint — hostname, name, spoof,
  *       printf format, then the XDR value (shorts are XDR-promoted to u32);
  *   133 string / 134 float / 135 double — same envelope, typed value.
  *
  * The reference input caches metadata packets and annotates each value
  * packet with the (host, metric)'s declared type/units/slope/tmax/dmax.
  * The relational formulation of that cache is a JOIN: metadata is
  * config-sized (one row per distinct metric definition), so values
  * broadcast-join against the distinct metadata frame — no shuffle of the
  * value stream at any scale. A value with no metadata seen keeps null
  * annotations and tags `_gangliametadatamissing`; an undecodable datagram
  * tags `_gangliaparsefailure`.
  */
object Ganglia {

  private val SlopeNames = Array("zero", "positive", "negative", "both", "unspecified")

  private def esc(s: String): String = graft.model.Json.escape(s)

  /** Decode one XDR datagram into a tagged-union JSON row. */
  def toJson(b: Array[Byte]): String = {
    if (b == null || b.length < 4) return """{"kind":"bad"}"""
    try {
      val bb = java.nio.ByteBuffer.wrap(b)
      def str(): String = {
        val n = bb.getInt
        require(n >= 0 && n <= bb.remaining(), "bad xdr string length")
        val a = new Array[Byte](n); bb.get(a)
        bb.position(bb.position() + ((4 - n % 4) % 4))
        new String(a, java.nio.charset.StandardCharsets.UTF_8)
      }
      val id = bb.getInt
      id match {
        case 128 =>
          val host = str(); val name = str(); val spoof = bb.getInt != 0
          val typ = str(); str() /* name repeated */ ; val units = str()
          val slope = bb.getInt; val tmax = bb.getInt & 0xffffffffL
          val dmax = bb.getInt & 0xffffffffL
          val slopeName = if (slope >= 0 && slope < SlopeNames.length)
            SlopeNames(slope) else "unspecified"
          s"""{"kind":"meta","log_host":"${esc(host)}","name":"${esc(name)}",""" +
            s""""spoof":$spoof,"value_type":"${esc(typ)}","units":"${esc(units)}",""" +
            s""""slope":"$slopeName","tmax":$tmax,"dmax":$dmax}"""
        case v if v >= 129 && v <= 135 =>
          val host = str(); val name = str(); val spoof = bb.getInt != 0
          str() // printf format — the typed XDR value is authoritative
          val value = v match {
            case 129 | 132 => (bb.getInt & 0xffffffffL).toString // unsigned
            case 130 | 131 => bb.getInt.toString
            case 133 => str()
            case 134 => java.lang.Float.toString(bb.getFloat)
            case 135 => java.lang.Double.toString(bb.getDouble)
          }
          s"""{"kind":"value","log_host":"${esc(host)}","name":"${esc(name)}",""" +
            s""""spoof":$spoof,"val":"${esc(value)}"}"""
        case _ => """{"kind":"bad"}""" // 136 metadata_request and unknown ids
      }
    } catch { case scala.util.control.NonFatal(_) => """{"kind":"bad"}""" }
  }

  private val unpack = udf((b: Array[Byte]) => toJson(b))

  private val ParseDdl = "kind STRING, log_host STRING, name STRING, " +
    "spoof BOOLEAN, value_type STRING, units STRING, slope STRING, " +
    "tmax BIGINT, dmax BIGINT, val STRING"

  /** Decode a binary datagram column: one event per VALUE packet, annotated
    * by a broadcast join against the (config-sized) metadata packets.
    */
  def decode(df: DataFrame, source: String): DataFrame = {
    val schema = org.apache.spark.sql.types.StructType.fromDDL(ParseDdl)
    val rest = df.columns.filter(_ != source).map(col).toSeq
    // both the metadata aggregation and the value stream consume `parsed`
    // (a self-join): persist so the XDR decode runs ONCE, not once per
    // branch (CacheScope so the caller can release after materializing)
    val parsed = graft.plans.CacheScope.persist(df
      .select(rest :+ from_json(unpack(col(source)), schema).as("_gg"): _*)
      .select(rest :+ col("_gg.*"): _*))
    val meta = parsed.filter(col("kind") === "meta")
      .groupBy(col("log_host"), col("name"))
      .agg(min(struct(col("value_type"), col("units"), col("slope"),
        col("tmax"), col("dmax"))).as("_gm"))
    parsed.filter(col("kind") =!= "meta")
      .drop("value_type", "units", "slope", "tmax", "dmax")
      .join(broadcast(meta), Seq("log_host", "name"), "left")
      .select(rest ++ Seq(
        when(col("kind") === "bad", lit(null)).otherwise(col("log_host")).as("log_host"),
        when(col("kind") === "bad", lit(null)).otherwise(col("name")).as("name"),
        col("val"), col("_gm.value_type").as("value_type"),
        col("_gm.units").as("units"), col("_gm.slope").as("slope"),
        col("_gm.tmax").as("tmax"), col("_gm.dmax").as("dmax"), col("spoof"),
        when(col("kind") === "bad", array(lit("_gangliaparsefailure")))
          .when(col("_gm").isNull, array(lit("_gangliametadatamissing")))
          .otherwise(array().cast("array<string>")).as("tags")): _*)
  }

  // ---- fixture/encode side (tests + archives; the write half of the codec)

  private def xs(s: String): Array[Byte] = {
    val b = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val pad = (4 - b.length % 4) % 4
    java.nio.ByteBuffer.allocate(4 + b.length + pad).putInt(b.length).put(b).array()
  }
  private def xi(i: Int): Array[Byte] =
    java.nio.ByteBuffer.allocate(4).putInt(i).array()

  /** gmetadata_full (id 128). slope: 0 zero / 1 positive / 2 negative /
    * 3 both / 4 unspecified.
    */
  def metaPacket(host: String, name: String, typ: String, units: String,
                 slope: Int, tmax: Long, dmax: Long, spoof: Boolean = false,
                 extras: Seq[(String, String)] = Nil): Array[Byte] =
    xi(128) ++ xs(host) ++ xs(name) ++ xi(if (spoof) 1 else 0) ++
      xs(typ) ++ xs(name) ++ xs(units) ++ xi(slope) ++ xi(tmax.toInt) ++
      xi(dmax.toInt) ++ xi(extras.length) ++
      extras.flatMap { case (k, v) => xs(k) ++ xs(v) }

  private def valueHead(id: Int, host: String, name: String, fmt: String,
                        spoof: Boolean): Array[Byte] =
    xi(id) ++ xs(host) ++ xs(name) ++ xi(if (spoof) 1 else 0) ++ xs(fmt)

  def valueInt(host: String, name: String, v: Int,
               spoof: Boolean = false): Array[Byte] =
    valueHead(131, host, name, "%d", spoof) ++ xi(v)

  def valueUint(host: String, name: String, v: Long,
                spoof: Boolean = false): Array[Byte] =
    valueHead(132, host, name, "%u", spoof) ++ xi(v.toInt)

  def valueString(host: String, name: String, v: String,
                  spoof: Boolean = false): Array[Byte] =
    valueHead(133, host, name, "%s", spoof) ++ xs(v)

  def valueFloat(host: String, name: String, v: Float,
                 spoof: Boolean = false): Array[Byte] =
    valueHead(134, host, name, "%f", spoof) ++
      java.nio.ByteBuffer.allocate(4).putFloat(v).array()

  def valueDouble(host: String, name: String, v: Double,
                  spoof: Boolean = false): Array[Byte] =
    valueHead(135, host, name, "%lf", spoof) ++
      java.nio.ByteBuffer.allocate(8).putDouble(v).array()
}
