package graft

import org.apache.spark.sql.functions._

/** Exhaustive coverage for the bytes-size parser: every (number, unit
  * spelling, spacing, conversion method) combination parses to the exact
  * multiplier — one vectorized pass over all cases — and garbage never
  * parses.
  */
class ExtrasPropertySpec extends SparkSpec {

  private val units = Seq(
    "" -> 0, "b" -> 0, "B" -> 0,
    "kb" -> 1, "Kb" -> 1, "KB" -> 1, "kib" -> 1, "KiB" -> 1, "k" -> 1,
    "mb" -> 2, "MB" -> 2, "MiB" -> 2, "m" -> 2,
    "gb" -> 3, "GB" -> 3, "GiB" -> 3,
    "tb" -> 4, "TiB" -> 4, "pb" -> 5, "eb" -> 6)

  test("bytes: number x unit x spacing x method parses to base^power, exhaustively") {
    import spark.implicits._
    val cases = for {
      numStr <- Seq("0", "7", "1024", "2.5", "99999.01")
      (u, pow) <- units
      sp <- Seq("", " ", "  ")
      binary <- Seq(true, false)
    } yield {
      val base = if (binary) 1024.0 else 1000.0
      (s"$numStr$sp$u", binary, numStr.toDouble * math.pow(base, pow.toDouble))
    }
    val df = cases.toDF("s", "bin", "want")
    val got = df.withColumn("got",
        when(col("bin"), graft.operators.Extras.parseBytes(col("s"), binary = true))
          .otherwise(graft.operators.Extras.parseBytes(col("s"), binary = false)))
      .filter(col("got").isNull || col("got") =!= col("want"))
      .collect()
    assert(got.isEmpty, got.take(5).mkString("; "))
    assert(cases.size == 5 * units.size * 3 * 2)
  }

  test("bytes: garbage strings parse to null, never a number") {
    import spark.implicits._
    val bad = Seq("", "x", "12 parsecs", "kb", "1..2kb", "12kbx", "--3", "1.2.3mb")
    val rows = bad.toDF("s")
      .select(graft.operators.Extras.parseBytes(col("s")).as("v"), col("s"))
      .filter(col("v").isNotNull).collect()
    assert(rows.isEmpty, rows.mkString("; "))
  }
}
