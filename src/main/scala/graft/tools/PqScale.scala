package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.functions.Similarity

/** Scale probe for the PQ paths: synthetic corpora of 64-dim vectors at
  * 1x/4x/16x row counts, (a) encode wall time — expected ~linear (pure
  * projection, zero shuffle), (b) ADC top-k over a pre-encoded CODES-ONLY
  * table vs brute-force cosine over raw vectors at the largest scale — the
  * bytes-scanned and per-row-arithmetic savings PQ exists for.
  */
object PqScale {
  def main(args: Array[String]): Unit = {
    val s = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")

    def time[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
    }

    // deterministic synthetic vectors: dim 64, component = sin-free integer
    // hash arithmetic mapped to [-1, 1)
    def vecs(n: Long) = s.range(0, n, 1, 32)
      .select(col("id").as("vec_id"),
        transform(sequence(lit(0), lit(63)),
          i => ((pmod(xxhash64(col("id") * 64 + i), lit(2000)) - 1000)
            .cast("double") / 1000.0).cast("float")).as("embedding"))

    val cbs = Similarity.pqCodebooks(
      vecs(64).filter(col("vec_id") >= 1), "embedding", "vec_id", m = 4, k = 8)
    val q = vecs(1).select("embedding").collect()(0).getSeq[Float](0).toArray
    val dt = Similarity.pqAdcTable(q, cbs)

    for (n <- Seq(1000000L, 4000000L, 16000000L)) {
      val (_, encSec) = time {
        Similarity.pqEncode(vecs(n), "embedding", cbs)
          .select(sum(col("code_0") + col("code_1") + col("code_2") + col("code_3")))
          .collect()
      }
      println(f"PQSCALE n=$n%d encode_sec=$encSec%.2f")
    }

    // query cost at the largest scale: codes-only ADC vs raw brute force
    val big = 16000000L
    val dir = java.nio.file.Files.createTempDirectory("graft_pqscale").toString
    Similarity.pqEncode(vecs(big), "embedding", cbs)
      .select("vec_id", "code_0", "code_1", "code_2", "code_3")
      .write.mode("overwrite").parquet(s"$dir/codes")
    vecs(big).write.mode("overwrite").parquet(s"$dir/raw")
    val codes = s.read.parquet(s"$dir/codes")
    val raw = s.read.parquet(s"$dir/raw")
    val (_, adcSec) = time {
      Similarity.pqTopK(codes, "vec_id", dt, 10).collect()
    }
    val (_, bruteSec) = time {
      Similarity.topK(raw, "embedding", "vec_id", q.toSeq, 10).collect()
    }
    def dirBytes(p: String): Long = {
      val d = new java.io.File(p)
      // data files only — _SUCCESS markers and .crc sidecars would inflate
      // the (tiny-file) codes side and understate the ratio
      d.listFiles().filter(f => f.isFile && f.getName.endsWith(".parquet"))
        .map(_.length).sum
    }
    println(f"PQSCALE query n=$big%d adc_sec=$adcSec%.2f brute_sec=$bruteSec%.2f " +
      f"codes_bytes=${dirBytes(s"$dir/codes")}%d raw_bytes=${dirBytes(s"$dir/raw")}%d")
    s.stop()
  }
}
