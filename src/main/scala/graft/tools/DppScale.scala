package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{SnapshotTable => ST}

/** Scale evidence for runtime key-set pruning ([[ST.joinPruned]]): a
  * fact table keyed on a HASH (so every data dir spans the whole key
  * range — min/max bounds can never prune) grows by appends, while a
  * fixed config-sized dimension (20 keys, each present in exactly one
  * dir) joins against it. The pruned star join must stay FLAT — the
  * Bloom sidecars keep at most |dim| dirs at any table size — while the
  * same join over the full read grows with the table. The 100 TB
  * argument: "enrich these 20 flagged entities" touches the dirs that
  * hold them, decided from manifest metadata before any fact IO.
  *
  * Run: sbt "runMain graft.tools.DppScale [bandRows] [bands...]"
  */
object DppScale {
  def main(args: Array[String]): Unit = {
    val bandRows = args.headOption.map(_.toLong).getOrElse(250000L)
    val bandSteps = if (args.length > 1) args.drop(1).map(_.toInt).toSeq
                    else Seq(4, 16, 64)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt
    val spark = SparkSession.builder()
      .appName("dpp-scale").master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val t = java.nio.file.Files.createTempDirectory("graft_dppscale").toString

    // fact key = md5(id): uniformly spread strings, every dir's [min,max]
    // hull covers essentially the whole key space
    def band(b: Int) =
      spark.range(b * bandRows, (b + 1) * bandRows)
        .select(md5(col("id").cast("string")).as("k"),
          (col("id") % 1000).as("x"))

    // the dimension: 20 keys from band 1 — FIXED as the table grows
    val dimDf = spark.range(0, 20)
      .select((lit(bandRows) + col("id") * (bandRows / 20)).as("id"))
      .select(md5(col("id").cast("string")).as("k"),
        concat(lit("tag"), col("id")).as("tag"))

    def timeMin[A](reps: Int)(f: => A): (Double, A) = {
      var best = Double.MaxValue; var out: A = f // warm
      (1 to reps).foreach { _ =>
        val t0 = System.nanoTime(); out = f
        best = math.min(best, (System.nanoTime() - t0) / 1e9)
      }
      (best, out)
    }

    var built = 0
    println(f"${"dirs"}%6s ${"rows"}%12s ${"kept"}%6s " +
      f"${"pruned_join_s"}%14s ${"full_join_s"}%12s")
    bandSteps.foreach { bands =>
      (built until bands).foreach(b =>
        ST.append(spark, band(b), t, Some(s"b$b"),
          statsBy = Seq("k"), bloomBy = Seq("k")))
      built = bands
      val m = ST.manifest(spark, t, ST.latestId(spark, t).get)
      // bounds alone keep everything (hashed keys defeat min/max)...
      val keys = dimDf.select("k").collect().map(_.getString(0)).toSeq
      val boundsKept = m.live.count { d =>
        val st = m.stats.find(s => s.dir == d && s.column == "k")
        st.forall(s => keys.exists(k => s.min <= k && k <= s.max))
      }
      require(boundsKept == m.live.size,
        s"hashed keys must defeat bounds (bounds kept $boundsKept/${m.live.size})")
      // ...the Blooms keep at most |dim| dirs at ANY size
      val (kept, _) = ST.planScanIn(spark, t, m, "k", keys)
      require(kept.size <= keys.size,
        s"bloom pruning must bound kept dirs by |dim| (kept ${kept.size})")
      val (tPruned, nP) = timeMin(3)(
        ST.joinPruned(spark, t, dimDf, "k").count())
      val (tFull, nF) = timeMin(3)(
        ST.read(spark, t).join(broadcast(dimDf), Seq("k")).count())
      require(nP == 20 && nF == 20, s"join rows $nP/$nF != 20")
      println(f"$bands%6d ${bands * bandRows}%12d ${kept.size}%6d " +
        f"$tPruned%14.3f $tFull%12.3f")
    }
    spark.stop()
  }
}
