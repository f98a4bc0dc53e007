package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{SnapshotTable => ST}

/** Scale evidence for the SQL catalog read path: as the table grows by
  * banded appends (more data dirs, more rows), a band-predicate SELECT
  * must stay FLAT (manifest-stats dir pruning bounds the scan to the one
  * dir the band lives in) and a bare global count/min/max must stay
  * metadata-priced (manifest-answered LocalTableScan, zero parquet IO) —
  * while an unpruned full aggregate grows linearly. The 100 TB argument:
  * query cost tracks the DATA THE PREDICATE CAN TOUCH, not table size.
  *
  * Run: sbt "runMain graft.tools.SqlScale [bandRows] [bands...]"
  */
object SqlScale {
  def main(args: Array[String]): Unit = {
    val bandRows = args.headOption.map(_.toLong).getOrElse(250000L)
    val bandSteps = if (args.length > 1) args.drop(1).map(_.toInt).toSeq
                    else Seq(4, 16, 64)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt
    val spark = SparkSession.builder()
      .appName("sql-scale").master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val wh = java.nio.file.Files.createTempDirectory("graft_sqlscale").toString
    spark.conf.set("spark.sql.catalog.gss", "graft.sources.SnapshotCatalog")
    spark.conf.set("spark.sql.catalog.gss.root", wh)
    spark.conf.set("spark.sql.maxMetadataStringLength", "4000")
    val tdir = s"$wh/t"

    def appendBand(b: Int): Unit =
      ST.append(spark,
        spark.range(b * bandRows, (b + 1) * bandRows).toDF("id")
          .withColumn("v", concat(lit("v"), col("id")))
          .withColumn("x", col("id") % 97),
        tdir, statsBy = Seq("id"))

    def timeMin[A](reps: Int)(f: => A): (Double, A) = {
      var best = Double.MaxValue; var out: A = f // warm
      (1 to reps).foreach { _ =>
        val t0 = System.nanoTime(); out = f
        best = math.min(best, (System.nanoTime() - t0) / 1e9)
      }
      (best, out)
    }

    var built = 0
    println(f"${"dirs"}%6s ${"rows"}%12s ${"band_sel_s"}%12s " +
      f"${"manifest_agg_s"}%15s ${"full_agg_s"}%12s  pruned_plan")
    bandSteps.foreach { bands =>
      (built until bands).foreach(appendBand)
      built = bands
      // band predicate: always band 1 (fixed work at every size)
      val lo = bandRows
      val hi = 2 * bandRows - 1
      val sel = s"SELECT count(*) AS c, sum(x) AS sx FROM gss.t " +
        s"WHERE id BETWEEN $lo AND $hi"
      val (tBand, bandRes) = timeMin(3)(spark.sql(sel).collect()(0))
      require(bandRes.getLong(0) == bandRows, s"band count ${bandRes.getLong(0)}")
      val plan = spark.sql(sel).queryExecution.executedPlan.toString
      val scanned = "snap-\\d{6}".r.findAllIn(plan).toSet
      require(scanned == Set("snap-000001"),
        s"band SELECT must scan exactly dir snap-000001, scanned $scanned")
      val (tMan, manRes) = timeMin(3)(spark.sql(
        "SELECT count(*) AS c, min(id) AS lo, max(id) AS hi FROM gss.t").collect()(0))
      require(manRes.getLong(0) == bands * bandRows)
      val manPlan = spark.sql(
        "SELECT count(*) AS c FROM gss.t").queryExecution.executedPlan.toString
      require(manPlan.contains("LocalTableScan") && !manPlan.contains("Parquet"),
        s"global agg must be manifest-answered:\n$manPlan")
      val (tFull, _) = timeMin(3)(spark.sql(
        "SELECT sum(x) AS sx FROM gss.t").collect()(0))
      println(f"$bands%6d ${bands * bandRows}%12d $tBand%12.3f " +
        f"$tMan%15.4f $tFull%12.3f  ${scanned.mkString(",")}")
    }
    spark.stop()
  }
}
