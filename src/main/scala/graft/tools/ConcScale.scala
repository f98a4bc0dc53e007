package graft.tools

import java.util.concurrent.Executors

import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{SnapshotTable => ST}

/** Scale evidence for optimistic multi-writer appends: W contended writers
  * must (1) all commit with zero loss and a contiguous chain, (2) take no
  * longer than the same data appended serially (the CAS serializes only the
  * metadata claim — data writes overlap), and (3) keep that property as the
  * TABLE grows (commit cost is manifest-sized, never table-sized: a lost
  * race re-reads one manifest and renames one dir, it never re-reads or
  * re-writes data). The 100 TB reading: K ingest pipelines feeding one
  * table pay K-way parallel data writes plus a metadata-only commit queue.
  *
  * Run: sbt "runMain graft.tools.ConcScale [bandRows] [writers] [rounds]"
  */
object ConcScale {
  def main(args: Array[String]): Unit = {
    val bandRows = args.headOption.map(_.toLong).getOrElse(250000L)
    val writers = if (args.length > 1) args(1).toInt else 8
    val rounds = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16").toInt
    val spark = SparkSession.builder()
      .appName("conc-scale").master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val wh = java.nio.file.Files.createTempDirectory("graft_concscale").toString

    def band(b: Long) =
      spark.range(b * bandRows, (b + 1) * bandRows).toDF("id")
        .withColumn("v", concat(lit("v"), col("id")))

    def timed[A](f: => A): (Double, A) = {
      val t0 = System.nanoTime(); val r = f
      ((System.nanoTime() - t0) / 1e9, r)
    }

    println(f"${"round"}%6s ${"dirs_before"}%12s ${"serial_s"}%9s " +
      f"${"conc_s"}%9s ${"conc/serial"}%12s")
    var nextBand = 0L
    (1 to rounds).foreach { round =>
      // serial control: W appends one after another onto tableS
      val tS = s"$wh/serial"
      val (serialS, _) = timed {
        (0 until writers).foreach { w =>
          ST.append(spark, band(nextBand + w), tS,
            batchId = Some(s"r$round-s$w"), statsBy = Seq("id"))
        }
      }
      // contended: W writers racing one table through the CAS
      val tC = s"$wh/conc"
      val dirsBefore = ST.latestId(spark, tC).map(_ + 1).getOrElse(0L)
      val pool = Executors.newFixedThreadPool(writers)
      implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
      val (concS, commits) = timed {
        try Await.result(Future.sequence((0 until writers).map { w =>
          Future(ST.appendConcurrent(spark, band(nextBand + w), tC,
            batchId = Some(s"r$round-c$w"), statsBy = Seq("id"), maxRetries = 256))
        }), 600.seconds) finally pool.shutdown()
      }
      nextBand += writers
      require(commits.forall(!_.skippedExisting), "every contended writer must commit")
      val last = ST.latestId(spark, tC).get
      require(last + 1 == dirsBefore + writers,
        s"chain must grow by exactly $writers (got ${last + 1 - dirsBefore})")
      val m = ST.manifest(spark, tC, last)
      require(m.totalRows == (dirsBefore + writers) * bandRows,
        s"zero loss: expected ${(dirsBefore + writers) * bandRows}, got ${m.totalRows}")
      println(f"$round%6d $dirsBefore%12d $serialS%9.2f $concS%9.2f " +
        f"${concS / serialS}%12.2f")
    }
    // end state: full-table read sees every row exactly once
    val n = ST.read(spark, s"$wh/conc").select("id").distinct().count()
    require(n == rounds * writers * bandRows, s"distinct ids $n")
    println(s"FINAL conc table rows=$n dirs=${ST.manifest(spark, s"$wh/conc",
      ST.latestId(spark, s"$wh/conc").get).live.size} (all distinct, zero loss)")
    spark.stop()
  }
}
