package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale-evidence probe for manifest-stats scan pruning (PLANS_r05.md).
  * Claims under test:
  *   - after a CLUSTERED compaction (one data dir per range bucket, each
  *     with manifest min/max stats), a band predicate's `readWhere` plans
  *     only the intersecting dirs — wall cost tracks the BAND, not the
  *     table (`planScan` is pure driver-side metadata);
  *   - before clustering, appends are arrival-ordered: every dir spans the
  *     full key range, nothing prunes, and the same predicate scans
  *     everything — the measured gap IS the value of stats + clustering.
  *
  * Usage: sbt "runMain graft.tools.PruneScale"
  */
object PruneScale {
  def main(args: Array[String]): Unit = {
    val s = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    import graft.operators.{SnapshotTable => ST}

    def time[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
    }

    val t = java.nio.file.Files.createTempDirectory("graft_prunescale").toString
    val k = 16
    val rowsPer = 4000000L
    val total = k * rowsPer
    // arrival-interleaved: batch i holds ids ≡ i (mod k), so every append
    // dir spans the WHOLE id range — the worst case for stats pruning and
    // exactly what arrival order looks like in production
    (0 until k).foreach { i =>
      val batch = s.range(0, rowsPer, 1, 32)
        .select((col("id") * k + i).as("id"))
        .select(col("id"), concat(lit("payload "), col("id")).as("v"))
      ST.append(s, batch, t, Some(s"b$i"), statsBy = Seq("id"))
    }
    val band = ST.KeyRange("id", Some(0L), Some(total / k - 1L)) // 1/16 of keys

    // planned-IO metric: bytes under the dirs the scan plan keeps — the
    // number that scales to 100 TB (local wall at this size is task-count
    // bound, not IO bound, so bytes is the honest comparison)
    def plannedBytes(dirs: Seq[String]): Long = {
      val fs = new org.apache.hadoop.fs.Path(t)
        .getFileSystem(s.sparkContext.hadoopConfiguration)
      dirs.map(d => fs.getContentSummary(
        new org.apache.hadoop.fs.Path(s"$t/data/$d")).getLength).sum
    }

    val mPre = ST.manifest(s, t, ST.latestId(s, t).get)
    val (keptPre, prunedPre) = ST.planScan(mPre, band)
    val (sumPre, secPre) = time(
      ST.readWhere(s, t, band).agg(sum("id")).collect()(0).getLong(0))
    println(f"PRE-cluster : kept=${keptPre.size}/${mPre.live.size} dirs " +
      f"(pruned ${prunedPre.size}) planned ${plannedBytes(keptPre) / 1e6}%.0f MB " +
      f"band read $secPre%6.2f s (sum=$sumPre)")

    val (_, compactSec) = time(ST.compact(s, t, targetFiles = k, sortBy = Seq("id")))
    val mPost = ST.manifest(s, t, ST.latestId(s, t).get)
    val (keptPost, prunedPost) = ST.planScan(mPost, band)
    val (sumPost, secPost) = time(
      ST.readWhere(s, t, band).agg(sum("id")).collect()(0).getLong(0))
    val (sumFull, secFull) = time(
      ST.read(s, t).agg(sum("id")).collect()(0).getLong(0))
    require(sumPost == sumPre, s"pruned read changed the answer: $sumPre vs $sumPost")
    println(f"compact     : $compactSec%6.2f s (clustered, $k buckets)")
    println(f"POST-cluster: kept=${keptPost.size}/${mPost.live.size} dirs " +
      f"(pruned ${prunedPost.size}) planned ${plannedBytes(keptPost) / 1e6}%.0f MB " +
      f"of ${plannedBytes(mPost.live) / 1e6}%.0f MB total " +
      f"band read $secPost%6.2f s (sum=$sumPost)")
    println(f"full read   : $secFull%6.2f s (sum=$sumFull)")
    s.stop()
  }
}
