package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale-evidence probe for row-level CDC (PLANS_r05.md): a clustered
  * table built from FIXED-size banded appends (manifest stats disjoint per
  * band), grown by adding MORE bands, then a fixed 50k-row upsert confined
  * to band 0 and a `changelogCdc` read of that commit. The claims under
  * test:
  *   - upsert's copy-on-write rewrite prunes to the ONE stats-intersecting
  *     dir (require()d from the manifest diff), so the commit cost is
  *     band-sized, not table-sized;
  *   - `changelogCdc` diffs only the rewritten dirs (removed exceptAll
  *     added), so its wall stays ~flat while the table grows 16x.
  *
  * Usage: sbt "runMain graft.tools.CdcScale"
  */
object CdcScale {
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

    val per = 250000L // fixed band (dir) size; the table grows in bands
    for (bands <- Seq(4, 16, 64)) {
      val n = per * bands
      val t = java.nio.file.Files.createTempDirectory(s"graft_cdcscale_$bands").toString
      for (k <- 0 until bands) {
        val df = s.range(k * per, (k + 1) * per, 1, 8)
          .select(col("id"), concat(lit("v"), col("id")).as("v"))
        ST.append(s, df, t, Some(s"b$k"), statsBy = Seq("id"))
      }
      // fixed 50k-row delta confined to band 0 (ids 0..49999 < 250k)
      val delta = s.range(0L, 50000L, 1, 8)
        .select(col("id"), concat(lit("w"), col("id")).as("v"))
      val (_, tUp) = time(ST.upsert(s, t, delta, "id"))
      val last = ST.latestId(s, t).get
      val m = ST.manifest(s, t, last)
      val removed = ST.manifest(s, t, last - 1).live.filterNot(m.live.toSet)
      require(removed.size == 1,
        s"upsert must rewrite exactly the one stats-intersecting dir, got $removed")
      val (cnt, tCdc) = time(ST.changelogCdc(s, t, last - 1, last).count())
      require(cnt == 100000L, s"expected 50k deletes + 50k inserts, got $cnt")
      s.catalog.clearCache()
      println(f"cdc bands=$bands%3d table=$n%9d upsert=$tUp%6.2f s " +
        f"cdc=$tCdc%6.2f s rows=$cnt")
    }
    s.stop()
  }
}
