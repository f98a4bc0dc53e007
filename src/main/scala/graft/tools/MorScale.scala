package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale-evidence probe for merge-on-read equality deletes (PLANS_r05.md):
  * a table of fixed 250k-row banded appends grown 4 -> 16 -> 64 dirs, then
  * a fixed 10k-key delete whose keys are spread ACROSS EVERY band — the
  * copy-on-write worst case (every dir stats-intersects, so `delete`/
  * `upsert` would rewrite the whole table). The claims under test:
  *   - `deleteKeys` commit wall is FLAT across 16x table growth (it writes
  *     one small key file and one manifest — nothing is read or rewritten;
  *     require()d: no data dir added, live set unchanged);
  *   - the merged read (anti-join of the broadcast key set) stays within a
  *     small constant factor of the plain pre-delete scan at every size.
  *
  * Usage: sbt "runMain graft.tools.MorScale"
  */
object MorScale {
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
    val nKeys = 10000L
    for (bands <- Seq(4, 16, 64)) {
      val n = per * bands
      val t = java.nio.file.Files.createTempDirectory(s"graft_morscale_$bands").toString
      for (k <- 0 until bands) {
        val df = s.range(k * per, (k + 1) * per, 1, 8)
          .select(col("id"), concat(lit("v"), col("id")).as("v"))
        ST.append(s, df, t, Some(s"b$k"), statsBy = Seq("id"))
      }
      val (c0, tPlain) = time(ST.read(s, t).count())
      require(c0 == n, s"expected $n rows, got $c0")
      // 10k keys strided across the FULL id range: every band holds some
      val keys = s.range(0L, n, n / nKeys, 8).select(col("id"))
      val (_, tDel) = time(ST.deleteKeys(s, t, keys, "id"))
      val last = ST.latestId(s, t).get
      val m = ST.manifest(s, t, last)
      require(m.added.isEmpty && m.live.size == bands,
        s"MOR delete must add/rewrite nothing (added=${m.added}, live=${m.live.size})")
      val (c1, tMerged) = time(ST.read(s, t).count())
      require(c1 == n - nKeys, s"expected ${n - nKeys} rows, got $c1")
      // MOR upsert of 10k rows whose keys ALSO stride every band (offset 1
      // from the deleted ids, so all still exist): one data dir + one
      // delete file, no rewrite — where CoW upsert would rewrite the table
      val delta = s.range(0L, n, n / nKeys, 8)
        .select((col("id") + 1).as("id"), concat(lit("u"), col("id") + 1).as("v"))
      val (_, tUp) = time(ST.upsertKeys(s, t, delta, "id"))
      val mu = ST.manifest(s, t, ST.latestId(s, t).get)
      require(mu.added.size == 1 && mu.live.size == bands + 1,
        s"MOR upsert must add one dir and rewrite nothing (live=${mu.live.size})")
      val (c2, _) = time(ST.read(s, t).count())
      require(c2 == n - nKeys, s"upsert replaces in place: expected ${n - nKeys}, got $c2")
      s.catalog.clearCache()
      println(f"mor bands=$bands%3d table=$n%9d del=$tDel%6.2f s " +
        f"upsert=$tUp%6.2f s scan_plain=$tPlain%6.2f s " +
        f"scan_merged=$tMerged%6.2f s overhead=${tMerged / tPlain}%4.2fx")
    }
    s.stop()
  }
}
