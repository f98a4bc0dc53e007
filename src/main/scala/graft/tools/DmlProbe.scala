package graft.tools

import org.apache.spark.sql.SparkSession

import graft.operators.{SnapshotTable => ST}

/** Scratch probe: how does Spark 4.1 analyze UPDATE / MERGE INTO over a
  * catalog table WITHOUT row-level-operation support? Prints the analyzed
  * plan (or the failure phase) so the DML rule hooks the right seam.
  */
object DmlProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .appName("dml-probe").master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val wh = java.nio.file.Files.createTempDirectory("graft_dmlprobe").toString
    spark.conf.set("spark.sql.catalog.gdml", "graft.sources.SnapshotCatalog")
    spark.conf.set("spark.sql.catalog.gdml.root", wh)
    ST.append(spark, Seq((1L, "a", 10L), (2L, "b", 20L)).toDF("id", "v", "x"),
      s"$wh/t", statsBy = Seq("id"))
    ST.append(spark, Seq((5L, "e", 50L)).toDF("id", "v", "x"), s"$wh/t")

    def phase(label: String)(sqlText: String): Unit = {
      println(s"===== $label")
      try {
        spark.sql(sqlText).show(false)
        spark.sql("SELECT * FROM gdml.t ORDER BY id").show(false)
      } catch { case e: Throwable =>
        println(s"-- FAIL: ${e.getClass.getName}: ${e.getMessage.take(400)}")
        e.getStackTrace.take(10).foreach(f => println(s"   at $f"))
      }
    }

    phase("UPDATE")("UPDATE gdml.t SET v = 'z', x = x + 1 WHERE id = 1")
    phase("DELETE multi-col")("DELETE FROM gdml.t WHERE id > 1 AND v = 'b'")
    phase("MERGE")(
      """MERGE INTO gdml.t USING (SELECT 2 AS id, 'bb' AS v, 200 AS x
        |                         UNION ALL SELECT 9, 'i', 90) s
        |ON t.id = s.id
        |WHEN MATCHED THEN UPDATE SET v = s.v, x = t.x + s.x
        |WHEN NOT MATCHED THEN INSERT (id, v, x) VALUES (s.id, s.v, s.x)
        |""".stripMargin)
    phase("MERGE star")(
      """MERGE INTO gdml.t USING (SELECT 1 AS id, 'q' AS v, 7 AS x) s
        |ON t.id = s.id
        |WHEN MATCHED THEN UPDATE SET *
        |WHEN NOT MATCHED THEN INSERT *
        |""".stripMargin)
    phase("MERGE delete-clause")(
      """MERGE INTO gdml.t USING (SELECT 9 AS id, true AS del) s
        |ON t.id = s.id
        |WHEN MATCHED AND s.del THEN DELETE
        |""".stripMargin)
    spark.stop()
  }
}
