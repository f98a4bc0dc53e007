package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.Text
object JaccardMicro {
  def main(args: Array[String]): Unit = {
    val s = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions","32").config("spark.ui.enabled","false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    import s.implicits._
    val n = 409000
    val df = s.range(0, n, 1, 32)
      .withColumn("a", transform(sequence(lit(1), lit(90)), i => (col("id") + i * 7) % 50000))
      .withColumn("b", transform(sequence(lit(1), lit(90)), i => (col("id") + i * 11) % 50000))
      .persist()
    df.count()
    for (r <- 1 to 3) {
      var t0 = System.nanoTime()
      df.select(Text.jaccard(col("a"), col("b")).as("j")).filter(col("j") >= 0.0).count()
      println(f"jaccard(when+union2+intersect): ${(System.nanoTime()-t0)/1e9}%.2f s")
      t0 = System.nanoTime()
      df.select((size(array_intersect(col("a"), col("b"))).cast("double") /
        (size(col("a")) + size(col("b")) - size(array_intersect(col("a"), col("b"))))).as("j"))
        .filter(col("j") >= 0.0).count()
      println(f"jaccard(intersect only, distinct-size formula): ${(System.nanoTime()-t0)/1e9}%.2f s")
    }
    s.stop()
  }
}
