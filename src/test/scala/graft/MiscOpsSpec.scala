package graft

import org.apache.spark.sql.functions._
import graft.operators.{Mutate, Route}

/** Specs for the small operators: uuid, truncate/anonymize/de_dot, ordered
  * sink mode, flow-rate Aggregator.
  */
class MiscOpsSpec extends SparkSpec {

  test("uuid filter: one UUID per row, overwrite semantics") {
    import spark.implicits._
    val df = Seq(1, 2, 3).toDF("id")
    val out = Mutate.uuidField(df, "uid").collect().map(_.getAs[String]("uid"))
    assert(out.distinct.length == 3)
    assert(out.forall(_.matches("[0-9a-f-]{36}")))
  }

  test("de_dot renames dotted columns") {
    import spark.implicits._
    val df = Seq((1, 2)).toDF("a.b", "c")
    assert(Mutate.deDot(df).columns.toSeq == Seq("a_b", "c"))
  }

  test("ordered run: sink files sorted by doc_id within partitions") {
    val out = java.nio.file.Files.createTempDirectory("graft_ordered").toString
    val pipe = StandardPipeline.fromDir(spark, sfDir)
    val r = Route.run(spark, pipe.trunk, StandardPipeline.sinks.toIndexedSeq, out, ordered = true)
    assert(r.counts("_total") == 500)
    // per input-file order check: read each part file alone, ids must be sorted
    val dir = new java.io.File(s"$out/sink_teamA")
    val parts = dir.listFiles().filter(_.getName.endsWith(".parquet"))
    assert(parts.nonEmpty)
    parts.foreach { p =>
      val ids = spark.read.parquet(p.getAbsolutePath).select("doc_id")
        .collect().map(_.getString(0)).toSeq
      assert(ids == ids.sorted, s"unsorted ${p.getName}")
    }
  }

  test("flow-rate Aggregator matches hand-computed rate and merges across partitions") {
    import spark.implicits._
    // 11 events over exactly 10 seconds -> 1.1 events/sec
    val ts = (0 to 10).map(i => i * 1000000L)
    val df = ts.toDF("ts_us").repartition(4)
    val got = df.agg(graft.functions.FlowAgg.eventsPerSec(col("ts_us"))).collect()(0).getDouble(0)
    assert(math.abs(got - 1.1) < 1e-9)
    // empty span
    val one = Seq(5L).toDF("ts_us")
    assert(one.agg(graft.functions.FlowAgg.eventsPerSec(col("ts_us"))).collect()(0).getDouble(0) == 0.0)
  }

  test("VocabTokenize kernel is byte-identical to the built-in composition") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val diff = docs.select(
      graft.model.Tok.tokenize(col("text")).as("a"),
      graft.model.Tok.tokenizeBuiltins(col("text")).as("b"))
      .filter(not(col("a") <=> col("b"))).count()
    assert(diff == 0)
  }
}
