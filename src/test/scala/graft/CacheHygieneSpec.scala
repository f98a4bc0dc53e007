package graft

import org.apache.spark.sql.functions._
import graft.functions.Dedup
import graft.plans.CacheScope

/** Library cache hygiene: every operator-internal persist (dedup family,
  * two-phase throttle) registers in CacheScope, and `CacheScope.scoped`
  * releases exactly those entries — the cache manager is EMPTY afterwards
  * without any global `clearCache()` involved in the assertion path.
  */
class CacheHygieneSpec extends SparkSpec {

  private def docsTokens = graft.model.Tok.rawSequences(
    spark.read.parquet(s"$sfDir/documents.parquet"))

  test("dedup/throttle operators leave no cache entries after CacheScope.scoped") {
    spark.catalog.clearCache() // flush anything earlier suites leaked
    assert(spark.sharedState.cacheManager.isEmpty)

    CacheScope.scoped { Dedup.keepSet(docsTokens, "tokens", "doc_id").collect() }
    assert(spark.sharedState.cacheManager.isEmpty, "keepSet leaked cache entries")

    CacheScope.scoped { Dedup.jaccardPairs(docsTokens, "tokens", "doc_id").collect() }
    assert(spark.sharedState.cacheManager.isEmpty, "jaccardPairs leaked cache entries")

    CacheScope.scoped {
      val t = docsTokens.filter(col("doc_id").cast("long") % 2 === 0)
      val e = docsTokens.filter(col("doc_id").cast("long") % 2 === 1)
      Dedup.crossJaccard(t, e, "tokens", "doc_id").collect()
    }
    assert(spark.sharedState.cacheManager.isEmpty, "crossJaccard leaked cache entries")

    import spark.implicits._
    val events = (1 to 200).map(i =>
      (s"k${i % 3}", java.sql.Timestamp.valueOf(s"2024-01-01 00:0${i % 6}:00"), i))
      .toDF("key", "ts", "n")
    CacheScope.scoped {
      graft.operators.Stateful.throttleTwoPhase(events, "key", "ts", "minute", 5,
        orderCols = Seq("n")).collect()
    }
    assert(spark.sharedState.cacheManager.isEmpty, "throttleTwoPhase leaked cache entries")
  }
}
