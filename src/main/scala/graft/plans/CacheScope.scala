package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Scoped registry for operator-internal persists.
  *
  * Several operators (two-phase throttle, the dedup/decontamination family)
  * persist an intermediate that feeds multiple join branches — the persist is
  * load-bearing (Catalyst does not CSE across self-join branches), but the
  * frames they RETURN are lazy, so the operator itself can never safely
  * unpersist. Instead of leaking the cache entry until someone calls the
  * global `clearCache()` (which nukes unrelated caches too), operators
  * register each persist here and callers release exactly those entries once
  * the result has been materialized:
  *
  * {{{
  *   val kept = CacheScope.scoped { Dedup.keepSet(docs, "tokens", "doc_id").collect() }
  *   // every operator-internal cache entry is gone here
  * }}}
  *
  * `scoped` nests: an inner scope releases only the persists registered
  * inside it. Driver-side single-threaded use (the normal Spark driver
  * pattern); registration is thread-safe, scope bookkeeping is not.
  */
object CacheScope {
  private val pending = new java.util.concurrent.ConcurrentLinkedQueue[DataFrame]()

  /** Persist + eager-populate (count) + register for scoped release.
    * The eager count materializes the cache in ONE job before multiple
    * branches of a later job race to populate it concurrently.
    */
  def persist(df: DataFrame,
              level: StorageLevel = StorageLevel.MEMORY_AND_DISK,
              eager: Boolean = true): DataFrame = {
    val p = df.persist(level)
    pending.add(p)
    if (eager) p.count()
    p
  }

  /** Unpersist every registered frame not yet released. */
  def release(): Unit = {
    var df = pending.poll()
    while (df != null) {
      df.unpersist(blocking = false)
      df = pending.poll()
    }
  }

  /** Run `body`, then release every persist registered during it (plus any
    * earlier stragglers — release() drains the whole queue; nested scopes
    * simply release early, which is safe because entries are re-registered
    * nowhere). Materialize results INSIDE the scope.
    */
  def scoped[T](body: => T): T =
    try body finally release()
}
