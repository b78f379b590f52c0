package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** persist() exactly once per canonical plan. Operators that cache an
  * intermediate internally (gram streams, model counts, hot-key sets)
  * get re-built plan-for-plan when a caller runs the same query twice in
  * one session — a benchmark's timed iterations, a pipeline reusing an
  * operator — and a bare `.persist()` then hits CacheManager's
  * canonicalized-plan match and warns `Asked to cache already cached
  * data` on every rebuild, burying real warnings. `Dataset.storageLevel`
  * performs the same canonical lookup, so guarding on it is exact. */
object Caching {
  /** Cache `df` unless an equivalent plan already is, then eagerly
    * materialise the cache (construction-time job); returns `df`. */
  def ensureCached(df: DataFrame): DataFrame = {
    if (df.storageLevel == StorageLevel.NONE) { df.persist(); df.count() }
    df
  }

  /** Lazy variant: mark for caching without materialising. */
  def ensureCachedLazy(df: DataFrame): DataFrame = {
    if (df.storageLevel == StorageLevel.NONE) df.persist()
    df
  }
}
