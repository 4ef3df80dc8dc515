package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/**
 * Eagerly materialize a multi-use intermediate: pin it in the block
 * store (`MEMORY_AND_DISK`) and force computation NOW with a count.
 *
 * Operators use this for subplans referenced by several downstream
 * subtrees (shingle sets feeding a prefix join and both sides of a
 * verification rejoin, MinHash signatures feeding banding plus two
 * rejoins, …). A *lazy* `localCheckpoint(false)` expresses the same
 * intent but leaves the computation to whichever consumer evaluates
 * first — measured under driver load, the expensive stage then re-ran
 * once per consumer (3× the steady-state time) when the plan was
 * re-derived before the blocks landed. An owned `persist` + explicit
 * count guarantees exactly one computation regardless of evaluation
 * order, and the `CacheManager` entry means every later reference —
 * even a re-analyzed copy of the plan — resolves to the cached
 * relation.
 *
 * Sessions that run many independent queries (bench, verify) clear
 * the cache between queries; within one query the entry is bounded by
 * the intermediate's size and spills to disk, never recomputes.
 */
object materialize {
  def apply(df: DataFrame): DataFrame = {
    val pinned = df.persist(StorageLevel.MEMORY_AND_DISK)
    pinned.count()
    pinned
  }
}
