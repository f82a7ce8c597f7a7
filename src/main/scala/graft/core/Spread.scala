package graft.core

import org.apache.spark.sql.{Column, DataFrame}

/** Explicit-width spread for CPU-heavy stages behind small exchanges.
  *
  * AQE coalesces post-shuffle partitions by BYTES
  * (`advisoryPartitionSizeInBytes`), which is the right call when stage
  * cost tracks bytes — but some stages are dominated by per-row CPU
  * that the byte estimate never sees: a `row_number` window sorting a
  * million-row inventory that compresses to under 1 MB, or exact
  * `array_intersect` verification over full shingle sets attached to a
  * few thousand candidate id pairs. Coalescing such an exchange to one
  * partition serializes the whole stage on one core (measured: the
  * dedup_containment anchor window ran 1.5 s single-task on a 32-core
  * session). This mirrors the volume-sized build-session rule in
  * `rel.Graph.buildSession` — there the byte-blindness starved
  * execution MEMORY; here it starves parallelism.
  *
  * The fix is a hash repartition with an EXPLICIT partition count
  * (REPARTITION_BY_NUM), which AQE never coalesces, keyed by the
  * downstream partition/join keys so the exchange doubles as that
  * operation's required distribution. At deployment scale the spread
  * exchange replaces the one EnsureRequirements would have inserted
  * anyway (same keys), so no shuffle is added — the only delta is that
  * its width can no longer collapse below the session width.
  */
object Spread {
  /** Repartition to the session shuffle width on `keys`. */
  def byKeys(df: DataFrame, keys: Column*): DataFrame =
    df.repartition(
      df.sparkSession.sessionState.conf.numShufflePartitions, keys: _*)
}
