package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for joins (SURVEY.md §4.2; AQE's skew-join split
  * covers sort-merge joins at runtime, but salting is the explicit tool
  * when one build-side key dominates or AQE can't see the skew).
  *
  * `saltedJoin` spreads each hot key of the LEFT (large, skewed) side
  * over `factor` sub-keys deterministically (hash of the whole row, no
  * RNG → plan is reproducible), and replicates the RIGHT side once per
  * salt. Join output is identical to the unsalted join (asserted in
  * SkewSpec); the shuffle partition holding the hot key shrinks by
  * `factor`.
  */
object Skew {

  /** Deterministic salt in [0, factor): hash of the row's columns. */
  private def salt(df: DataFrame, factor: Int): Column =
    pmod(hash(df.columns.map(col).toSeq: _*), lit(factor))

  def saltedJoin(large: DataFrame, small: DataFrame, largeKey: String,
      smallKey: String, factor: Int, joinType: String = "inner"): DataFrame = {
    val l = large.withColumn("__salt", salt(large, factor))
    val s = small.withColumn("__salt",
      explode(sequence(lit(0), lit(factor - 1))))
    l.join(s,
      l(largeKey) === s(smallKey) && l("__salt") === s("__salt"),
      joinType)
      .drop("__salt")
  }
}
