package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table helpers: the shuffle-elimination pattern for repeated
  * large-scale joins (SURVEY.md §4.2 / the 100 TB contract).
  *
  * Writing both sides of a hot join bucketed by the join key (same
  * bucket count) lets Spark plan a SortMergeJoin with NO Exchange on
  * either side — the shuffle is paid once at write time and amortized
  * over every subsequent join. At cluster scale this is the difference
  * between re-shuffling 100 TB per query and reading co-located buckets.
  * Verified in BucketingSpec: the joined plan contains no shuffle.
  */
object Bucketing {

  /** Persist `df` as a bucketed managed table (overwriting). */
  def writeBucketed(df: DataFrame, table: String, key: String,
      buckets: Int, sortCols: Seq[String] = Seq.empty): Unit = {
    val w = df.write.mode("overwrite").format("parquet")
      .bucketBy(buckets, key)
    val sorted = if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*) else w
    sorted.saveAsTable(table)
  }

  def readBucketed(spark: SparkSession, table: String): DataFrame =
    spark.table(table)

  /** Join two same-bucketed tables on their bucket key — plans without
    * Exchange when bucket counts align. */
  def cocatedJoin(spark: SparkSession, left: String, right: String,
      leftKey: String, rightKey: String): DataFrame = {
    import org.apache.spark.sql.functions.col
    readBucketed(spark, left)
      .join(readBucketed(spark, right), col(leftKey) === col(rightKey))
  }
}
