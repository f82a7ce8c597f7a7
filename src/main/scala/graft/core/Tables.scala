package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the star-schema corpus (TESTDATA.md / FIXTURES.md §2).
  *
  * Each table is a single parquet file under a scale-factor directory. The
  * API is path-based so that at cluster scale the same call reads a
  * partitioned directory tree instead of one file — callers never change.
  * Reads go through Spark's vectorized parquet reader; column pruning and
  * predicate pushdown are supplied by Catalyst as long as callers keep
  * plans declarative (verified in `PlanSpec`).
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(spark: SparkSession, dir: String): DataFrame    = table(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame    = table(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame  = table(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame  = table(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame      = table(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame    = table(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame  = table(spark, dir, "lineitem")

  /** `events.parquet` stores TIMESTAMP(NANOS), which Spark's parquet
    * reader rejects outright. Read nanos as raw INT64 (legacy conf) and
    * convert to a microsecond TimestampType column — the fixture's values
    * are microsecond-precision (sub-micro digits are zero), so the
    * truncating division is lossless and matches DuckDB's TIMESTAMP_NS →
    * TIMESTAMP cast in the oracles. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    import org.apache.spark.sql.functions._
    // integer division: epoch-nanos (~1.7e18) overflows double precision
    table(spark, dir, "events")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }
  def documents(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "embeddings")
}
