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

  /** The fixture's `ts` physical type has varied across driver
    * regenerations — TIMESTAMP(NANOS) (which Spark's reader rejects
    * without the legacy INT64 conf) and plain `timestamp[us]` (which
    * Spark reads as TIMESTAMP_NTZ). Normalize BOTH to a microsecond
    * TimestampType column so every downstream query and oracle sees one
    * representation regardless of fixture vintage. Sessions run with
    * spark.sql.session.timeZone=UTC, so the NTZ→TZ cast relabels the
    * same instant (no wall-clock shift), matching DuckDB's naive
    * TIMESTAMP view of the identical parquet values. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.{LongType, TimestampNTZType}
    val raw = table(spark, dir, "events")
    raw.schema("ts").dataType match {
      // integer division: epoch-nanos (~1.7e18) overflows double precision
      case LongType => raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType => raw.withColumn("ts", col("ts").cast("timestamp"))
      case _ => raw
    }
  }
  def documents(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "embeddings")
}
