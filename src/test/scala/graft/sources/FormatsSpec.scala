package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSuite

/** Source-format coverage beyond parquet/CSV/xlsx (SURVEY.md §2.1): the
  * engine reads whatever Spark's datasource layer reads — shown here for
  * ORC (the other columnar format in core Spark, with predicate
  * pushdown) and JSON lines (schema'd, with the PERMISSIVE
  * corrupt-record contract for error-tolerant ingest, S4). */
class FormatsSpec extends SparkSuite {

  private def tmp(name: String): String =
    new java.io.File(Files.createTempDirectory("fmt").toFile, name).getAbsolutePath

  test("ORC round-trip is lossless and pushes filters to the scan") {
    val src = graft.core.Tables.lineitem(spark, sfDir)
      .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
    val path = tmp("lineitem_orc")
    src.write.mode("overwrite").orc(path)
    val back = spark.read.orc(path)
    assert(back.orderBy("l_orderkey", "l_linenumber").collect().toSeq ==
      src.orderBy("l_orderkey", "l_linenumber").collect().toSeq)
    val filtered = back.filter(col("l_quantity") > 45)
    val p = filtered.queryExecution.executedPlan.toString
    assert(p.contains("PushedFilters") && p.contains("GreaterThan(l_quantity"),
      s"ORC scan must receive the pushed predicate:\n$p")
    assert(filtered.count() ==
      src.filter(col("l_quantity") > 45).count())
  }

  test("parquet schema evolution: mergeSchema unions columns across file " +
      "generations; missing columns read as null") {
    import spark.implicits._
    // generation 1: (id, v1); generation 2 adds a column — the standard
    // additive-evolution story a long-lived 100 TB table accumulates
    val path = tmp("evolving")
    Seq((1L, "a"), (2L, "b")).toDF("id", "v1")
      .write.mode("overwrite").parquet(s"$path/gen=1")
    Seq((3L, "c", 30.0), (4L, "d", 40.0)).toDF("id", "v1", "v2")
      .write.mode("overwrite").parquet(s"$path/gen=2")
    val merged = spark.read.option("mergeSchema", "true").parquet(path)
    assert(merged.columns.toSet == Set("id", "v1", "v2", "gen"))
    val rows = merged.orderBy("id").collect()
    assert(rows.length == 4)
    // gen-1 rows surface the new column as NULL, not an error
    assert(rows(0).isNullAt(rows(0).fieldIndex("v2")))
    assert(rows(2).getDouble(rows(2).fieldIndex("v2")) == 30.0)
    // and filters on the evolved column still push down + prune gen-1
    val f = merged.filter(col("v2") > 35.0)
    assert(f.count() == 1 && f.collect()(0).getAs[Long]("id") == 4L)
  }

  test("JSON lines: schema'd read round-trips; PERMISSIVE captures corrupt rows") {
    val src = graft.core.Tables.events(spark, sfDir)
      .select("event_id", "user_id", "event_type", "value")
    val path = tmp("events_json")
    src.write.mode("overwrite").json(path)
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("user_id", LongType),
      StructField("event_type", StringType), StructField("value", DoubleType)))
    val back = spark.read.schema(schema).json(path)
    assert(back.orderBy("event_id").collect().toSeq ==
      src.orderBy("event_id").collect().toSeq)

    // error-tolerant ingest (S4 at row granularity): malformed lines land
    // in the corrupt-record column instead of killing the job
    val dirty = tmp("dirty.json")
    val w = new java.io.PrintWriter(dirty, "UTF-8")
    w.println("""{"event_id": 1, "user_id": 10, "event_type": "view", "value": 1.5}""")
    w.println("""{"event_id": broken not json""")
    w.println("""{"event_id": 2, "user_id": 11, "event_type": "click", "value": 2.5}""")
    w.close()
    val tolerant = spark.read
      .schema(schema.add("_corrupt_record", StringType))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(dirty)
      .cache() // corrupt-record column requires a materialized referenced plan
    assert(tolerant.count() == 3)
    assert(tolerant.filter(col("_corrupt_record").isNotNull).count() == 1)
    assert(tolerant.filter(col("_corrupt_record").isNull)
      .select(sum(col("value"))).collect()(0).getDouble(0) == 4.0)
    tolerant.unpersist()
  }
}
