package graft.core

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Small-file compaction (core/Maintenance): file-count math from
  * metadata, data preservation, and the zone-map property of sorted
  * compaction. */
class MaintenanceSpec extends SparkSuite {

  private def parquetFiles(p: String) =
    Option(new java.io.File(p).listFiles()).getOrElse(Array.empty)
      .filter(f => f.getName.endsWith(".parquet"))

  test("compaction collapses small files and preserves every row") {
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val tmp = Files.createTempDirectory("compact").toString
    li.repartition(64).write.parquet(s"$tmp/small")
    assert(parquetFiles(s"$tmp/small").length === 64)
    val target = Maintenance.dataBytes(spark, s"$tmp/small") / 4
    val n = Maintenance.compact(spark, s"$tmp/small", s"$tmp/big", target)
    val written = parquetFiles(s"$tmp/big")
    // ceil division can land at 4 or 5 (size estimate is codec-exact
    // input bytes, output re-encodes); the point is 64 → a handful
    assert(n >= 4 && n <= 6, s"expected ~4 files, planned $n")
    assert(written.length === n)
    assert(spark.read.parquet(s"$tmp/big").count() === li.count())
    // no file is pathologically small (even round-robin split)
    val sizes = written.map(_.length)
    assert(sizes.min > sizes.max / 4, s"uneven compaction: ${sizes.toSeq}")
  }

  test("sorted compaction yields disjoint per-file key intervals") {
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select("l_orderkey", "l_partkey")
    val tmp = Files.createTempDirectory("compactsort").toString
    li.repartition(32).write.parquet(s"$tmp/small")
    Maintenance.compact(spark, s"$tmp/small", s"$tmp/sorted",
      Maintenance.dataBytes(spark, s"$tmp/small") / 8, sortCol = Some("l_orderkey"))
    val ranges = spark.read.parquet(s"$tmp/sorted")
      .groupBy(input_file_name().as("f"))
      .agg(min("l_orderkey").as("lo"), max("l_orderkey").as("hi"))
      .collect().map(r => (r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    // every file's [lo, hi] interval ends before the next begins —
    // exactly the property parquet min/max pruning needs
    ranges.sliding(2).foreach {
      case Array((_, hi), (lo2, _)) => assert(hi <= lo2,
        s"overlapping file ranges: ${ranges.toSeq}")
      case _ =>
    }
  }

  test("dataBytes fails loudly on a missing path") {
    // a nonexistent table must not be sized as an empty one
    intercept[IllegalArgumentException] {
      Maintenance.dataBytes(spark, "/no/such/graft/table")
    }
  }
}
