package graft.core

import org.apache.spark.sql.SparkSession

/** Table-maintenance operators: small-file compaction. [EXT] — the
  * reference writes one xlsx/SQLite artifact at a time and never faces
  * this, but any long-lived parquet table at cluster scale accretes
  * small files (per-task outputs, streaming micro-batches, frequent
  * upserts) until metadata handling and scan task scheduling — not I/O
  * — dominate query time. Compaction is the standing fix (Delta
  * OPTIMIZE, Iceberg rewrite_data_files).
  *
  * Sizing is decided from FILE METADATA (a driver-side directory
  * listing — no data pass): target file count = ceil(bytes/target).
  * The rewrite is one job; with a sort column it range-partitions so
  * every output file covers a disjoint key interval (zone-map-friendly
  * — min/max pruning works after compaction), without one it
  * round-robins for even sizes. `ZOrder.writeZOrdered` is the
  * two-dimensional sibling.
  */
object Maintenance {

  /** Bytes of data files under `path` (ignores _SUCCESS/checksums).
    * Resolved through Hadoop's FileSystem so hdfs://, s3a:// and other
    * cluster paths size correctly — a java.io.File walk would silently
    * return 0 for them and compact would plan one giant output file.
    * Fails on a missing path: "nonexistent" must not be confused with
    * "empty table". */
  def dataBytes(spark: SparkSession, path: String): Long = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    require(fs.exists(p), s"dataBytes: path does not exist: $path")
    val it = fs.listFiles(p, true)
    var total = 0L
    while (it.hasNext) {
      val f = it.next()
      val name = f.getPath.getName
      if (!name.startsWith("_") && !name.startsWith(".")) total += f.getLen
    }
    total
  }

  /** Rewrite the parquet table at `inPath` to `outPath` with files of
    * ~`targetFileBytes` (compressed size approximated by input size —
    * same codec in and out). Returns the file count written. */
  def compact(spark: SparkSession, inPath: String, outPath: String,
      targetFileBytes: Long, sortCol: Option[String] = None): Int = {
    require(targetFileBytes > 0, s"targetFileBytes must be > 0")
    val nFiles = math.max(1L,
      (dataBytes(spark, inPath) + targetFileBytes - 1) / targetFileBytes).toInt
    val df = spark.read.parquet(inPath)
    val out = sortCol match {
      case Some(c) =>
        import org.apache.spark.sql.functions.col
        df.repartitionByRange(nFiles, col(c)).sortWithinPartitions(col(c))
      case None => df.repartition(nFiles)
    }
    out.write.mode("overwrite").parquet(outPath)
    nFiles
  }
}
