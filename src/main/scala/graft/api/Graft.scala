package graft.api

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.vat.{Conform, Summary}

/** Front door of the engine: everything the reference app does
  * (fianl2.py:198-259), as a library a reference user can switch to.
  *
  * Reference flow → engine call:
  *  - upload workbook, enumerate sheets (fianl2.py:212-213) →
  *    `VatPipeline.processSheets` over (csvPath, sheetName) pairs
  *  - per-sheet clean/conform (fianl2.py:130-164) → `Conform.processCsvSheet`
  *  - error-tolerant ingest: failed sheets skipped, error surfaced
  *    (fianl2.py:216-221) → `VatResult.failures`
  *  - period mapping report (fianl2.py:230-233) → `VatResult.mapping`
  *  - VAT summary (fianl2.py:167-195) → `VatResult.summary`
  *  - xlsx download / sqlite sink (fianl2.py:241-255) → `writeCsv` /
  *    `writeParquet` / `writeJdbc` (xlsx and sqlite drivers are
  *    environment concerns; any JDBC url works, SURVEY.md §7.4)
  */
object Graft {

  /** Opinionated session builder: AQE on, UTC, shuffle parallelism sized
    * to the cluster (never the 200 default). */
  def session(appName: String = "graft",
      master: Option[String] = None,
      shufflePartitions: Option[Int] = None): SparkSession = {
    val b = SparkSession.builder()
      .appName(appName)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
    master.foreach(b.master)
    val s = b.getOrCreate()
    val parts = shufflePartitions.getOrElse(s.sparkContext.defaultParallelism)
    s.conf.set("spark.sql.shuffle.partitions", parts.toString)
    s
  }

  /** F12 — the reference's timestamped download filename
    * (`vat_summary_{datetime.now():%Y%m%d_%H%M%S}.xlsx`, fianl2.py:248).
    * The clock is injectable so callers (and tests) can pin the instant;
    * the default is wall-clock now, matching the reference. */
  def timestampedName(prefix: String = "vat_summary", ext: String = "xlsx",
      clock: java.time.Clock = java.time.Clock.systemDefaultZone()): String = {
    val fmt = java.time.format.DateTimeFormatter.ofPattern("yyyyMMdd_HHmmss")
    s"${prefix}_${java.time.LocalDateTime.now(clock).format(fmt)}.$ext"
  }

  /** Register every fixture table of a scale-factor directory as a temp
    * view, opening the full `spark.sql` surface over the corpus (the
    * engine's SQL front door; pairs with GraftExtensions for the native
    * functions). */
  def openCatalog(spark: SparkSession, dir: String): Unit = {
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "documents", "embeddings").foreach { t =>
      graft.core.Tables.table(spark, dir, t).createOrReplaceTempView(t)
    }
    graft.core.Tables.events(spark, dir).createOrReplaceTempView("events")
  }
}

object VatPipeline {

  /** One failed sheet: name + error, mirroring the reference's per-sheet
    * try/except report (fianl2.py:216-221). */
  final case class SheetFailure(sheet: String, error: String)

  final case class VatResult(data: DataFrame, failures: Seq[SheetFailure],
      warnings: Seq[String] = Seq.empty) {

    /** Sheet → detected period report (fianl2.py:230-233). */
    def mapping: DataFrame = data
      .select(col("source_sheet"), col("month"), col("year").cast("string").as("year"))
      .dropDuplicates("source_sheet", "month", "year")
      .orderBy(col("source_sheet"))

    /** The reference's whole analytical output (fianl2.py:167-195). */
    def summary: DataFrame = Summary.vatSummary(data)

    def writeParquet(path: String): Unit =
      summary.coalesce(1).write.mode("overwrite").parquet(path)

    def writeCsv(path: String): Unit =
      summary.coalesce(1).write.mode("overwrite")
        .option("header", "true").csv(path)

    def writeJdbc(url: String, table: String,
        props: java.util.Properties = new java.util.Properties): Unit =
      summary.write.mode("overwrite").jdbc(url, table, props)

    /** The reference's download sink (fianl2.py:241-248): the summary as
      * a one-sheet xlsx. Driver-side by design — the summary is 4 rows
      * per period (bounded), never cluster-scale data. */
    def writeXlsx(path: String, sheet: String = "VAT Summary"): Unit = {
      val df = summary.select("period", "fta_box", "description",
        "net_value", "vat_value", "net_vat_payable")
      val header = df.columns.toSeq
      val rows = df.collect().toSeq
        .map(r => (0 until r.length).map(i =>
          // blanks for SQL nulls, like the reference sink — not "null"
          if (r.isNullAt(i)) "" else String.valueOf(r.get(i))))
      graft.sources.Xlsx.write(path, Seq(sheet -> (header +: rows)))
    }

    /** The download-button flow verbatim: write into `dir` under the
      * reference's timestamped name; returns the path written. */
    def writeXlsxTimestamped(dir: String,
        clock: java.time.Clock = java.time.Clock.systemDefaultZone()): String = {
      val p = new java.io.File(dir, Graft.timestampedName(clock = clock)).getAbsolutePath
      writeXlsx(p)
      p
    }
  }
}

final class VatPipeline(spark: SparkSession) {
  import VatPipeline.{SheetFailure, VatResult}

  /** Ingest many sheets (one CSV file per sheet, junk preamble + synonym
    * headers tolerated), conform to the canonical schema, union by name.
    * Sheets that fail to parse are skipped and reported, like the
    * reference.
    *
    * `nanBoxCompat = true` replays the reference's pandas `astype(str)`
    * quirk: null Box cells become the literal "NAN", which the contains
    * matching counts into Box A with box letter "N" (fianl2.py:162-163,
    * 176). Default `false` keeps nulls null, so null-box rows belong to
    * NO box — different totals on dirty data. Because the two modes
    * silently disagree, `warnings` always reports the null-box row count
    * per sheet whenever it is non-zero, in either mode. */
  def processSheets(sheets: Seq[(String, String)],
      nanBoxCompat: Boolean = false): VatResult = {
    val results = sheets.map { case (path, name) =>
      try Right(name -> Conform.processCsvSheet(spark, path, name, nanBoxCompat))
      catch { case e: Exception => Left(SheetFailure(name, String.valueOf(e.getMessage))) }
    }
    val frames = results.collect { case Right(r) => r }
    val failures = results.collect { case Left(f) => f }
    require(frames.nonEmpty, "No valid sheets processed")
    // A5 — the reference's "Multiple years detected" warning
    // (fianl2.py:124-125), surfaced per sheet
    val warnings = frames.flatMap { case (name, df) =>
      val counts = Conform.yearCounts(df)
      if (counts.size > 1)
        Some(s"Sheet '$name': multiple years detected: " +
          counts.toSeq.sorted.map { case (y, n) => s"$y→$n" }.mkString(", ") +
          " — using most frequent year.")
      else None
    }
    val all = frames.map(_._2).reduce(_.unionByName(_, allowMissingColumns = true))
    // null-box diagnostic: one grouped job over the union, not a count
    // per sheet; these rows change boxes between compat modes, so their
    // existence is always surfaced
    val nullBoxWarnings = all.filter(col("box_was_null"))
      .groupBy(col("source_sheet")).count()
      .orderBy(col("source_sheet"))
      .collect().map { r =>
        val fate = if (nanBoxCompat)
          "counted into Box A as 'NAN' (astype-str compat)"
        else "in NO box (nulls stay null; enable nanBoxCompat to replay the reference)"
        s"Sheet '${r.getString(0)}': ${r.getLong(1)} rows with null Box — $fate."
      }
    VatResult(all, failures, warnings ++ nullBoxWarnings)
  }

  /** The reference's actual front door (fianl2.py:212-221): one xlsx
    * workbook in, every sheet enumerated and processed. The xlsx parts
    * are decoded driver-side (`sources.Xlsx` — workbooks are interactive
    * uploads, not cluster data) into CSV files that the distributed
    * sheet pipeline then ingests. */
  def processWorkbook(xlsxPath: String, nanBoxCompat: Boolean = false): VatResult = {
    val tmp = java.nio.file.Files.createTempDirectory("graft_xlsx").toFile
    // the extracted CSVs back the returned (lazy) DataFrames, so they
    // must outlive this call; reclaim them at JVM exit
    tmp.deleteOnExit()
    val sheets = graft.sources.Xlsx.toCsv(xlsxPath, tmp.getAbsolutePath)
    sheets.foreach { case (p, _) => new java.io.File(p).deleteOnExit() }
    processSheets(sheets, nanBoxCompat)
  }

  /** S3 — sheet enumeration: one CSV per sheet in a directory, sheet
    * name = file basename (the reference's `xls.sheet_names` analogue,
    * fianl2.py:212-213). */
  def processDirectory(dir: String, nanBoxCompat: Boolean = false): VatResult = {
    val files = Option(new java.io.File(dir).listFiles())
      .getOrElse(Array.empty)
      .filter(_.getName.toLowerCase.endsWith(".csv"))
      .sortBy(_.getName)
    processSheets(files.toSeq.map(f =>
      f.getAbsolutePath -> f.getName.replaceAll("\\.csv$", "")), nanBoxCompat)
  }
}
