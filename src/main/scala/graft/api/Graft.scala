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
  *    `writeParquet` / `writeJdbc` (any JDBC url whose driver is on the
  *    classpath; round-tripped against embedded Derby in GraftApiSpec,
  *    SURVEY.md §7.4)
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

/** Pipeline configuration — the reference UI's sidebar knobs plus the
  * engine's own modes, one immutable object:
  *
  *  - `nanBoxCompat` — replay pandas `astype(str)` null→"NAN" boxes
  *    (fianl2.py:162-163,176); see `processSheets`.
  *  - `decimalMoney` — SURVEY.md §1.4/§7.4: type money DECIMAL(18,2) at
  *    the source so every aggregate is exact cents. Off by default
  *    (reference parity is double + round(2)).
  *  - `vatRate` — the sidebar "VAT Rate (%)" input (ss1.png/ss2.png,
  *    default 5.00% → 0.05), used by the rate-check diagnostic: rows in
  *    Box A membership whose `|vat − net × rate|` exceeds
  *    `rateTolerance` (absolute, AED) are counted per sheet into
  *    `VatResult.warnings`. `rateCheck = false` silences it. */
final case class VatConfig(
    nanBoxCompat: Boolean = false,
    decimalMoney: Boolean = false,
    vatRate: Double = 0.05,
    rateTolerance: Double = 0.5,
    rateCheck: Boolean = true)

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

    /** Typed view of the conformed rows (SURVEY.md §1.4's
      * `Dataset[VatTransaction]`) for compile-time Scala pipelines. */
    def typed: org.apache.spark.sql.Dataset[graft.vat.VatTransaction] =
      Conform.typed(data)

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
      nanBoxCompat: Boolean = false): VatResult =
    processSheets(sheets, VatConfig(nanBoxCompat = nanBoxCompat))

  /** Full-config entry point (decimal money, VAT-rate diagnostic). */
  def processSheets(sheets: Seq[(String, String)],
      config: VatConfig): VatResult = {
    val results = sheets.map { case (path, name) =>
      try Right(name -> Conform.processCsvSheet(spark, path, name,
        config.nanBoxCompat, config.decimalMoney))
      catch { case e: Exception => Left(SheetFailure(name, String.valueOf(e.getMessage))) }
    }
    finish(results.collect { case Right(r) => r },
      results.collect { case Left(f) => f }, config)
  }

  /** Shared tail of every ingest front door: union, per-sheet
    * diagnostics in ONE grouped job, warning assembly. */
  private def finish(frames: Seq[(String, DataFrame)],
      failures: Seq[SheetFailure], config: VatConfig): VatResult = {
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
    // per-sheet diagnostics in ONE grouped job over the union (never a
    // job per sheet): null-box rows (they change boxes between compat
    // modes, so their existence is always surfaced) and the rate check —
    // Box-A-membership rows whose VAT is not net × vatRate within
    // tolerance (the sidebar rate input put to real use: it catches
    // mis-keyed or mis-rated invoices before they reach the return)
    val rateOutlier = col("box").contains("A") &&
      col("net_value").isNotNull && col("vat_value").isNotNull &&
      abs(col("vat_value").cast("double") -
        col("net_value").cast("double") * lit(config.vatRate)) >
        lit(config.rateTolerance)
    val diag = all.groupBy(col("source_sheet")).agg(
      sum(when(col("box_was_null"), 1L).otherwise(0L)).as("n_null_box"),
      sum(when(rateOutlier, 1L).otherwise(0L)).as("n_rate_outliers"))
      .orderBy(col("source_sheet"))
      .collect()
    val nullBoxWarnings = diag.filter(_.getLong(1) > 0).map { r =>
      val fate = if (config.nanBoxCompat)
        "counted into Box A as 'NAN' (astype-str compat)"
      else "in NO box (nulls stay null; enable nanBoxCompat to replay the reference)"
      s"Sheet '${r.getString(0)}': ${r.getLong(1)} rows with null Box — $fate."
    }
    val rateWarnings =
      if (!config.rateCheck) Array.empty[String]
      else diag.filter(_.getLong(2) > 0).map { r =>
        f"Sheet '${r.getString(0)}': ${r.getLong(2)} Box-A rows where " +
          f"|vat − net × ${config.vatRate * 100}%.2f%%| > ${config.rateTolerance}%.2f (rate check)."
      }
    VatResult(all, failures, warnings ++ nullBoxWarnings ++ rateWarnings)
  }

  /** The reference's actual front door (fianl2.py:212-221): one xlsx
    * workbook in, every sheet enumerated and processed. The xlsx parts
    * are decoded driver-side (`sources.Xlsx` — workbooks are interactive
    * uploads, not cluster data) into CSV files that the distributed
    * sheet pipeline then ingests. */
  def processWorkbook(xlsxPath: String, nanBoxCompat: Boolean = false): VatResult =
    processWorkbook(xlsxPath, VatConfig(nanBoxCompat = nanBoxCompat))

  def processWorkbook(xlsxPath: String, config: VatConfig): VatResult = {
    val tmp = java.nio.file.Files.createTempDirectory("graft_xlsx").toFile
    // the extracted CSVs back the returned (lazy) DataFrames, so they
    // must outlive this call; reclaim them at JVM exit
    tmp.deleteOnExit()
    val sheets = graft.sources.Xlsx.toCsv(xlsxPath, tmp.getAbsolutePath)
    sheets.foreach { case (p, _) => new java.io.File(p).deleteOnExit() }
    processSheets(sheets, config)
  }

  /** Bulk-backfill front door: MANY workbooks decoded on EXECUTORS.
    * `binaryFile` ships each workbook's bytes to a partition, the same
    * StAX codec (`sources.Xlsx.readAllSheets`) parses there, and only
    * the ≤30-row header samples and per-sheet metadata ever reach the
    * driver — a backfill of thousands of workbooks parallelizes across
    * the cluster instead of serializing through driver-side decode.
    * The interactive path (`processWorkbook`) stays for single uploads
    * (mirrors the reference's upload flow, fianl2.py:212). Sheet labels
    * are `<workbook basename>/<sheet name>` so same-named sheets across
    * workbooks stay distinct. Decoded cells are persisted once (every
    * per-sheet conform filters the cache, not the zip codec) and
    * lazily back the returned frames — release is the caller's
    * contract (`spark.catalog.clearCache()`), as with every standing
    * intermediate in this engine. */
  def processWorkbooks(pathOrGlob: String,
      config: VatConfig = VatConfig()): VatResult = {
    import spark.implicits._
    val decoded = spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.xlsx")
      .load(pathOrGlob)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (path, bytes) =>
        val base = path.substring(path.lastIndexOf('/') + 1)
          .replaceAll("(?i)\\.xlsx$", "")
        graft.sources.Xlsx.readAllSheets(bytes).flatMap { case (sheet, rows) =>
          rows.zipWithIndex.map { case (cells, i) =>
            // "" ↔ null: the driver path's CSV round trip reads empty
            // fields back as SQL nulls; mirror it so both paths
            // conform identically
            (s"$base/$sheet", i.toLong,
              cells.map(c => if (c.isEmpty) null else c))
          }
        }
      }
      .toDF("sheet_label", "idx", "cells")
      .persist()
    val labels = decoded.select("sheet_label").distinct()
      .orderBy("sheet_label").collect().map(_.getString(0)).toSeq
    val results = labels.map { label =>
      try Right(label -> Conform.processCellsSheet(
        decoded.filter(col("sheet_label") === label).drop("sheet_label"),
        label, config.nanBoxCompat, config.decimalMoney))
      catch { case e: Exception =>
        Left(SheetFailure(label, String.valueOf(e.getMessage))) }
    }
    finish(results.collect { case Right(r) => r },
      results.collect { case Left(f) => f }, config)
  }

  /** S3 — sheet enumeration: one CSV per sheet in a directory, sheet
    * name = file basename (the reference's `xls.sheet_names` analogue,
    * fianl2.py:212-213). */
  def processDirectory(dir: String, nanBoxCompat: Boolean = false): VatResult =
    processDirectory(dir, VatConfig(nanBoxCompat = nanBoxCompat))

  def processDirectory(dir: String, config: VatConfig): VatResult = {
    val files = Option(new java.io.File(dir).listFiles())
      .getOrElse(Array.empty)
      .filter(_.getName.toLowerCase.endsWith(".csv"))
      .sortBy(_.getName)
    processSheets(files.toSeq.map(f =>
      f.getAbsolutePath -> f.getName.replaceAll("\\.csv$", "")), config)
  }
}
