package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{QueryDef, Tables}

/** Multimodal-column plumbing for training-data pipelines (SURVEY.md
  * §2.11): media as opaque BINARY columns with typed metadata, processed
  * partition-wise.
  *
  * The Spark-side shape is the real deliverable here: a stable schema
  * (`content BINARY` + metadata struct), batch-friendly partition-wise
  * processing (`mapPartitions` over a typed Dataset — one decoder
  * instantiation per partition, NOT per row, which is what makes
  * per-executor codec/model setup amortize at 100 TB), and deterministic
  * output ordering.
  *
  * IMAGE payloads are decoded for real via `javax.imageio` (JDK-bundled
  * PNG/BMP/GIF readers — no external codec needed): width, height,
  * channel means and a pixel checksum become the leading feature
  * components. Audio/video decode remains STUBBED with a deterministic
  * fake (`decodeStub` — this container ships no media codecs); the
  * stub is also the fallback for bytes no image reader accepts, so the
  * operator never throws on dirty corpora — exactly the tolerance a
  * 100 TB ingest needs.
  */
object Multimodal {

  /** A media row: opaque bytes + metadata the pipeline can trust. */
  case class MediaRow(doc_id: Long, media_type: String, n_bytes: Int,
      content: Array[Byte])

  /** Extracted features: fixed-width vector + provenance. */
  case class MediaFeatures(doc_id: Long, media_type: String, n_bytes: Int,
      feature: Array[Float])

  /** Synthesize a deterministic "media" column from the documents table:
    * text bytes stand in for an encoded payload. Real pipelines read
    * binaryFile sources; the downstream plumbing is identical. */
  def mediaTable(spark: SparkSession, dir: String): Dataset[MediaRow] = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        when(col("doc_id") % 3 === 0, "image")
          .when(col("doc_id") % 3 === 1, "audio")
          .otherwise("video").as("media_type"),
        encode(col("text"), "UTF-8").as("content"))
      .withColumn("n_bytes", length(col("content")).cast("int"))
      .select(col("doc_id"), col("media_type"), col("n_bytes"), col("content"))
      .as[MediaRow]
  }

  /** STUB decoder: a real implementation would decode `content` with an
    * image/audio codec. The fake is deterministic in the bytes (rolling
    * polynomial over the payload) so tests can assert exact values. */
  private[ext] def decodeStub(bytes: Array[Byte], dims: Int): Array[Float] = {
    val out = new Array[Float](dims)
    var h = 1125899906842597L // FNV-ish rolling seed
    var i = 0
    while (i < bytes.length) {
      h = h * 31 + bytes(i)
      out(i % dims) += ((h >>> 20) & 0xFFF) / 4096.0f
      i += 1
    }
    out
  }

  /** REAL image decode (JDK `javax.imageio`): PNG/BMP/GIF bytes →
    * fixed-layout features
    *
    *   f0 = width, f1 = height,
    *   f2 = 24-bit rolling pixel checksum (raster-order, deterministic),
    *   f3/f4/f5 = mean R/G/B, f6 = BT.601 luminance of the means,
    *   f7 = 1.0 marker ("decoded for real", vs the stub's unmarked tail).
    *
    * Returns None for bytes no registered reader accepts (truncated
    * file, non-image payload) — the caller falls back to the stub
    * instead of failing the task. Decoding reads the payload once; the
    * per-pixel loop is the honest cost of a checksum feature. */
  private[ext] def decodeImage(bytes: Array[Byte], dims: Int): Option[Array[Float]] = {
    require(dims >= 8, s"image feature layout needs 8 slots, got $dims")
    try {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      if (img == null) None
      else {
        val w = img.getWidth
        val h = img.getHeight
        var sumR = 0L; var sumG = 0L; var sumB = 0L; var crc = 1L
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val p = img.getRGB(x, y)
            sumR += (p >> 16) & 0xFF; sumG += (p >> 8) & 0xFF; sumB += p & 0xFF
            crc = crc * 31 + (p & 0xFFFFFF)
            x += 1
          }
          y += 1
        }
        val n = w.toLong * h
        val out = new Array[Float](dims)
        out(0) = w.toFloat
        out(1) = h.toFloat
        out(2) = ((crc >>> 16) & 0xFFFFFF).toFloat
        out(3) = sumR.toFloat / n
        out(4) = sumG.toFloat / n
        out(5) = sumB.toFloat / n
        out(6) = 0.299f * out(3) + 0.587f * out(4) + 0.114f * out(5)
        out(7) = 1.0f
        Some(out)
      }
    } catch { case _: Exception => None }
  }

  /** Feature extraction: one decoder per PARTITION (the expensive-setup
    * pattern — codec/model handles created once in the mapPartitions
    * closure). Images go through the real `javax.imageio` decode with
    * stub fallback for undecodable bytes; audio/video stay stubbed. */
  def extractFeatures(media: Dataset[MediaRow], dims: Int = 8): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // per-partition setup happens here (codec init, model load, …)
      rows.map { r =>
        val feats =
          if (r.media_type == "image")
            decodeImage(r.content, dims).getOrElse(decodeStub(r.content, dims))
          else decodeStub(r.content, dims)
        MediaFeatures(r.doc_id, r.media_type, r.n_bytes, feats)
      }
    }
  }

  /** Deterministic frame/sample selection: pick every `stride`-th byte
    * offset — the plumbing twin of video frame-sampling (offset
    * arithmetic + slice on the binary column, no decode needed). */
  def sampleOffsets(media: Dataset[MediaRow], stride: Int): DataFrame =
    media.toDF().select(col("doc_id"), col("media_type"),
      sequence(lit(0), col("n_bytes") - 1, lit(stride)).as("offsets"))

  /** Deterministic synthetic image corpus: every image-typed document
    * gets a REAL PNG (JDK imageio encoder) of closed-form geometry and
    * solid color — w = 2 + id%7, h = 2 + id%5, rgb = (id%256, 7id%256,
    * 13id%256). Encoding happens partition-wise like any decode would;
    * because the color is solid and PNG is lossless, the decoded
    * width/height/channel means are EXACTLY the closed form (integer
    * sums ÷ exact counts stay exact in float), so a SQL oracle can
    * state what the real decoder must see without being able to parse
    * a single PNG byte itself. */
  def syntheticImages(spark: SparkSession, dir: String): Dataset[MediaRow] = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .filter(col("doc_id") % 3 === 0)
      .select(col("doc_id")).as[Long]
      .mapPartitions { ids =>
        ids.map { id =>
          val w = (2 + id % 7).toInt
          val h = (2 + id % 5).toInt
          val rgb = ((id % 256).toInt << 16) |
            ((id * 7 % 256).toInt << 8) | (id * 13 % 256).toInt
          val img = new java.awt.image.BufferedImage(
            w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) { img.setRGB(x, y, rgb); x += 1 }
            y += 1
          }
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(img, "png", bos)
          val bytes = bos.toByteArray
          MediaRow(id, "image", bytes.length, bytes)
        }
      }
  }

  /** The declared `multimodal_features` surface: synthesize → REAL
    * `javax.imageio` decode → per-image features, checked against the
    * closed form. `decoded` pins that the real decoder ran (the stub
    * fallback has no f7 = 1 marker); the pixel checksum (f2) is the one
    * feature with no portable closed form and stays spec-pinned. */
  private def imageDecodeQuery(spark: SparkSession, dir: String): DataFrame =
    extractFeatures(syntheticImages(spark, dir)).toDF()
      .select(col("doc_id"),
        element_at(col("feature"), 1).cast("double").as("width"),
        element_at(col("feature"), 2).cast("double").as("height"),
        element_at(col("feature"), 4).cast("double").as("mean_r"),
        element_at(col("feature"), 5).cast("double").as("mean_g"),
        element_at(col("feature"), 6).cast("double").as("mean_b"),
        (element_at(col("feature"), 8) === 1.0f).as("decoded"))
      .orderBy(col("doc_id"))

  private val imageDecodeSql: String =
    """SELECT doc_id,
      |  CAST(2 + doc_id % 7 AS DOUBLE) AS width,
      |  CAST(2 + doc_id % 5 AS DOUBLE) AS height,
      |  CAST(doc_id % 256 AS DOUBLE) AS mean_r,
      |  CAST(doc_id * 7 % 256 AS DOUBLE) AS mean_g,
      |  CAST(doc_id * 13 % 256 AS DOUBLE) AS mean_b,
      |  TRUE AS decoded
      |FROM documents WHERE doc_id % 3 = 0
      |ORDER BY doc_id""".stripMargin

  /** Per-type feature statistics over the mixed-type media table (the
    * stub decode path observable end-to-end; `multimodal_metadata` and
    * the spec suite carry its checks). */
  def featureStats(spark: SparkSession, dir: String): DataFrame = {
    val feats = extractFeatures(mediaTable(spark, dir)).toDF()
    feats.select(col("doc_id"), col("media_type"), col("n_bytes"),
      aggregate(col("feature"), lit(0.0), (acc, x) => acc + x.cast("double"))
        .as("feat_sum"))
      .groupBy(col("media_type"))
      .agg(count(lit(1)).as("n_media"),
        sum(col("n_bytes")).as("total_bytes"),
        min(col("feat_sum")).as("min_feat_sum"),
        max(col("feat_sum")).as("max_feat_sum"))
      .orderBy(col("media_type"))
  }

  /** Oracle-checked metadata path: typed media rows reduce to
    * engine-agnostic facts — byte length and content digest of the
    * BINARY column (md5 over the raw bytes is identical in any engine;
    * byte length ≠ char length for multi-byte text, which is exactly
    * what strlen/octet semantics pin down). */
  private def mediaMetadata(spark: SparkSession, dir: String): DataFrame =
    mediaTable(spark, dir).toDF()
      .select(col("doc_id"), col("media_type"), col("n_bytes"),
        md5(col("content")).as("content_md5"))
      .orderBy(col("doc_id"))

  private val mediaMetadataSql: String =
    """SELECT doc_id,
      |  CASE WHEN doc_id % 3 = 0 THEN 'image'
      |       WHEN doc_id % 3 = 1 THEN 'audio'
      |       ELSE 'video' END AS media_type,
      |  CAST(strlen(text) AS INT) AS n_bytes,
      |  md5(text) AS content_md5
      |FROM documents ORDER BY doc_id""".stripMargin

  /** Frame/sample-offset plumbing, oracle-checked: deterministic stride
    * arithmetic over the payload length — the video-frame-sampling twin
    * that needs no codec. Flattened to one row per sampled offset: the
    * compare harness hashes scalar cells, not arrays. */
  private def mediaOffsets(spark: SparkSession, dir: String): DataFrame =
    sampleOffsets(mediaTable(spark, dir), stride = 512)
      .select(col("doc_id"), col("media_type"), explode(col("offsets")).as("o"))
      .select(col("doc_id"), col("media_type"),
        col("o").cast("long").as("byte_offset"))
      .orderBy(col("doc_id"), col("byte_offset"))

  private val mediaOffsetsSql: String =
    """SELECT doc_id,
      |  CASE WHEN doc_id % 3 = 0 THEN 'image'
      |       WHEN doc_id % 3 = 1 THEN 'audio'
      |       ELSE 'video' END AS media_type,
      |  unnest(range(0, CAST(strlen(text) AS BIGINT), 512)) AS byte_offset
      |FROM documents ORDER BY doc_id, byte_offset""".stripMargin

  private val q: Seq[(String, QueryDef)] = Seq(
    // real encode→decode round trip behind a closed-form oracle; the
    // mixed-type stub statistics remain available via `featureStats`
    "multimodal_features" -> QueryDef(
      (s: SparkSession, d: String) => imageDecodeQuery(s, d),
      Some(imageDecodeSql)),
    "multimodal_metadata" -> QueryDef(
      (s: SparkSession, d: String) => mediaMetadata(s, d), mediaMetadataSql),
    "multimodal_offsets" -> QueryDef(
      (s: SparkSession, d: String) => mediaOffsets(s, d), mediaOffsetsSql)
  )

  def queries: Seq[(String, QueryDef)] = q
}
