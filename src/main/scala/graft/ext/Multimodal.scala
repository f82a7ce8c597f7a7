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
  * output ordering. The actual byte→pixels/samples decode is STUBBED
  * with a deterministic fake (this container ships no image/audio
  * codecs); `decodeStub` is the single seam where a real codec drops in.
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

  /** Feature extraction: one decoder per PARTITION (the expensive-setup
    * pattern — swap `decodeStub` for a codec/model handle created once
    * in the mapPartitions closure). */
  def extractFeatures(media: Dataset[MediaRow], dims: Int = 8): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // per-partition setup happens here (codec init, model load, …)
      rows.map(r => MediaFeatures(r.doc_id, r.media_type, r.n_bytes,
        decodeStub(r.content, dims)))
    }
  }

  /** Deterministic frame/sample selection: pick every `stride`-th byte
    * offset — the plumbing twin of video frame-sampling (offset
    * arithmetic + slice on the binary column, no decode needed). */
  def sampleOffsets(media: Dataset[MediaRow], stride: Int): DataFrame =
    media.toDF().select(col("doc_id"), col("media_type"),
      sequence(lit(0), col("n_bytes") - 1, lit(stride)).as("offsets"))

  /** Declared rows-only query: per-type feature statistics. The feature
    * checksum makes the (stubbed) decode path observable end-to-end. */
  private def featureStats(spark: SparkSession, dir: String): DataFrame = {
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
    "multimodal_features" -> QueryDef(
      (s: SparkSession, d: String) => featureStats(s, d), None),
    "multimodal_metadata" -> QueryDef(
      (s: SparkSession, d: String) => mediaMetadata(s, d), mediaMetadataSql),
    "multimodal_offsets" -> QueryDef(
      (s: SparkSession, d: String) => mediaOffsets(s, d), mediaOffsetsSql)
  )

  def queries: Seq[(String, QueryDef)] = q
}
