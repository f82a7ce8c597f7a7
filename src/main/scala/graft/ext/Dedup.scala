package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{QueryDef, Tables}

/** Near-duplicate detection at corpus scale (SURVEY.md §2.11 L2):
  * MinHash+LSH, SimHash, n-gram Jaccard, embedding-cosine blocking.
  *
  * Design for 100 TB:
  *  - Signatures are computed per document with array higher-order
  *    functions over the token array — a single narrow map stage, no
  *    explode of (doc × shingle) rows, no UDFs. K minhash slots fold
  *    over the shingle array with `aggregate`.
  *  - Candidate generation is banded LSH: explode only the B band keys
  *    per doc (B=4 rows/doc, not |shingles| rows), shuffle on
  *    (band, band_hash), and pair up inside buckets. Quadratic work is
  *    confined to hash buckets, never the corpus.
  *  - Verification (exact signature overlap / cosine) runs only on
  *    candidate pairs.
  *
  * xxhash64 seeds the K hash family (`xxhash64(k, shingle)`); these are
  * not reproducible in ANSI SQL, so these queries are declared without a
  * DuckDB oracle (rows-only driver check) and verified by property-based
  * ScalaTest instead (DedupSpec): planted near-duplicates must pair,
  * random documents must not.
  */
object Dedup {

  val NumHashes = 16
  val NumBands  = 4          // 4 bands × 4 rows: catches jaccard ≳ 0.5
  private val RowsPerBand = NumHashes / NumBands

  /** Word-level shingles (n-gram tokens joined by space), distinct.
    * Guarded for docs shorter than n tokens (sequence(1,0) would count
    * DOWN and element_at would throw under ANSI). */
  def shingles(text: Column, n: Int): Column = {
    val toks = filter(split(text, " "), t => t =!= "")
    val grams = transform(sequence(lit(1), size(toks) - (n - 1)), i =>
      concat_ws(" ", (0 until n).map(o => element_at(toks, i + o)): _*))
    when(size(toks) < n, array().cast("array<string>"))
      .otherwise(array_distinct(grams))
  }

  /** MinHash signature: K-element array, slot k = min over shingles of
    * xxhash64(k, shingle). */
  def minhashSignature(sh: Column): Column =
    transform(sequence(lit(0), lit(NumHashes - 1)), k =>
      aggregate(sh, lit(Long.MaxValue), (acc, s) => least(acc, xxhash64(k, s))))

  /** doc_id + signature + B band keys. */
  def signatures(docs: DataFrame): DataFrame = {
    val sig = minhashSignature(shingles(col("text"), 3))
    docs.select(col("doc_id"), sig.as("sig"))
      .withColumn("bands", transform(sequence(lit(0), lit(NumBands - 1)), b =>
        struct(b.as("band"),
          xxhash64(slice(col("sig"), b * RowsPerBand + 1, lit(RowsPerBand))).as("bkey"))))
  }

  /** Candidate pairs from shared LSH buckets, verified by estimated
    * jaccard = fraction of matching minhash slots. */
  def minhashPairs(docs: DataFrame, threshold: Double): DataFrame = {
    val sigs = signatures(docs)
    val exploded = sigs.select(col("doc_id"), col("sig"),
      explode(col("bands")).as("b"))
      .select(col("doc_id"), col("sig"), col("b.band"), col("b.bkey"))
    val a = exploded.select(col("band"), col("bkey"),
      col("doc_id").as("doc_a"), col("sig").as("sig_a"))
    val b = exploded.select(col("band"), col("bkey"),
      col("doc_id").as("doc_b"), col("sig").as("sig_b"))
    a.join(b, Seq("band", "bkey"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"), col("sig_a"), col("sig_b"))
      .dropDuplicates("doc_a", "doc_b")
      .withColumn("est_jaccard",
        aggregate(zip_with(col("sig_a"), col("sig_b"),
          (x, y) => when(x === y, 1).otherwise(0)), lit(0), (acc, v) => acc + v)
          .cast("double") / NumHashes)
      .filter(col("est_jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), col("est_jaccard"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** Exact n-gram Jaccard for candidate pairs (verification stage of the
    * MinHash pipeline — exact set overlap via sorted-array intersection,
    * computed per pair without re-exploding the corpus). */
  def jaccardVerify(docs: DataFrame, threshold: Double): DataFrame = {
    val withSh = docs.select(col("doc_id"),
      shingles(col("text"), 3).as("sh"))
    val cands = minhashPairs(docs, threshold * 0.5)
      .select(col("doc_a"), col("doc_b"))
    cands
      .join(withSh.select(col("doc_id").as("doc_a"), col("sh").as("sh_a")), Seq("doc_a"))
      .join(withSh.select(col("doc_id").as("doc_b"), col("sh").as("sh_b")), Seq("doc_b"))
      .withColumn("inter", size(array_intersect(col("sh_a"), col("sh_b"))))
      .withColumn("jaccard", col("inter").cast("double") /
        (size(col("sh_a")) + size(col("sh_b")) - col("inter")))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** 64-bit SimHash fingerprint over tokens as a Long column, computed
    * entirely with array HOFs (one narrow projection, no shuffle): bit b
    * of the fingerprint is the sign of Σ_tokens (±1 by bit b of
    * xxhash64(token)). Shift amounts are lambda variables, so we go
    * through `call_function` (the Scala `shiftleft/shiftright` helpers
    * only accept literal Int bit counts). */
  def simhashFingerprint(text: Column): Column = {
    val toks = filter(split(text, " "), t => t =!= "")
    val hashes = transform(toks, t => xxhash64(t))
    // per-bit vote: +1 if bit set, -1 otherwise; fingerprint bit = vote>0
    val votes = transform(sequence(lit(0), lit(63)), b =>
      aggregate(hashes, lit(0L), (acc, h) =>
        acc + when(call_function("shiftright", h, b).bitwiseAND(lit(1L)) === 1L, 1L)
          .otherwise(-1L)))
    aggregate(
      zip_with(votes, sequence(lit(0), lit(63)), (v, b) =>
        when(v > 0, call_function("shiftleft", lit(1L), b)).otherwise(lit(0L))),
      lit(0L), (acc, x) => acc.bitwiseOR(x))
  }

  /** Near-dup pairs by SimHash: block on 4 × 16-bit chunks (pigeonhole:
    * hamming ≤ 3 ⇒ at least one chunk equal), verify hamming ≤ maxDist. */
  def simhashPairs(docs: DataFrame, maxDist: Int): DataFrame = {
    val fp = docs.select(col("doc_id"), simhashFingerprint(col("text")).as("fp"))
    val chunks = fp.select(col("doc_id"), col("fp"),
      explode(transform(sequence(lit(0), lit(3)), c => struct(c.as("chunk"),
        call_function("shiftright", col("fp"), c * 16)
          .bitwiseAND(lit(0xFFFFL)).as("ckey"))))
        .as("c"))
      .select(col("doc_id"), col("fp"), col("c.chunk"), col("c.ckey"))
    val a = chunks.select(col("chunk"), col("ckey"),
      col("doc_id").as("doc_a"), col("fp").as("fp_a"))
    val b = chunks.select(col("chunk"), col("ckey"),
      col("doc_id").as("doc_b"), col("fp").as("fp_b"))
    a.join(b, Seq("chunk", "ckey"))
      .filter(col("doc_a") < col("doc_b"))
      .dropDuplicates("doc_a", "doc_b")
      .withColumn("hamming", bit_count(col("fp_a").bitwiseXOR(col("fp_b"))))
      .filter(col("hamming") <= maxDist)
      .select(col("doc_a"), col("doc_b"), col("hamming"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** Embedding-cosine near-dup, blocked on the coarse `label` cell
    * (IVF-style: quadratic work only inside cells). */
  def embeddingPairs(emb: DataFrame, minCos: Double): DataFrame = {
    val e = emb.select(col("label"), col("vec_id"),
      transform(col("embedding"), x => x.cast("double")).as("v"))
    val a = e.select(col("label"), col("vec_id").as("id_a"), col("v").as("v_a"))
    val b = e.select(col("label"), col("vec_id").as("id_b"), col("v").as("v_b"))
    val dot = aggregate(zip_with(col("v_a"), col("v_b"), (x, y) => x * y),
      lit(0.0), (acc, x) => acc + x)
    val na = sqrt(aggregate(transform(col("v_a"), x => x * x), lit(0.0), (acc, x) => acc + x))
    val nb = sqrt(aggregate(transform(col("v_b"), x => x * x), lit(0.0), (acc, x) => acc + x))
    a.join(b, Seq("label")).filter(col("id_a") < col("id_b"))
      .withColumn("cos", dot / (na * nb))
      .filter(col("cos") >= minCos)
      .select(col("id_a"), col("id_b"), col("cos"))
      .orderBy(col("id_a"), col("id_b"))
  }

  // ---- declared queries (rows-only: hash seeds not SQL-reproducible) ----
  private val q: Seq[(String, QueryDef)] = Seq(
    "dedup_minhash" -> QueryDef(
      (s: SparkSession, d: String) => minhashPairs(Tables.documents(s, d), 0.5), None),
    "dedup_jaccard" -> QueryDef(
      (s: SparkSession, d: String) => jaccardVerify(Tables.documents(s, d), 0.6), None),
    "dedup_simhash" -> QueryDef(
      (s: SparkSession, d: String) => simhashPairs(Tables.documents(s, d), 8), None),
    // fixture embeddings are near-orthogonal (max within-cell cosine
    // ≈ 0.47), so the declared threshold is tuned to surface the top
    // percentile of pairs; a real corpus would use ≥ 0.9
    "dedup_embedding" -> QueryDef(
      (s: SparkSession, d: String) => embeddingPairs(Tables.embeddings(s, d), 0.35), None)
  )

  def queries: Seq[(String, QueryDef)] = q
}
