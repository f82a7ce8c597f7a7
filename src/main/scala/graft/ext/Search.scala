package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.core.{QueryDef, Tables}

/** Text retrieval over the document corpus: ranked keyword search on an
  * inverted-index shape, and phrase search as a zero-shuffle positional
  * scan. The reference engine has no retrieval surface; these are [EXT]
  * operators a training-data pipeline needs constantly (e.g. "find every
  * document mentioning X" during dataset audits, eval-leak forensics,
  * targeted subset extraction).
  *
  * Scale shape, in order of operations:
  *   - The term filter lands immediately after the token explode, BEFORE
  *     any aggregation — at 100 TB the per-task stream reduces to
  *     postings for the query terms only, so the single shuffle carries
  *     O(matching tokens), not O(corpus tokens).
  *   - Document frequencies are a per-term aggregate of that same tiny
  *     postings relation (|terms| rows); the join back is a broadcast by
  *     construction.
  *   - Scoring is integer-exact: tf × (N − df) — a tf-idf-shaped rarity
  *     weight with no log()/float in the rank key, so ordering is
  *     bit-identical across engines and partitionings (libm last bits
  *     are not a portable surface; see TextOps.text_commonness).
  */
object Search {

  /** Conjunctive ranked retrieval: documents containing ALL query terms,
    * ranked by Σ_t tf(d,t) · (N − df(t)) descending. The posting-list
    * build (explode → filter → per-(doc,term) tf) is the inverted-index
    * access path; `df` and `N` are the index statistics a real engine
    * keeps in its dictionary. */
  def rankedSearch(docs: DataFrame, terms: Seq[String], k: Int): DataFrame = {
    val nDocs = docs.agg(count(lit(1)).as("n_docs")) // 1 row → broadcast
    val postings = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
      .filter(col("token").isin(terms: _*)) // pushdown: postings fetch
      .groupBy(col("doc_id"), col("token"))
      .agg(count(lit(1)).as("tf"))
    val dict = postings
      .groupBy(col("token"))
      .agg(countDistinct(col("doc_id")).as("df")) // |terms| rows
    postings
      .join(dict, Seq("token")) // broadcast: dict is |terms| rows
      .crossJoin(nDocs)
      .groupBy(col("doc_id"))
      .agg(countDistinct(col("token")).as("n_terms"),
        sum(col("tf") * (col("n_docs") - col("df"))).as("score"))
      .filter(col("n_terms") === terms.size) // conjunctive (AND) semantics
      .select(col("doc_id"), col("score"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(k)
  }

  def rankedSearchSql(terms: Seq[String], k: Int): String = {
    val inList = terms.map(t => s"'$t'").mkString(", ")
    s"""WITH p AS (
       |  SELECT doc_id, token, COUNT(*) AS tf FROM (
       |    SELECT doc_id, unnest(string_split(text, ' ')) AS token
       |    FROM documents)
       |  WHERE token IN ($inList)
       |  GROUP BY doc_id, token),
       |f AS (SELECT token, COUNT(DISTINCT doc_id) AS df FROM p GROUP BY token),
       |n AS (SELECT COUNT(*) AS n_docs FROM documents)
       |SELECT doc_id, CAST(SUM(tf * (n_docs - df)) AS BIGINT) AS score
       |FROM p JOIN f USING (token) CROSS JOIN n
       |GROUP BY doc_id
       |HAVING COUNT(DISTINCT token) = ${terms.size}
       |ORDER BY score DESC, doc_id
       |LIMIT $k""".stripMargin
  }

  /** Phrase search ("w1 w2" adjacent): counted per document with an
    * array scan over the token positions — a pure narrow map, zero
    * exchanges before the final top-level sort. The positional-
    * inverted-index formulation (posexplode + self-join on pos+1) is
    * the general multi-phrase shape, but for a known phrase the
    * in-row scan does the same work with no shuffle at all — at 100 TB
    * that is the difference between a map-only pass and shuffling a
    * positional index of the whole corpus. */
  def phraseSearch(docs: DataFrame, w1: String, w2: String): DataFrame = {
    // Dedup.bind: evaluate split() ONCE per row — interpreted HOFs
    // re-evaluate their argument subtree per element and per reference,
    // so an unbound token array makes this O(tokens²) per document
    val hits = Dedup.bind(split(col("text"), " ")) { toks =>
      // guard: Spark's sequence(1, 0) yields a DESCENDING [1, 0] (step
      // defaults to -1 when start > stop), and element_at(toks, 0)
      // throws — single-token docs must short-circuit to 0
      when(size(toks) < 2, lit(0)).otherwise(
        size(filter(sequence(lit(1), size(toks) - 1), i =>
          element_at(toks, i) === w1 && element_at(toks, i + 1) === w2)))
    }
    docs
      .select(col("doc_id"), hits.as("phrase_hits"))
      .filter(col("phrase_hits") > 0)
      .orderBy(col("phrase_hits").desc, col("doc_id"))
  }

  def phraseSearchSql(w1: String, w2: String): String =
    s"""WITH t AS (
       |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
       |h AS (
       |  SELECT doc_id,
       |    CAST(CASE WHEN len(toks) < 2 THEN 0 ELSE
       |      len(list_filter(range(1, len(toks)),
       |        i -> toks[i] = '$w1' AND toks[i+1] = '$w2'))
       |    END AS INT) AS phrase_hits
       |  FROM t)
       |SELECT doc_id, phrase_hits FROM h WHERE phrase_hits > 0
       |ORDER BY phrase_hits DESC, doc_id""".stripMargin

  // ------------------------------------------------ inverted index

  /** Token-hash bucket count for the persisted index layout. At corpus
    * scale this is the number of prunable directory partitions; a
    * term's postings live in exactly one. */
  val IndexBuckets = 64

  /** Bump when the index layout/semantics change — memoized indexes of
    * older builds are then rebuilt, not reused (same contract as
    * Similarity.IndexAlgoVersion). */
  private val IndexAlgoVersion = "ti1"

  private def bucketOf(token: Column): Column =
    pmod(xxhash64(token), lit(IndexBuckets.toLong)).cast("int")

  /** Offline index build: postings (token, doc_id, tf) + dictionary
    * (token, df) both written partitioned by the token-hash bucket, and
    * the corpus size as 1-row stats — the three relations a query-time
    * probe needs, each reachable with a `bucket IN (...)` directory
    * prune. The heavy explode happens HERE, once per corpus; queries
    * never re-tokenize the corpus (at 100 TB: the difference between a
    * per-query full-corpus pass and opening |terms| directories). */
  def buildTextIndex(docs: DataFrame, path: String): Unit = {
    val postings = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
      .filter(col("token") =!= "")
      .groupBy(col("token"), col("doc_id"))
      .agg(count(lit(1)).as("tf"))
      .withColumn("bucket", bucketOf(col("token")))
    postings.write.partitionBy("bucket").mode("overwrite")
      .parquet(s"$path/postings")
    postings
      .groupBy(col("bucket"), col("token"))
      .agg(count(lit(1)).as("df"))
      .write.partitionBy("bucket").mode("overwrite")
      .parquet(s"$path/dict")
    docs.agg(count(lit(1)).as("n_docs"))
      .write.mode("overwrite").parquet(s"$path/stats")
  }

  /** Build-once memoization keyed on the corpus fingerprint (file names
    * + sizes + mtimes + algo version) — the IVF index contract
    * (`Similarity.ensureIvfIndex`): `_SUCCESS` is the receipt, builds
    * stage privately and publish by atomic rename, stale fingerprints
    * of the same corpus are swept. */
  def ensureTextIndex(spark: org.apache.spark.sql.SparkSession,
      dir: String): String = synchronized {
    val src = new java.io.File(s"$dir/documents.parquet")
    val parts = (if (src.isDirectory)
      Option(src.listFiles()).getOrElse(Array.empty).toSeq.sortBy(_.getName)
    else Seq(src))
    // MD5, not String.hashCode: a 32-bit fingerprint collision after a
    // corpus change would silently reuse a stale index and serve wrong
    // results with no error — at 128 bits that failure mode is gone
    val fpInput = parts.map(f => s"${f.getName}:${f.length}:${f.lastModified}")
      .mkString("|") + "|" + IndexAlgoVersion
    val fp = java.security.MessageDigest.getInstance("MD5")
      .digest(fpInput.getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString.take(16)
    val path = sys.props.getOrElse("java.io.tmpdir", "/tmp") + "/graft_text_" +
      dir.replaceAll("[^A-Za-z0-9._-]", "_") + "_" + fp
    if (!new java.io.File(s"$path/stats/_SUCCESS").exists()) {
      val target = new java.io.File(path)
      val prefix = target.getName.substring(0, target.getName.lastIndexOf('_') + 1)
      Option(target.getParentFile.listFiles()).getOrElse(Array.empty)
        .filter(f => f.getName.startsWith(prefix) && f.getName != target.getName)
        .foreach(deleteRecursively)
      val staging = new java.io.File(
        path + ".build." + java.lang.ProcessHandle.current().pid())
      try {
        buildTextIndex(Tables.documents(spark, dir), staging.getAbsolutePath)
        if (!staging.renameTo(target)) {
          deleteRecursively(staging)
          require(new java.io.File(s"$path/stats/_SUCCESS").exists(),
            s"text index build could not be published at $path")
        }
      } catch { case e: Throwable => deleteRecursively(staging); throw e }
    }
    path
  }

  private def deleteRecursively(f: java.io.File): Unit = {
    if (f.isDirectory)
      Option(f.listFiles()).getOrElse(Array.empty).foreach(deleteRecursively)
    f.delete(): Unit
  }

  /** Query-time probe of a prebuilt index: identical semantics (and
    * declared oracle) to `rankedSearch`, but the corpus-sized work is
    * replaced by bucket-pruned postings reads — the `bucket IN`
    * literals land as PartitionFilters (plan-asserted in
    * SearchSketchSpec), so only the query terms' directories open. */
  def rankedSearchIndexed(spark: org.apache.spark.sql.SparkSession,
      path: String, terms: Seq[String], k: Int): DataFrame = {
    val buckets = terms
      .map(t => math.floorMod(graft.functions.XxHash.forString(t),
        IndexBuckets.toLong).toInt)
      .distinct
    val postings = spark.read.parquet(s"$path/postings")
      .filter(col("bucket").isin(buckets: _*) && col("token").isin(terms: _*))
    val dict = spark.read.parquet(s"$path/dict")
      .filter(col("bucket").isin(buckets: _*) && col("token").isin(terms: _*))
      .select(col("token"), col("df"))
    val nDocs = spark.read.parquet(s"$path/stats")
    postings
      .join(dict, Seq("token"))
      .crossJoin(broadcast(nDocs))
      .groupBy(col("doc_id"))
      .agg(countDistinct(col("token")).as("n_terms"),
        sum(col("tf") * (col("n_docs") - col("df"))).as("score"))
      .filter(col("n_terms") === terms.size)
      .select(col("doc_id"), col("score"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(k)
  }

  private val q: Seq[(String, QueryDef)] = Seq(
    "text_search" -> QueryDef(
      (s, d) => rankedSearch(Tables.documents(s, d),
        Seq("vector", "hash", "join"), 20),
      rankedSearchSql(Seq("vector", "hash", "join"), 20)),

    "text_phrase_search" -> QueryDef(
      (s, d) => phraseSearch(Tables.documents(s, d), "hash", "join"),
      phraseSearchSql("hash", "join")),

    // the indexed probe must return EXACTLY what the scan-time ranker
    // returns — same oracle, different physical plan (offline index +
    // directory pruning instead of a corpus pass)
    "text_search_indexed" -> QueryDef(
      (s, d) => rankedSearchIndexed(s, ensureTextIndex(s, d),
        Seq("vector", "hash", "join"), 20),
      rankedSearchSql(Seq("vector", "hash", "join"), 20))
  )

  def queries: Seq[(String, QueryDef)] = q
}
