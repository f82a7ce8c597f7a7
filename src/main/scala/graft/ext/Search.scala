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

  private val q: Seq[(String, QueryDef)] = Seq(
    "text_search" -> QueryDef(
      (s, d) => rankedSearch(Tables.documents(s, d),
        Seq("vector", "hash", "join"), 20),
      rankedSearchSql(Seq("vector", "hash", "join"), 20)),

    "text_phrase_search" -> QueryDef(
      (s, d) => phraseSearch(Tables.documents(s, d), "hash", "join"),
      phraseSearchSql("hash", "join"))
  )

  def queries: Seq[(String, QueryDef)] = q
}
