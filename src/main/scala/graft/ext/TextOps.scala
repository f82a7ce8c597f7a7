package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.{QueryDef, Tables}

/** Text-analysis operators for LLM training-data pipelines (SURVEY.md
  * §2.11 L1/L4): exact dedup, fingerprinting, quality scoring,
  * language-ID heuristic, token statistics.
  *
  * All of these are single-pass, shuffle-light plans: per-document
  * features are pure Column/higher-order-function chains (no UDFs, no
  * explode where an array HOF suffices), so 100 TB of documents streams
  * through map tasks; the only shuffles are the final group-bys on
  * already-reduced keys (text hash / token).
  */
object TextOps {

  /** Winnowing fingerprints (Schleimer/Wilkerson/Aiken, SIGMOD'03):
    * (doc_id, pos, fp) — see the `text_winnow` declaration below for
    * the full design rationale. Guarantee (their Theorem 1 direction
    * that matters for dedup): two documents sharing a normalized
    * substring of length ≥ k + w − 1 share at least one fingerprint
    * VALUE. In-row and shuffle-free before the final sort. */
  def winnowFingerprints(docs: org.apache.spark.sql.DataFrame,
      k: Int, w: Int): org.apache.spark.sql.DataFrame = {
    val norm = trim(regexp_replace(lower(col("text")), "\\s+", " "))
    // native O(n) Rabin–Karp k-gram hashes (functions/RollingHash);
    // the previous md5-per-position chain (one digest + hex round-trip
    // per character) dominated the whole query at sf0.1
    val hashes = graft.functions.RollingHash.rolling_hash(norm, k)
    docs
      .select(col("doc_id"), hashes.as("h"))
      // native O(n) monotonic-deque selection (functions/WinnowSelect);
      // the HOF slice-per-window form was O(n·w) interpreted and
      // dominated the query at sf0.1. Sub-w docs yield an empty array →
      // explode drops them, as before
      .select(col("doc_id"), col("h"),
        explode(graft.functions.WinnowSelect.winnow_select(col("h"), w))
          .as("pos"))
      .select(col("doc_id"), col("pos"),
        element_at(col("h"), col("pos")).as("fp"))
      .orderBy(col("doc_id"), col("pos"))
  }

  /** MOSS-style near-dup pairs over winnowing fingerprints: documents
    * sharing ≥ `minShared` RARE fingerprints (document frequency ≤
    * `maxDf` — the standard "drop ubiquitous fragments" cut; without it
    * a template-heavy corpus has single fingerprints shared by 25% of
    * documents and the bucket self-join degenerates quadratic). The
    * df cap bounds every bucket, so pair work is O(Σ df²) ≤
    * O(maxDf · fingerprints) — the banded-LSH cost shape, reached with
    * plain relational ops. `n_shared` is the exact overlap count of
    * rare fingerprints, the MOSS similarity signal. */
  def winnowPairs(docs: org.apache.spark.sql.DataFrame, k: Int, w: Int,
      maxDf: Int, minShared: Long): org.apache.spark.sql.DataFrame = {
    val fps = winnowFingerprints(docs, k, w)
      .select(col("doc_id"), col("fp")).distinct()
      // feeds the df aggregate AND both sides of the bucket self-join
      .localCheckpoint(true)
    // fps is DISTINCT (doc_id, fp) by construction, so document
    // frequency is a plain count — countDistinct planned a two-phase
    // distinct aggregation for a dedup the input already has
    val rare = fps.groupBy(col("fp"))
      .agg(count(lit(1)).as("df"))
      .filter(col("df") <= maxDf)
      .select(col("fp"))
    val r = fps.join(rare, Seq("fp"), "left_semi")
    val a = r.select(col("fp"), col("doc_id").as("doc_a"))
    val b = r.select(col("fp"), col("doc_id").as("doc_b"))
    a.join(b, Seq("fp"))
      .filter(col("doc_a") < col("doc_b"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** The `text_quality` rule points as a reusable Column (0–4): length
    * band, token count, mean token length band, type-token ratio. */
  def qualityScore: org.apache.spark.sql.Column = {
    val toks = filter(split(col("text"), " "), t => t =!= "")
    val tokenCount = size(toks)
    val avgTok = aggregate(toks, lit(0), (acc, t) => acc + length(t))
      .cast("double") / tokenCount
    when(length(col("text")).between(100, 1000), 1).otherwise(0) +
      when(tokenCount >= 20, 1).otherwise(0) +
      when(avgTok.between(3.0, 8.0), 1).otherwise(0) +
      when(size(array_distinct(toks)) * 2 >= tokenCount, 1).otherwise(0)
  }

  /** SQL twin of `qualityScore` over a `documents`-aliased relation. */
  def qualityScoreSql(alias: String): String =
    s"""(CASE WHEN length($alias.text) BETWEEN 100 AND 1000 THEN 1 ELSE 0 END) +
       |(CASE WHEN len(list_filter(string_split($alias.text, ' '), x -> x <> '')) >= 20 THEN 1 ELSE 0 END) +
       |(CASE WHEN CAST(list_sum(list_transform(list_filter(string_split($alias.text, ' '), x -> x <> ''), x -> length(x))) AS DOUBLE)
       |      / len(list_filter(string_split($alias.text, ' '), x -> x <> ''))
       |      BETWEEN 3.0 AND 8.0 THEN 1 ELSE 0 END) +
       |(CASE WHEN len(list_distinct(list_filter(string_split($alias.text, ' '), x -> x <> ''))) * 2
       |      >= len(list_filter(string_split($alias.text, ' '), x -> x <> '')) THEN 1 ELSE 0 END)""".stripMargin

  /** The `text_langid` English stopword score as a reusable Column. */
  def enScore: org.apache.spark.sql.Column =
    size(filter(split(col("text"), " "),
      t => t.isin("the", "a", "and", "of")))

  def enScoreSql(alias: String): String =
    s"""len(list_filter(string_split($alias.text, ' '),
       |    t -> t IN ('the','a','and','of')))""".stripMargin

  /** Boilerplate scrub (CCNet / RefinedWeb line-dedup shape): within
    * each SOURCE, text units repeated across ≥ `minDf` distinct
    * documents are boilerplate (headers, footers, nav chrome — the
    * same bytes on every page of a site) and are removed; the unit
    * here is the aligned `chunkTokens`-token window because the
    * fixture corpus has no newlines (on real web text the split is
    * `\n`; everything downstream is identical).
    *
    * Scale shape: chunking is one in-row HOF pass; the frequency table
    * is a partial-agg shuffle keyed (source, chunk) — the same key the
    * verdict join uses, so AQE plans one co-partitioned exchange pair
    * and hot template chunks are skew-split. Reassembly sorts each
    * doc's kept chunks by position in-row (array_sort over a bounded
    * per-doc list), never a global sort. */
  def boilerplateScrub(docs: DataFrame, chunkTokens: Int = 5,
      minDf: Int = 2): DataFrame = {
    val c = chunkTokens
    val chunked = docs
      .select(col("doc_id"), col("source"),
        filter(split(col("text"), " "), t => t =!= "").as("toks"))
      .withColumn("nc", expr(s"(size(toks) + ${c - 1}) div $c"))
      .select(col("doc_id"), col("source"),
        posexplode(expr(
          s"""CASE WHEN nc <= 0 THEN array()
             |ELSE transform(sequence(0, nc - 1),
             |  i -> array_join(slice(toks, i * $c + 1, $c), ' ')) END"""
            .stripMargin)).as(Seq("pos", "chunk")))
    val dfreq = chunked.groupBy(col("source"), col("chunk"))
      .agg(countDistinct(col("doc_id")).as("df"))
    chunked.join(dfreq, Seq("source", "chunk"))
      .withColumn("boiler", col("df") >= minDf)
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_chunks"),
        sum(when(col("boiler"), 1L).otherwise(0L)).as("n_boiler"),
        array_join(transform(
          array_sort(collect_list(when(!col("boiler"),
            struct(col("pos"), col("chunk"))))),
          x => x.getField("chunk")), " ").as("clean_text"))
      .orderBy(col("doc_id"))
  }

  def boilerplateScrubSql(chunkTokens: Int = 5, minDf: Int = 2): String = {
    val c = chunkTokens
    s"""WITH t AS (
       |  SELECT doc_id, source,
       |         list_filter(string_split(text, ' '), x -> x <> '') AS toks
       |  FROM documents),
       |n AS (
       |  SELECT doc_id, source, toks, (len(toks) + ${c - 1}) // $c AS nc FROM t),
       |c AS (
       |  SELECT doc_id, source, i AS pos,
       |         array_to_string(toks[(i*$c+1):(i*$c+$c)], ' ') AS chunk
       |  FROM n, unnest(range(0, nc)) AS u(i)),
       |d AS (
       |  SELECT source, chunk, COUNT(DISTINCT doc_id) AS df
       |  FROM c GROUP BY 1, 2),
       |j AS (
       |  SELECT c.doc_id, c.pos, c.chunk, d.df >= $minDf AS boiler
       |  FROM c JOIN d ON d.source = c.source AND d.chunk = c.chunk)
       |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_chunks,
       |  CAST(SUM(CASE WHEN boiler THEN 1 ELSE 0 END) AS BIGINT) AS n_boiler,
       |  COALESCE(string_agg(chunk, ' ' ORDER BY pos)
       |    FILTER (WHERE NOT boiler), '') AS clean_text
       |FROM j GROUP BY doc_id ORDER BY doc_id""".stripMargin
  }

  private val q: Seq[(String, QueryDef)] = Seq(

    // ---- L4h per-source repeated-chunk boilerplate scrub ---------------
    "text_boilerplate" -> QueryDef(
      (s, d) => boilerplateScrub(Tables.documents(s, d)),
      boilerplateScrubSql()),

    // ---- L1 exact dedup: group by full text, canonical = min doc_id ----
    "dedup_exact" -> QueryDef(
      (s, d) => Tables.documents(s, d)
        .groupBy(col("text"))
        .agg(min(col("doc_id")).as("canonical_id"), count(lit(1)).as("n_copies"))
        .select(md5(col("text")).as("fp"), col("canonical_id"), col("n_copies"))
        .orderBy(col("canonical_id")),
      """SELECT md5(text) AS fp, MIN(doc_id) AS canonical_id, COUNT(*) AS n_copies
        |FROM documents GROUP BY text ORDER BY canonical_id""".stripMargin),

    // ---- L1 fingerprint dedup: hash of normalized text -----------------
    //      (lower + collapse whitespace + trim → robust to trivial edits)
    "text_fingerprint" -> QueryDef(
      (s, d) => {
        val norm = trim(regexp_replace(lower(col("text")), "\\s+", " "))
        Tables.documents(s, d)
          .select(col("doc_id"), md5(norm).as("fingerprint"))
          .orderBy(col("doc_id"))
      },
      """SELECT doc_id,
        |  md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fingerprint
        |FROM documents ORDER BY doc_id""".stripMargin),

    // ---- L1c winnowing fingerprints (Schleimer/Wilkerson/Aiken,
    //      SIGMOD'03 — the MOSS local fingerprinting scheme): rolling
    //      k-gram hashes over the normalized text, one fingerprint per
    //      w-window = the window's minimum hash (leftmost on ties — a
    //      fixed deterministic rule so both engines agree; classic
    //      winnowing's rightmost rule is equally valid, the CONTRACT is
    //      what matters), consecutive windows picking the same position
    //      dedup to one row. Guarantees: any shared substring of length
    //      ≥ k + w − 1 yields a shared fingerprint — the local-dedup
    //      complement to `text_fingerprint`'s whole-document hash.
    //      Entirely in-row (one narrow map, zero shuffle before the
    //      final sort): per-doc work is linear in text length — native
    //      O(n) Rabin–Karp k-gram hashes (functions/RollingHash, exact
    //      BIGINT arithmetic both engines share) into a native O(n)
    //      monotonic-deque selection (functions/WinnowSelect) — so the
    //      whole chain sits behind the DuckDB gate.
    "text_winnow" -> QueryDef(
      (s, d) => winnowFingerprints(Tables.documents(s, d), k = 8, w = 16),
      raw"""WITH t AS (
        |  SELECT doc_id, trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS t
        |  FROM documents),
        |h AS (
        |  SELECT doc_id,
        |    ${graft.functions.RollingHash.sqlKgramHashes("t", 8)} AS h
        |  FROM t),
        |sel AS (
        |  SELECT doc_id, h,
        |    CASE WHEN len(h) >= 16 THEN
        |      list_distinct(list_transform(range(1, len(h) - 14),
        |        s -> s + list_position(list_slice(h, s, s + 15),
        |                               list_min(list_slice(h, s, s + 15))) - 1))
        |    ELSE [] END AS sels
        |  FROM h)
        |SELECT doc_id, CAST(pos AS INT) AS pos, h[pos] AS fp
        |FROM (SELECT doc_id, h, unnest(sels) AS pos FROM sel)
        |ORDER BY doc_id, pos""".stripMargin),

    // ---- L1d MOSS pair mining on the winnow fingerprints: rare-fp
    //      (df ≤ 5) bucket join, pairs sharing ≥ 3 fragments — the
    //      plagiarism-detector application of text_winnow, full oracle
    "dedup_winnow" -> QueryDef(
      (s, d) => winnowPairs(Tables.documents(s, d),
        k = 8, w = 16, maxDf = 5, minShared = 3L),
      raw"""WITH t AS (
        |  SELECT doc_id, trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS t
        |  FROM documents),
        |h AS (
        |  SELECT doc_id,
        |    ${graft.functions.RollingHash.sqlKgramHashes("t", 8)} AS h
        |  FROM t),
        |sel AS (
        |  SELECT doc_id, h,
        |    CASE WHEN len(h) >= 16 THEN
        |      list_distinct(list_transform(range(1, len(h) - 14),
        |        s -> s + list_position(list_slice(h, s, s + 15),
        |                               list_min(list_slice(h, s, s + 15))) - 1))
        |    ELSE [] END AS sels
        |  FROM h),
        |w AS (
        |  SELECT doc_id, h[pos] AS fp
        |  FROM (SELECT doc_id, h, unnest(sels) AS pos FROM sel)),
        |fps AS (SELECT DISTINCT doc_id, fp FROM w),
        |rare AS (
        |  SELECT fp FROM (
        |    SELECT fp, COUNT(DISTINCT doc_id) AS df FROM fps GROUP BY fp)
        |  WHERE df <= 5),
        |r AS (SELECT doc_id, fp FROM fps WHERE fp IN (SELECT fp FROM rare))
        |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |       COUNT(*) AS n_shared
        |FROM r a JOIN r b ON a.fp = b.fp AND a.doc_id < b.doc_id
        |GROUP BY 1, 2 HAVING COUNT(*) >= 3
        |ORDER BY doc_a, doc_b""".stripMargin),

    // ---- L4 per-document statistics -------------------------------------
    "text_stats" -> QueryDef(
      (s, d) => {
        val toks = split(col("text"), " ")
        val nonEmpty = filter(toks, t => t =!= "")
        Tables.documents(s, d).select(
          col("doc_id"),
          length(col("text")).as("char_len"),
          size(nonEmpty).as("token_count"),
          size(array_distinct(nonEmpty)).as("uniq_tokens"),
          (aggregate(nonEmpty, lit(0), (acc, t) => acc + length(t)).cast("double")
            / size(nonEmpty)).as("avg_token_len"),
          // BPE-ish subword proxy: letter runs | single digits | other
          // marks — the standard pre-tokenizer shape, identical regex
          // semantics in Java and RE2
          size(expr("regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9 ]', 0)"))
            .as("bpe_tokens"))
          .orderBy(col("doc_id"))
      },
      """SELECT doc_id,
        |  CAST(length(text) AS INT) AS char_len,
        |  CAST(len(list_filter(string_split(text, ' '), t -> t <> '')) AS INT) AS token_count,
        |  CAST(len(list_distinct(list_filter(string_split(text, ' '), t -> t <> ''))) AS INT) AS uniq_tokens,
        |  CAST(list_sum(list_transform(list_filter(string_split(text, ' '), t -> t <> ''), t -> length(t))) AS DOUBLE)
        |    / len(list_filter(string_split(text, ' '), t -> t <> '')) AS avg_token_len,
        |  CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9 ]')) AS INT) AS bpe_tokens
        |FROM documents ORDER BY doc_id""".stripMargin),

    // ---- L4 sentence segmentation statistics: split on terminal
    //      punctuation runs ([.!?]+ — a regex class with identical
    //      semantics in Java and RE2), trim-filter empties, then
    //      per-doc sentence count, mean tokens/sentence as an exact
    //      ×100 integer ratio (no float on the comparison surface) and
    //      the longest sentence's char length. Narrow per-row HOFs,
    //      no shuffle before the final sort ----------------------------
    "text_sentences" -> QueryDef(
      (s, d) => {
        val sent = filter(transform(split(col("text"), "[.!?]+"),
          x => trim(x)), x => x =!= "")
        val toks = filter(split(col("text"), " "), t => t =!= "")
        Tables.documents(s, d)
          .select(col("doc_id"), size(sent).as("n_sentences"),
            size(toks).as("n_tokens"),
            when(size(sent) > 0,
              array_max(transform(sent, x => length(x))))
              .cast("int").as("max_sent_chars"))
          .select(col("doc_id"), col("n_sentences"), col("n_tokens"),
            when(col("n_sentences") > 0,
              expr("CAST(100 AS BIGINT) * n_tokens div n_sentences"))
              .as("avg_sent_tokens_x100"),
            col("max_sent_chars"))
          .orderBy(col("doc_id"))
      },
      """WITH s AS (
        |  SELECT doc_id,
        |    list_filter(list_transform(regexp_split_to_array(text, '[.!?]+'),
        |      x -> trim(x)), x -> x <> '') AS sents,
        |    list_filter(string_split(text, ' '), t -> t <> '') AS toks
        |  FROM documents)
        |SELECT doc_id,
        |  CAST(len(sents) AS INT) AS n_sentences,
        |  CAST(len(toks) AS INT) AS n_tokens,
        |  CASE WHEN len(sents) > 0
        |       THEN CAST(100 * len(toks) // len(sents) AS BIGINT) END
        |    AS avg_sent_tokens_x100,
        |  CASE WHEN len(sents) > 0
        |       THEN CAST(list_max(list_transform(sents, x -> length(x))) AS INT) END
        |    AS max_sent_chars
        |FROM s ORDER BY doc_id""".stripMargin),

    // ---- L4c Gopher-rules filter (Rae et al. 2021, A1.1) ----------------
    //      The industrial multi-rule document filter, emitted as a
    //      per-rule REPORT (not just a score): each rule's pass flag +
    //      the evidence counts + the conjunctive keep decision, so a
    //      curation run can audit WHICH rule dropped a document. Every
    //      ratio threshold is an integer cross-multiplication (sl*10
    //      between 30n and 50n, maxc*5 <= n) — no division anywhere, so
    //      the report is hash-exact by construction. Thresholds are the
    //      Gopher shapes calibrated to the fixture so every rule fires
    //      BOTH ways at sf0.01 (358/493/224/493 of 500 pass; 146 keep).
    //      Scale: per-doc scalars are narrow HOFs; the one aggregation
    //      (top-word count) is explode → (doc,word) partial agg → per-doc
    //      max — word counts collapse map-side before the wire, and the
    //      final join is doc-keyed. --------------------------------------
    "corpus_gopher_filter" -> QueryDef(
      (s, d) => {
        val toks = filter(split(col("text"), " "), t => t =!= "")
        val perDoc = Tables.documents(s, d).select(
          col("doc_id"),
          size(toks).as("n_words"),
          aggregate(toks, lit(0), (acc, t) => acc + length(t)).as("sum_word_len"),
          size(filter(toks, t => t.isin(
            "the", "be", "to", "of", "and", "that", "have", "with")))
            .as("stop_hits"))
        val maxWord = Tables.documents(s, d)
          .select(col("doc_id"), explode(toks).as("w"))
          .groupBy(col("doc_id"), col("w")).agg(count(lit(1)).as("c"))
          .groupBy(col("doc_id")).agg(max(col("c")).as("max_word_cnt"))
        perDoc.join(maxWord, Seq("doc_id"))
          .withColumn("r_wordcount", col("n_words").between(20, 80))
          .withColumn("r_wordlen",
            col("sum_word_len") * 10 >= col("n_words") * 30 &&
            col("sum_word_len") * 10 <= col("n_words") * 50)
          .withColumn("r_stopwords", col("stop_hits") >= 2)
          .withColumn("r_repetition", col("max_word_cnt") * 5 <= col("n_words"))
          .withColumn("keep", col("r_wordcount") && col("r_wordlen") &&
            col("r_stopwords") && col("r_repetition"))
          .select(col("doc_id"), col("n_words"), col("sum_word_len"),
            col("stop_hits"), col("max_word_cnt"), col("r_wordcount"),
            col("r_wordlen"), col("r_stopwords"), col("r_repetition"),
            col("keep"))
          .orderBy(col("doc_id"))
      },
      """WITH d AS (
        |  SELECT doc_id,
        |         list_filter(string_split(text, ' '), x -> x <> '') AS toks
        |  FROM documents),
        |s AS (
        |  SELECT doc_id, len(toks) AS n_words,
        |         list_sum(list_transform(toks, t -> length(t))) AS sum_word_len,
        |         len(list_filter(toks, t -> t IN
        |           ('the','be','to','of','and','that','have','with'))) AS stop_hits
        |  FROM d),
        |m AS (
        |  SELECT doc_id, MAX(c) AS max_word_cnt
        |  FROM (SELECT doc_id, w, COUNT(*) AS c
        |        FROM (SELECT doc_id, unnest(toks) AS w FROM d)
        |        GROUP BY doc_id, w)
        |  GROUP BY doc_id)
        |SELECT s.doc_id,
        |  CAST(s.n_words AS INT) AS n_words,
        |  CAST(s.sum_word_len AS INT) AS sum_word_len,
        |  CAST(s.stop_hits AS INT) AS stop_hits,
        |  CAST(m.max_word_cnt AS BIGINT) AS max_word_cnt,
        |  s.n_words BETWEEN 20 AND 80 AS r_wordcount,
        |  s.sum_word_len * 10 >= s.n_words * 30
        |    AND s.sum_word_len * 10 <= s.n_words * 50 AS r_wordlen,
        |  s.stop_hits >= 2 AS r_stopwords,
        |  m.max_word_cnt * 5 <= s.n_words AS r_repetition,
        |  s.n_words BETWEEN 20 AND 80
        |    AND s.sum_word_len * 10 >= s.n_words * 30
        |    AND s.sum_word_len * 10 <= s.n_words * 50
        |    AND s.stop_hits >= 2
        |    AND m.max_word_cnt * 5 <= s.n_words AS keep
        |FROM s JOIN m ON s.doc_id = m.doc_id
        |ORDER BY s.doc_id""".stripMargin),

    // ---- L4 quality scoring (deterministic rule points) -----------------
    "text_quality" -> QueryDef(
      (s, d) => Tables.documents(s, d)
        .select(col("doc_id"), qualityScore.as("quality_score"))
        .orderBy(col("doc_id")),
      """WITH t AS (
        |  SELECT doc_id, text,
        |    list_filter(string_split(text, ' '), x -> x <> '') AS toks
        |  FROM documents)
        |SELECT doc_id,
        |  CAST((CASE WHEN length(text) BETWEEN 100 AND 1000 THEN 1 ELSE 0 END) +
        |  (CASE WHEN len(toks) >= 20 THEN 1 ELSE 0 END) +
        |  (CASE WHEN CAST(list_sum(list_transform(toks, x -> length(x))) AS DOUBLE) / len(toks)
        |        BETWEEN 3.0 AND 8.0 THEN 1 ELSE 0 END) +
        |  (CASE WHEN len(list_distinct(toks)) * 2 >= len(toks) THEN 1 ELSE 0 END) AS INT)
        |    AS quality_score
        |FROM t ORDER BY doc_id""".stripMargin),

    // ---- L4 language-ID heuristic (stopword scoring) --------------------
    "text_langid" -> QueryDef(
      (s, d) => Tables.documents(s, d).select(
        col("doc_id"), col("lang"),
        enScore.as("en_score"),
        when(enScore >= 2, "en").when(enScore === 1, "maybe_en")
          .otherwise("unknown").as("predicted"))
        .withColumn("is_match", col("predicted") === col("lang"))
        .orderBy(col("doc_id")),
      """WITH s AS (
        |  SELECT doc_id, lang,
        |    CAST(len(list_filter(string_split(text, ' '),
        |      t -> t IN ('the','a','and','of'))) AS INT) AS en_score
        |  FROM documents)
        |SELECT doc_id, lang, en_score,
        |  CASE WHEN en_score >= 2 THEN 'en'
        |       WHEN en_score = 1 THEN 'maybe_en'
        |       ELSE 'unknown' END AS predicted,
        |  (CASE WHEN en_score >= 2 THEN 'en'
        |        WHEN en_score = 1 THEN 'maybe_en'
        |        ELSE 'unknown' END) = lang AS is_match
        |FROM s ORDER BY doc_id""".stripMargin),

    // ---- L4 language-ID CONFUSION MATRIX vs the fixture's lang ground
    //      truth — the eval-harness view of text_langid (the
    //      simsearch_recall theme on the text axis): per (truth,
    //      predicted) cell count, one partial-agg shuffle over a
    //      handful of cells ------------------------------------------
    "text_langid_eval" -> QueryDef(
      (s, d) => Tables.documents(s, d)
        .select(col("lang"),
          when(enScore >= 2, "en").when(enScore === 1, "maybe_en")
            .otherwise("unknown").as("predicted"))
        .groupBy(col("lang"), col("predicted"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("lang"), col("predicted")),
      """WITH s AS (
        |  SELECT lang,
        |    CASE WHEN len(list_filter(string_split(text, ' '),
        |           t -> t IN ('the','a','and','of'))) >= 2 THEN 'en'
        |         WHEN len(list_filter(string_split(text, ' '),
        |           t -> t IN ('the','a','and','of'))) = 1 THEN 'maybe_en'
        |         ELSE 'unknown' END AS predicted
        |  FROM documents)
        |SELECT lang, predicted, COUNT(*) AS n
        |FROM s GROUP BY lang, predicted
        |ORDER BY lang, predicted""".stripMargin),

    // ---- L4 corpus token histogram (the classic word count) -------------
    "token_histogram" -> QueryDef(
      (s, d) => Tables.documents(s, d)
        .select(explode(split(col("text"), " ")).as("token"))
        .filter(col("token") =!= "")
        .groupBy(col("token"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("token"))
        .limit(20),
      """SELECT token, COUNT(*) AS n FROM (
        |  SELECT unnest(string_split(text, ' ')) AS token FROM documents)
        |WHERE token <> ''
        |GROUP BY token ORDER BY n DESC, token LIMIT 20""".stripMargin),

    // ---- L4 per-source corpus rollup ------------------------------------
    "corpus_by_source" -> QueryDef(
      (s, d) => Tables.documents(s, d)
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("total_chars"),
          countDistinct(col("lang")).as("n_langs"))
        .orderBy(col("source")),
      """SELECT source, COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS total_chars,
        |  COUNT(DISTINCT lang) AS n_langs
        |FROM documents GROUP BY source ORDER BY source""".stripMargin),

    // ---- L4b keyword extraction: top-3 distinctive tokens per doc by
    //      an integer tf·idf — score = tf · ((N·1000) div df), exact
    //      BIGINT arithmetic instead of log-idf (libm last bits are not
    //      a portable surface; the MONOTONE rarity weight N/df ranks
    //      identically to log(N/df) at fixed tf). Ties break on token.
    //      Plan: the tf and df aggregates both partially aggregate; the
    //      per-doc top-3 rank-filter plans as WindowGroupLimit, so
    //      candidate lists prune during the shuffle — the topk_per_group
    //      shape applied to tagging a corpus
    "text_keywords" -> QueryDef(
      (s, d) => {
        val docs = Tables.documents(s, d)
        val toks = docs.select(col("doc_id"),
          explode(graft.functions.WordShingles.word_ngrams(col("text"), 1))
            .as("token"))
        val tf = toks.groupBy(col("doc_id"), col("token"))
          .agg(count(lit(1)).as("tf"))
        val dfreq = toks.groupBy(col("token"))
          .agg(countDistinct(col("doc_id")).as("df"))
        val n = docs.agg(count(lit(1)).as("n_docs"))
        tf.join(dfreq, Seq("token")).crossJoin(n) // 1-row count side
          .withColumn("score", expr("tf * ((n_docs * 1000) div df)"))
          .withColumn("rank", row_number().over(
            org.apache.spark.sql.expressions.Window
              .partitionBy(col("doc_id"))
              .orderBy(col("score").desc, col("token"))))
          .filter(col("rank") <= 3)
          .select(col("doc_id"), col("rank"), col("token"), col("score"))
          .orderBy(col("doc_id"), col("rank"))
      },
      """WITH t AS (
        |  SELECT doc_id,
        |    unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS token
        |  FROM documents),
        |tf AS (SELECT doc_id, token, COUNT(*) AS tf FROM t GROUP BY 1, 2),
        |df AS (SELECT token, COUNT(DISTINCT doc_id) AS df FROM t GROUP BY 1),
        |n AS (SELECT COUNT(*) AS n_docs FROM documents),
        |r AS (
        |  SELECT tf.doc_id, tf.token,
        |    CAST(tf.tf * ((n.n_docs * 1000) // df.df) AS BIGINT) AS score,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY tf.doc_id
        |      ORDER BY tf.tf * ((n.n_docs * 1000) // df.df) DESC, tf.token)
        |      AS INT) AS rank
        |  FROM tf JOIN df USING (token) CROSS JOIN n)
        |SELECT doc_id, rank, token, score FROM r
        |WHERE rank <= 3 ORDER BY doc_id, rank""".stripMargin),

    // ---- L4 corpus-frequency commonness: a unigram-LM-style quality
    //      signal — the mean CORPUS frequency of a document's tokens
    //      (template/boilerplate text scores high, rare-token noise
    //      scores low). Unlike the per-document signals above, this is
    //      the two-pass join-against-corpus-statistics shape: pass 1
    //      reduces the corpus to its vocabulary frequency table
    //      (Heaps-law-sublinear in corpus size), pass 2 joins tokens
    //      back on it. Integer sums keep the score exact cross-engine —
    //      deliberately no log(): libm last bits are not a portable
    //      surface. At 100 TB the vocab table is the broadcast-or-
    //      shuffle decision AQE should own; the token explode is the
    //      irreducible linear pass ----------------------------------------
    "text_commonness" -> QueryDef(
      (s, d) => {
        // persisted: the exploded token stream feeds BOTH the vocabulary
        // count and the join back — without it the corpus scan + explode
        // runs twice (caching contract as in ext/Corpus: caller clears
        // cache between corpus-scale invocations; Verify/Bench do)
        val toks = Tables.documents(s, d)
          .select(col("doc_id"),
            explode(graft.functions.WordShingles.word_ngrams(col("text"), 1))
              .as("token"))
          .persist()
        val freq = toks.groupBy(col("token")).agg(count(lit(1)).as("freq"))
        toks.join(freq, Seq("token"))
          .groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_tokens"), sum(col("freq")).as("freq_sum"))
          .select(col("doc_id"), col("n_tokens"), col("freq_sum"),
            (col("freq_sum").cast("double") / col("n_tokens"))
              .as("avg_token_freq"))
          .orderBy(col("doc_id"))
      },
      """WITH t AS (
        |  SELECT doc_id,
        |    unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS token
        |  FROM documents),
        |f AS (SELECT token, COUNT(*) AS freq FROM t GROUP BY token)
        |SELECT doc_id, COUNT(*) AS n_tokens,
        |  CAST(SUM(freq) AS BIGINT) AS freq_sum,
        |  CAST(CAST(SUM(freq) AS VARCHAR) AS DOUBLE) / COUNT(*) AS avg_token_freq
        |FROM t JOIN f USING (token)
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin)
  )

  /** Code-vs-prose detection — the routing gate a mixed crawl needs
    * before prose-only quality rules (Gopher thresholds mis-score
    * source code) or code-only pipelines. Four integer signals per
    * document, each a counting regexp both engines evaluate
    * identically (no lookaround, RE2-safe): punctuation-symbol count,
    * brace/bracket/semicolon count, code-keyword hits, and
    * per-mille symbol density (×1000 div chars — no float). The
    * verdict is a pure threshold conjunction surfaced as BOOLEAN, so
    * the gate itself is hash-checked, not just its inputs. One narrow
    * scan, no shuffle before the sort. */
  def codeSignals(docs: DataFrame): DataFrame = {
    val txt = col("text")
    val chars = length(txt)
    val symbols = chars - length(regexp_replace(txt, "[{}()\\[\\];=<>+*/|&]", ""))
    val braces = chars - length(regexp_replace(txt, "[{};]", ""))
    val kws = size(expr(
      "regexp_extract_all(text, '\\\\b(def|class|return|import|function|var|let|const|public|void)\\\\b', 0)"))
    docs.select(col("doc_id"), chars.as("n_chars_t"),
        symbols.cast("long").as("n_symbols"),
        braces.cast("long").as("n_braces"),
        kws.cast("long").as("n_keywords"))
      .withColumn("symbol_permille",
        expr("CASE WHEN n_chars_t > 0 THEN (n_symbols * 1000) div n_chars_t ELSE 0 END"))
      .withColumn("looks_code",
        (col("symbol_permille") >= 40 && col("n_braces") >= 3) ||
          col("n_keywords") >= 3)
      .select(col("doc_id"), col("n_symbols"), col("n_braces"),
        col("n_keywords"), col("symbol_permille"), col("looks_code"))
      .orderBy(col("doc_id"))
  }

  val codeSignalsSql: String =
    """WITH t AS (
      |  SELECT doc_id, text, length(text) AS n_chars_t,
      |    length(text) - length(regexp_replace(text, '[{}()\[\];=<>+*/|&]', '', 'g'))
      |      AS n_symbols,
      |    length(text) - length(regexp_replace(text, '[{};]', '', 'g')) AS n_braces,
      |    len(regexp_extract_all(text,
      |      '\b(def|class|return|import|function|var|let|const|public|void)\b'))
      |      AS n_keywords
      |  FROM documents),
      |s AS (
      |  SELECT doc_id,
      |    CAST(n_symbols AS BIGINT) AS n_symbols,
      |    CAST(n_braces AS BIGINT) AS n_braces,
      |    CAST(n_keywords AS BIGINT) AS n_keywords,
      |    CASE WHEN n_chars_t > 0 THEN (n_symbols * 1000) // n_chars_t
      |         ELSE 0 END AS symbol_permille
      |  FROM t)
      |SELECT doc_id, n_symbols, n_braces, n_keywords,
      |  CAST(symbol_permille AS BIGINT) AS symbol_permille,
      |  ((symbol_permille >= 40 AND n_braces >= 3) OR n_keywords >= 3)
      |    AS looks_code
      |FROM s ORDER BY doc_id""".stripMargin

  /** Flesch reading-ease in integer fixed-point — the classic document
    * difficulty score next to the Gopher/quality filters: sentences =
    * terminator runs (min 1), syllables = vowel-group runs per the
    * standard heuristic, and the score's two ratio terms are integer
    * divisions in milli-units — `206835 − (1015·w) div s − (84600·sy) div w`
    * (milli-points; each term one exact `div`), so the surfaced milli-score is
    * bit-identical cross-engine (the readability twin of
    * `text_code_detect`'s permille discipline). Narrow per-row regex
    * counting; simple character-class regexes mean Java and RE2 agree. */
  def readability(docs: DataFrame): DataFrame = {
    val words = expr(
      "size(regexp_extract_all(text, '[A-Za-z]+', 0))").cast("long")
    val sentences = greatest(lit(1L), expr(
      "size(regexp_extract_all(text, '[.!?]+', 0))").cast("long"))
    val syllables = expr(
      "size(regexp_extract_all(text, '[aeiouyAEIOUY]+', 0))").cast("long")
    docs.select(col("doc_id"), words.as("n_words"),
        sentences.as("n_sentences"), syllables.as("n_syllables"))
      .withColumn("score_milli",
        when(col("n_words") > 0,
          lit(206835L) - expr("(1015 * n_words) div n_sentences")
            - expr("(84600 * n_syllables) div n_words"))
          .otherwise(lit(0L)))
      .orderBy(col("doc_id"))
  }

  val readabilitySql: String =
    """WITH t AS (
      |  SELECT doc_id,
      |    CAST(len(regexp_extract_all(text, '[A-Za-z]+')) AS BIGINT) AS n_words,
      |    GREATEST(1, CAST(len(regexp_extract_all(text, '[.!?]+')) AS BIGINT))
      |      AS n_sentences,
      |    CAST(len(regexp_extract_all(text, '[aeiouyAEIOUY]+')) AS BIGINT)
      |      AS n_syllables
      |  FROM documents)
      |SELECT doc_id, n_words, n_sentences, n_syllables,
      |  CASE WHEN n_words > 0
      |       THEN 206835 - (1015 * n_words) // n_sentences
      |                   - (84600 * n_syllables) // n_words
      |       ELSE 0 END AS score_milli
      |FROM t ORDER BY doc_id""".stripMargin

  private val q3: Seq[(String, QueryDef)] = Seq(
    "text_code_detect" -> QueryDef(
      (s, d) => codeSignals(Tables.documents(s, d)),
      Some(codeSignalsSql)),
    "text_readability" -> QueryDef(
      (s, d) => readability(Tables.documents(s, d)),
      Some(readabilitySql)))

  /** Zipf-law diagnostic over the corpus vocabulary: rank·frequency for
    * the head of the distribution. Under Zipf, r·f is near-constant —
    * its drift across the head is the readout (synthetic/templated
    * corpora flatten it, natural text holds it), and it needs NO log-log
    * regression, so the whole surface stays integer (slope fitting would
    * mean libm log on the comparison surface — the text_commonness
    * veto). Rank = row_number over the VOCABULARY relation
    * (Heaps-sublinear; the only window in the op), ties broken
    * lexically; share in floor basis points of total token mass. */
  def zipfHead(docs: DataFrame, topK: Int = 30): DataFrame = {
    val toks = docs.select(
      explode(filter(split(col("text"), " "), t => t =!= "")).as("token"))
    val freq = toks.groupBy(col("token")).agg(count(lit(1)).as("freq"))
    val tot = freq.agg(sum(col("freq")).as("total"))
    freq
      .withColumn("rank", row_number().over(
        Window.orderBy(col("freq").desc, col("token"))).cast("long"))
      .filter(col("rank") <= topK)
      .crossJoin(broadcast(tot))
      .select(col("rank"), col("token"), col("freq"),
        (col("rank") * col("freq")).as("rf"),
        expr("freq * 10000L div total").as("share_bp"))
      .orderBy(col("rank"))
  }

  def zipfHeadSql(topK: Int = 30): String =
    s"""WITH t AS (
      |  SELECT unnest(list_filter(string_split(text, ' '), x -> x <> ''))
      |    AS token
      |  FROM documents),
      |f AS (SELECT token, COUNT(*) AS freq FROM t GROUP BY token),
      |tot AS (SELECT CAST(SUM(freq) AS BIGINT) AS total FROM f),
      |r AS (
      |  SELECT token, freq,
      |    ROW_NUMBER() OVER (ORDER BY freq DESC, token) AS rank
      |  FROM f)
      |SELECT rank, token, freq, rank * freq AS rf,
      |  freq * 10000 // total AS share_bp
      |FROM r CROSS JOIN tot WHERE rank <= $topK
      |ORDER BY rank""".stripMargin

  /** Token burstiness (Church & Gale shape): collection frequency over
    * document frequency — cf/df ≈ 1 for function words spread evenly,
    * high for topical terms that clump. The signal behind stopword-vs-
    * content routing and keyword weighting, exact as 1000·cf div df.
    * One explode feeds BOTH counts via a (token, doc_id) pre-distinct;
    * both aggregates are over the vocabulary relation; head by
    * (burstiness, token) with df ≥ 5 so single-doc noise can't top the
    * table. */
  def burstiness(docs: DataFrame, topK: Int = 30, minDf: Int = 5): DataFrame = {
    val toks = docs.select(col("doc_id"),
      explode(filter(split(col("text"), " "), t => t =!= "")).as("token"))
    val cf = toks.groupBy(col("token")).agg(count(lit(1)).as("cf"))
    val df = toks.select(col("token"), col("doc_id")).distinct()
      .groupBy(col("token")).agg(count(lit(1)).as("df"))
    cf.join(df, Seq("token"))
      .filter(col("df") >= minDf)
      .select(col("token"), col("cf"), col("df"),
        expr("cf * 1000L div df").as("burst_milli"))
      .orderBy(col("burst_milli").desc, col("token"))
      .limit(topK)
  }

  def burstinessSql(topK: Int = 30, minDf: Int = 5): String =
    s"""WITH t AS (
      |  SELECT doc_id,
      |    unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS token
      |  FROM documents),
      |cf AS (SELECT token, COUNT(*) AS cf FROM t GROUP BY token),
      |df AS (SELECT token, COUNT(*) AS df
      |       FROM (SELECT DISTINCT token, doc_id FROM t) GROUP BY token)
      |SELECT cf.token, cf.cf, df.df, cf.cf * 1000 // df.df AS burst_milli
      |FROM cf JOIN df USING (token)
      |WHERE df.df >= $minDf
      |ORDER BY burst_milli DESC, cf.token LIMIT $topK""".stripMargin

  private val q4: Seq[(String, QueryDef)] = Seq(
    "text_zipf" -> QueryDef(
      (s, d) => zipfHead(Tables.documents(s, d)), Some(zipfHeadSql())),
    "text_burstiness" -> QueryDef(
      (s, d) => burstiness(Tables.documents(s, d)), Some(burstinessSql())))

  def queries: Seq[(String, QueryDef)] = q ++ q3 ++ q4
}
