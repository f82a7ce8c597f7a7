package graft.ext

import graft.SparkSuite

/** Collocations + bigram LM scoring (ext/Ngrams): hand-computed counts
  * on a tiny corpus, the fixed-point integer contract (bit-identical
  * across partitionings), and edge handling for short documents. */
class NgramsSpec extends SparkSuite {
  import spark.implicits._

  private def docs(rows: (Long, String)*) =
    rows.toDF("doc_id", "text")

  /** Corpus: "a b a b" + "a c".
    * Tokens: a×3, b×2, c×1, N_tok = 6.
    * Bigrams: (a,b)×2, (b,a)×1, (a,c)×1; histories: a→3, b→1; V = 3. */
  test("collocations: hand-computed conditional lift, support floor") {
    val d = docs(1L -> "a b a b", 2L -> "a c")
    val got = Ngrams.collocations(d, minSupport = 1L, k = 10)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    // lift_fp = c_ab * 6 * 1e6 div (c_a * c_b)
    // (a,c): 1*6e6 div (3*1) = 2_000_000   — c is rare, travels with a
    // (b,a): 1*6e6 div (2*3) = 1_000_000
    // (a,b): 2*6e6 div (3*2) = 2_000_000
    assert(got.toSeq == Seq(
      ("a", "b", 2L, 2000000L), // tie with (a,c) breaks on (w1, w2)
      ("a", "c", 1L, 2000000L),
      ("b", "a", 1L, 1000000L)))
  }

  test("collocations: support floor prunes singleton pairs") {
    val d = docs(1L -> "a b a b", 2L -> "a c")
    val got = Ngrams.collocations(d, minSupport = 2L, k = 10)
      .collect().map(r => (r.getString(0), r.getString(1)))
    assert(got.toSeq == Seq(("a", "b")))
  }

  /** P(b|a) = (c_ab+1)·1e9 div (c_hist+V):
    * (a,b): (2+1)·1e9 div (3+3) = 500_000_000
    * (b,a): (1+1)·1e9 div (1+3) = 500_000_000
    * (a,c): (1+1)·1e9 div (3+3) = 333_333_333
    * doc 1 mean = 5e8; doc 2 mean = 333_333_333. */
  test("lm score: hand-computed add-one smoothed means") {
    val d = docs(1L -> "a b a b", 2L -> "a c")
    val got = Ngrams.lmScore(d).collect()
      .map(r => (r.getLong(0), r.getLong(1), if (r.isNullAt(2)) -1L else r.getLong(2)))
    assert(got.toSeq == Seq(
      (1L, 3L, 500000000L),
      (2L, 1L, 333333333L)))
  }

  test("lm score: a one-token document surfaces with zero bigrams, NULL score") {
    val d = docs(1L -> "a b", 2L -> "x")
    val got = Ngrams.lmScore(d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.isNullAt(2)))
    assert(got.toSeq == Seq((1L, 1L, false), (2L, 0L, true)))
  }

  /** Corpus: doc 1 (en) "a a b", doc 2 (de) "c c a".
    * N_s=6, V=3, N_t=3; c_s: a=3,b=1,c=2; c_t: a=2,b=1.
    * r_fp(w) = (c_t+1)·9e6 div ((c_s+1)·6):
    * a → 1_125_000, b → 1_500_000, c → 500_000.
    * doc 1 mean = 1_250_000; doc 2 mean = 708_333. */
  test("dsir: hand-computed importance ratios rank the target-like doc first") {
    val d = Seq((1L, "a a b", "en"), (2L, "c c a", "de"))
      .toDF("doc_id", "text", "lang")
    val got = Ngrams.dsirSelect(d, targetLang = "en", k = 10)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == Seq(
      (1L, "en", 3L, 1250000L),
      (2L, "de", 3L, 708333L)))
  }

  /** The cross-engine contract: integer fixed-point makes both ops
    * bit-identical at any parallelism (double arithmetic would drift
    * with aggregation order). */
  test("fixture: both ops are bit-identical across partitionings") {
    val base = spark.read.parquet(s"$sfDir/documents.parquet")
    def run(parts: Int) = {
      val d = base.repartition(parts)
      (Ngrams.collocations(d).collect().toSeq,
        Ngrams.lmScore(d).collect().toSeq,
        Ngrams.dsirSelect(d, k = 20).collect().toSeq)
    }
    assert(run(1) == run(8))
  }
}
