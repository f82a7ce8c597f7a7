package graft.ext

import graft.SparkSuite

/** Span-level exact substring dedup (ext/Spans): positional-gram
  * duplicate islands and the keep-first-occurrence scrub. Hand-computed
  * corpora with w=3 keep the arithmetic checkable by eye. */
class SpansSpec extends SparkSuite {

  private def docs(rows: Seq[(Long, String)]) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  test("duplicatedSpans: shared run detected, maximal, both docs flagged") {
    // docs 0 and 1 share the 4-token run "a b c d" → 3-grams "a b c" and
    // "b c d" both duplicated → ONE maximal span per doc of 2 grams
    val d = docs(Seq(
      (0L, "a b c d x y z"),
      (1L, "p q a b c d w")))
    val out = Spans.duplicatedSpans(d, 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == Seq((0L, 1L, 4L, 2L), (1L, 3L, 6L, 2L)))
  }

  test("duplicatedSpans: disjoint repeats stay separate islands") {
    // "a b c" duplicated at positions 1 and 5 of doc 0 (self-repeat) —
    // non-adjacent, so two spans, and the within-doc repeat counts
    val d = docs(Seq((0L, "a b c q a b c")))
    val out = Spans.duplicatedSpans(d, 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == Seq((0L, 1L, 3L, 1L), (0L, 5L, 7L, 1L)))
  }

  test("duplicatedSpans: no duplicates, docs shorter than w → empty") {
    val d = docs(Seq((0L, "a b"), (1L, "all tokens distinct here"),
      (2L, "and entirely other words")))
    assert(Spans.duplicatedSpans(d, 3).count() == 0)
  }

  test("scrubSpans: first occurrence kept, later copy removed, counts add up") {
    val d = docs(Seq(
      (0L, "a b c d x y z"),
      (1L, "p q a b c d w")))
    val out = Spans.scrubSpans(d, 3).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    // doc 0 holds the global-first occurrences → untouched; doc 1 loses
    // tokens 3..6 ("a b c d")
    assert(out == Seq((0L, "a b c d x y z", 0L), (1L, "p q w", 4L)))
  }

  test("scrubSpans: exact-duplicate doc scrubs to empty, original intact") {
    val d = docs(Seq(
      (7L, "one two three four five"),
      (9L, "one two three four five")))
    val out = Spans.scrubSpans(d, 3).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(out == Seq((7L, "one two three four five", 0L), (9L, "", 5L)))
  }

  test("scrubSpans: whitespace-normalizing identity on clean docs") {
    val d = docs(Seq((0L, "  spaced   out    tokens  ")))
    val out = Spans.scrubSpans(d, 3).collect()
    assert(out.head.getString(1) == "spaced out tokens")
    assert(out.head.getLong(2) == 0L)
  }

  test("scrubSpans: self-repeat within one doc keeps only the first copy") {
    // "a b c" at pos 1 and pos 5: the pos-5 occurrence is non-canonical
    // → tokens 5..7 removed
    val d = docs(Seq((0L, "a b c q a b c")))
    val out = Spans.scrubSpans(d, 3).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(out == Seq((0L, "a b c q", 3L)))
  }

  test("fixture: spans exist, scrub conserves tokens, spans ⊇ scrub spans") {
    val d = graft.core.Tables.documents(spark, sfDir)
    val spans = Spans.duplicatedSpans(d).collect()
    assert(spans.nonEmpty, "fixture must contain duplicated spans at w=8")
    // every span within doc bounds and well-formed
    val lens = d.selectExpr("doc_id",
      "size(filter(split(text, ' '), x -> x <> '')) AS n").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    spans.foreach { r =>
      val (id, s, e) = (r.getLong(0), r.getLong(1), r.getLong(2))
      assert(s >= 1 && e >= s && e <= lens(id), s"span out of bounds: $r")
    }
    val scrub = Spans.scrubSpans(d).collect()
    assert(scrub.length == d.count(), "scrub returns every document")
    val removed = scrub.map(_.getLong(2)).sum
    assert(removed > 0, "fixture must scrub something")
    scrub.foreach { r =>
      val kept = r.getString(1) match {
        case "" => 0; case t => t.split(" ").length
      }
      assert(kept + r.getLong(2) == lens(r.getLong(0)),
        s"token conservation violated for doc ${r.getLong(0)}")
    }
  }

  /** MOSS pair mining: a long passage copied between two documents in
    * an otherwise-unrelated corpus must surface exactly that pair. */
  test("winnowing pairs: a copied passage surfaces the plagiarized pair only") {
    import spark.implicits._
    val passage = ('a' to 'z').map(c => s"$c$c$c$c$c").mkString(" ") // 155 chars
    def noise(seed: Int) = (0 until 30)
      .map(i => f"w${(seed * 131 + i * 17) % 9973}%04d").mkString(" ")
    val docs = Seq(
      (1L, s"${noise(1)} $passage ${noise(2)}"),
      (2L, s"${noise(3)} ${noise(4)} $passage"),
      (3L, noise(5)), (4L, noise(6))
    ).toDF("doc_id", "text")
    val pairs = TextOps.winnowPairs(docs, k = 8, w = 16, maxDf = 2, minShared = 3L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(pairs.map(p => (p._1, p._2)).toSeq === Seq((1L, 2L)),
      s"expected only the plagiarized pair, got ${pairs.toSeq}")
    assert(pairs.head._3 >= 3, s"shared-fragment count too low: ${pairs.head}")
  }

  /** Winnowing's dedup guarantee (Schleimer et al. SIGMOD'03): two
    * documents sharing a normalized substring of length ≥ k + w − 1
    * share at least one fingerprint value — regardless of where the
    * substring sits in either document. */
  test("winnowing: a shared >= k+w-1 substring forces a shared fingerprint") {
    import spark.implicits._
    val shared = "the quick brown fox jumps over the lazy dog tonight"
    val docs = Seq(
      (1L, s"aaaa bbbb cccc $shared dddd eeee"),
      (2L, s"zzzz yyyy qqqq rrrr ssss tttt $shared uuuu")
    ).toDF("doc_id", "text")
    val fp = TextOps.winnowFingerprints(docs, k = 8, w = 16).collect()
      .map(r => r.getLong(0) -> r.getLong(2))
    val f1 = fp.collect { case (1L, f) => f }.toSet
    val f2 = fp.collect { case (2L, f) => f }.toSet
    assert((f1 intersect f2).nonEmpty,
      s"no shared fingerprint despite a ${shared.length}-char shared substring")
  }

  test("winnowing: short docs yield nothing; uniform text selects every " +
      "window's leftmost min; fixture gaps never exceed w") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val docs = Seq((1L, "tiny"), (2L, "a" * 30)).toDF("doc_id", "text")
    val got = TextOps.winnowFingerprints(docs, k = 8, w = 16).collect()
    assert(!got.exists(_.getLong(0) == 1L), "sub-k doc must yield no rows")
    // 30 a's → 23 identical k-gram hashes → 8 windows, each selecting
    // its own start (leftmost tie-break) → positions exactly 1..8
    val d2 = got.filter(_.getLong(0) == 2L)
    assert(d2.map(_.getInt(1)).toSeq.sorted === (1 to 8),
      s"uniform-text positions: ${d2.map(_.getInt(1)).toSeq}")
    assert(d2.map(_.getLong(2)).distinct.length === 1)
    // density on the fixture: consecutive selections within one doc are
    // never more than w apart (every window selects SOMETHING)
    val fixture = TextOps.winnowFingerprints(
      graft.core.Tables.documents(spark, sfDir), k = 8, w = 16)
      .select(col("doc_id"), col("pos")).collect()
      .groupBy(_.getLong(0)).values
    fixture.foreach { rows =>
      val ps = rows.map(_.getInt(1)).sorted
      ps.sliding(2).foreach {
        case Array(a, b) => assert(b - a <= 16, s"gap $a→$b exceeds w")
        case _ =>
      }
    }
  }

  test("sentence dedup: only cross-doc shared sentences count; " +
      "within-doc repeats alone stay unique") {
    import spark.implicits._
    val docs = Seq(
      (1L, "shared line. own one! own two?"),
      (2L, "shared line. different here."),
      (3L, "solo text. solo text."), // repeated WITHIN one doc only
      (4L, "wholly original."))
      .toDF("doc_id", "text")
    val got = Spans.sentenceDedupReport(docs)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got(1L) === ((3L, 1L, 3333L)))
    assert(got(2L) === ((2L, 1L, 5000L)))
    assert(got(3L) === ((2L, 0L, 0L)), "within-doc repeat is not cross-doc")
    assert(got(4L) === ((1L, 0L, 0L)))
  }
}
