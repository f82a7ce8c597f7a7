package graft.ext

import graft.SparkSuite

/** Batch perceptron (ext/Classifier): hand-computed epochs and the
  * integer formulation's bit-equality across partitionings. */
class ClassifierSpec extends SparkSuite {
  import spark.implicits._

  private def feats(rows: (Long, Long, Long, Long, Long, Long)*) =
    rows.toDF("doc_id", "x0", "x1", "x2", "x3", "y")

  test("epochs match the hand computation") {
    // two rows: (+1, x=[1,2,0,0]) and (-1, x=[1,1,0,0])
    val f = feats((1L, 1L, 2L, 0L, 0L, 1L), (2L, 1L, 1L, 0L, 0L, -1L))
    val got = Classifier.trainPerceptron(f, 3)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // epoch 1: w=0 → both margins 0 → errs 2, w = (+1)(1,2)+(-1)(1,1) = (0,1)
    assert(got(0) === (1, 2L, 0L, 1L))
    // epoch 2: w=(0,1): row1 m=+2 ok, row2 m=-1·(1)=−1 ≤0 err → w=(−1,0)
    assert(got(1) === (2, 1L, -1L, 0L))
    // epoch 3: w=(−1,0): row1 m=−1 err; row2 m=+1 ok → w=(0,2)
    assert(got(2) === (3, 1L, 0L, 2L))
  }

  test("hash features: buckets and signs match a driver-side md5 recompute; " +
      "repeated tokens accumulate") {
    val docs = Seq((1L, "alpha beta alpha"), (2L, "gamma"))
      .toDF("doc_id", "text")
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def expect(tokens: Seq[String]): Map[Long, Long] =
      tokens.foldLeft(Map.empty[Long, Long].withDefaultValue(0L)) { (m, w) =>
        val h = md5hex(w)
        val b = java.lang.Long.parseLong(h.substring(0, 8), 16) % 64
        val s = if (java.lang.Long.parseLong(h.substring(8, 9), 16) % 2 == 0) 1L else -1L
        m.updated(b, m(b) + s)
      }.filter(_._2 != 0L)
    val want =
      expect(Seq("alpha", "beta", "alpha")).map { case (b, w) => (1L, b, w) }.toSet ++
        expect(Seq("gamma")).map { case (b, w) => (2L, b, w) }.toSet
    val got = Classifier.hashFeatures(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == want)
  }

  test("training is bit-identical across partitionings") {
    val docs = graft.core.Tables.documents(spark, sfDir)
    def run(parts: Int) =
      Classifier.trainPerceptron(
        Classifier.features(docs.repartition(parts)), 3)
        .collect().map(_.toSeq).toSeq
    assert(run(1) === run(8))
  }

  test("aucOf matches the brute-force pair count, ties at half credit") {
    // scores with a tie straddling both classes: pos scores {3, 2, 2},
    // neg scores {2, 1}. Pairs (pos, neg): (3,2)+ (3,1)+ (2,2)½ (2,1)+
    // (2,2)½ (2,1)+ → concordant 4, tied 2 → AUC = (4 + 2·½)/6 = 5/6
    val scored = Seq((3L, 1L), (2L, 1L), (2L, 1L), (2L, 0L), (1L, 0L))
      .toDF("s", "pos")
    val r = Classifier.aucOf(scored).head()
    assert((r.getLong(0), r.getLong(1)) === (3L, 2L))
    assert(r.getLong(2) === 10000L * 5 / 6) // floor(8333.33) = 8333
  }

  test("aucOf: perfect separation gives 10000, reversal gives 0") {
    val perfect = Seq((9L, 1L), (8L, 1L), (2L, 0L), (1L, 0L)).toDF("s", "pos")
    assert(Classifier.aucOf(perfect).head().getLong(2) === 10000L)
    val reversed = Seq((1L, 1L), (2L, 1L), (8L, 0L), (9L, 0L)).toDF("s", "pos")
    assert(Classifier.aucOf(reversed).head().getLong(2) === 0L)
  }

  test("aucOf is bit-identical across partitionings") {
    val scored = (1 to 500).map(i => ((i * 7 % 23).toLong, (i % 3 min 1).toLong))
    def run(parts: Int) =
      Classifier.aucOf(scored.toDF("s", "pos").repartition(parts))
        .collect().map(_.toSeq).toSeq
    assert(run(1) === run(8))
  }

  test("separable one-feature data reaches zero errors") {
    // y = +1 iff x1 ≥ 3; bias + x1 separate it
    val f = feats(
      (1L, 1L, 5L, 0L, 0L, 1L), (2L, 1L, 4L, 0L, 0L, 1L),
      (3L, 1L, 1L, 0L, 0L, -1L), (4L, 1L, 0L, 0L, 0L, -1L))
    val errs = Classifier.trainPerceptron(f, 12)
      .collect().map(r => r.getLong(1))
    assert(errs.last === 0L, s"perceptron must converge on separable data: ${errs.toSeq}")
  }
}
