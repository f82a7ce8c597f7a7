package graft.ext

import graft.SparkSuite

/** Multimodal plumbing: schema, determinism, partition-wise extraction. */
class MultimodalSpec extends SparkSuite {

  test("media table: binary payload + typed metadata, stable schema") {
    val m = Multimodal.mediaTable(spark, sfDir)
    assert(m.schema.fieldNames.toSeq ==
      Seq("doc_id", "media_type", "n_bytes", "content"))
    val row = m.head()
    assert(row.content.nonEmpty && row.n_bytes == row.content.length)
    assert(Set("image", "audio", "video").contains(row.media_type))
  }

  test("decode stub is deterministic and fixed-width") {
    val bytes = "some media payload".getBytes("UTF-8")
    val a = Multimodal.decodeStub(bytes, 8)
    val b = Multimodal.decodeStub(bytes, 8)
    assert(a.toSeq == b.toSeq)
    assert(a.length == 8)
    assert(Multimodal.decodeStub("other".getBytes, 8).toSeq != a.toSeq)
  }

  test("feature extraction runs partition-wise and survives repartitioning") {
    val m = Multimodal.mediaTable(spark, sfDir)
    val f1 = Multimodal.extractFeatures(m).collect()
      .map(f => f.doc_id -> f.feature.toSeq).toMap
    val f2 = Multimodal.extractFeatures(m.repartition(7)).collect()
      .map(f => f.doc_id -> f.feature.toSeq).toMap
    assert(f1 == f2)
    assert(f1.values.forall(_.length == 8))
  }

  test("offset sampling: stride arithmetic on the binary column") {
    val s = Multimodal.sampleOffsets(Multimodal.mediaTable(spark, sfDir), 10)
      .collect()
    s.foreach { r =>
      val offs = r.getSeq[Int](2)
      assert(offs.head == 0 && offs.forall(_ % 10 == 0))
    }
  }
}
