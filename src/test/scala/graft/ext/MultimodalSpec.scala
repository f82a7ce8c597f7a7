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

  test("real image decode: PNG and BMP of the same raster give identical " +
      "features with true dimensions") {
    import java.awt.image.BufferedImage
    // 7×5 deterministic raster: pixel = f(x, y), all channels exercised
    val img = new BufferedImage(7, 5, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 5; x <- 0 until 7)
      img.setRGB(x, y, ((x * 36) << 16) | ((y * 51) << 8) | (x * y * 7))
    def encoded(fmt: String): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, fmt, bos), s"no $fmt writer")
      bos.toByteArray
    }
    val spark0 = spark
    import spark0.implicits._
    val media = Seq(
      Multimodal.MediaRow(1L, "image", encoded("png").length, encoded("png")),
      Multimodal.MediaRow(2L, "image", encoded("bmp").length, encoded("bmp")),
      // not an image: must fall back to the stub, not throw
      Multimodal.MediaRow(3L, "image", 9, "not_a_png".getBytes("UTF-8")),
      // audio stays stubbed even if the payload IS a decodable image
      Multimodal.MediaRow(4L, "audio", encoded("png").length, encoded("png"))
    ).toDS()
    val f = Multimodal.extractFeatures(media).collect()
      .map(m => m.doc_id -> m.feature).toMap
    // true decoded dimensions + the "real decode" marker
    assert(f(1L)(0) == 7.0f && f(1L)(1) == 5.0f && f(1L)(7) == 1.0f)
    // channel means: x*36 over x=0..6 → mean 108; y*51 over y=0..4 → 102
    assert(f(1L)(3) == 108.0f && f(1L)(4) == 102.0f)
    // lossless formats of the same raster decode to the same pixels →
    // bit-identical features (incl. the pixel checksum)
    assert(f(1L).toSeq == f(2L).toSeq)
    // fallback and non-image rows use the stub (no marker semantics)
    assert(f(3L).toSeq == Multimodal.decodeStub("not_a_png".getBytes("UTF-8"), 8).toSeq)
    assert(f(4L).toSeq == Multimodal.decodeStub(encoded("png"), 8).toSeq)
  }

  test("synthetic image corpus: PNG round trip matches the closed form " +
      "including the pixel checksum the SQL oracle cannot state") {
    import org.apache.spark.sql.functions.col
    val media = Multimodal.syntheticImages(spark, sfDir)
      .filter(col("doc_id") < 100)
    val feats = Multimodal.extractFeatures(media).collect()
    assert(feats.nonEmpty)
    feats.foreach { m =>
      val id = m.doc_id
      val (w, h) = ((2 + id % 7).toInt, (2 + id % 5).toInt)
      val p = ((id % 256).toInt << 16) | ((id * 7 % 256).toInt << 8) |
        (id * 13 % 256).toInt
      var crc = 1L
      (0 until w * h).foreach(_ => crc = crc * 31 + p)
      val f = m.feature
      assert(f(0) == w.toFloat && f(1) == h.toFloat)
      assert(f(2) == ((crc >>> 16) & 0xFFFFFF).toFloat, s"checksum, id=$id")
      assert(f(3) == (id % 256).toFloat && f(4) == (id * 7 % 256).toFloat &&
        f(5) == (id * 13 % 256).toFloat)
      assert(f(7) == 1.0f, "real decode marker")
    }
  }

  test("synthetic audio corpus: WAV round trip through the real RIFF " +
      "parser matches the closed form") {
    import org.apache.spark.sql.functions.col
    val media = Multimodal.syntheticAudio(spark, sfDir)
      .filter(col("doc_id") < 100)
    val feats = Multimodal.extractFeatures(media).collect()
    assert(feats.nonEmpty)
    feats.foreach { m =>
      val id = m.doc_id
      val n = (64 + id % 128).toInt
      val samples = (0 until n).map(i => (id * 31 + i * 17) % 256 - 128)
      val f = m.feature
      assert(f(0) == n.toFloat && f(1) == 8000f && f(2) == 1f)
      assert(f(3) == samples.sum.toFloat, s"sum, id=$id")
      assert(f(4) == samples.map(s => s * s).sum.toFloat, s"sumsq, id=$id")
      assert(f(5) == samples.map(math.abs).max.toFloat)
      assert(f(7) == 1.0f, "real decode marker")
    }
  }

  test("audio decode: non-WAV bytes fall back to the stub, never throw") {
    assert(Multimodal.decodeAudio("definitely not RIFF".getBytes, 8).isEmpty)
    assert(Multimodal.decodeAudio(Array[Byte](), 8).isEmpty)
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
