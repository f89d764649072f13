package graft.operators

import graft.SparkSpec

/** The REAL image codec path (javax.imageio): encode→decode round trip,
  * pixel-grid features, and the corrupt-payload contract (a bad payload
  * yields a sentinel row, never an exception — a 100 TB scan must not die
  * on one truncated file).
  */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("PNG round trip recovers exact dimensions; features are pixel-true") {
    val ids = Seq(3L, 57L, 123L)
    val media = ids.toDS().map(id => Multimodal.MediaRow(id, Multimodal.syntheticPng(id)))
    val meta = Multimodal.decodeImages(media).collect().map(m => m.doc_id -> m).toMap
    ids.foreach { id =>
      assert(meta(id).width === (id % 50).toInt + 8)
      assert(meta(id).height === (id % 30).toInt + 8)
      assert(meta(id).n_frames === 1)
    }
    // feature 0 samples grid cell (0,0): pixel (w/8, h/8), gray (id+x+y)%256
    val feats = Multimodal.imageFeatures(media).collect().map(f => f.doc_id -> f.features).toMap
    ids.foreach { id =>
      val (w, h) = ((id % 50).toInt + 8, (id % 30).toInt + 8)
      val (x, y) = (math.min(w - 1, w / 8), math.min(h - 1, h / 8))
      val expected = ((id + x + y) % 256).toDouble / 255.0
      assert(math.abs(feats(id)(0) - expected) < 1e-12, s"doc $id feature 0")
    }
  }

  test("corrupt payloads decode to the sentinel, never throw") {
    val media = Seq(
      Multimodal.MediaRow(1L, Multimodal.syntheticPng(1L)),
      Multimodal.MediaRow(2L, Array[Byte](1, 2, 3, 4)),          // not an image
      Multimodal.MediaRow(3L, Multimodal.syntheticPng(9L).take(10))) // truncated
      .toDS()
    val meta = Multimodal.decodeImages(media).collect().map(m => m.doc_id -> m).toMap
    assert(meta(1L).width > 0)
    assert(meta(2L).width === -1 && meta(2L).n_frames === 0)
    assert(meta(3L).width === -1)
    // features simply skip undecodable rows
    assert(Multimodal.imageFeatures(media).collect().map(_.doc_id).toSeq === Seq(1L))
  }
}
