package graft

import graft.operators.Multimodal
import graft.operators.Multimodal.MediaAsset

/** Multimodal binary-column plumbing: schema contract, deterministic
  * stub decode, frame sampling shape (SURVEY §3.3).
  */
class MultimodalSpec extends SparkSuite {
  import spark.implicits._

  private def asset(id: Long, size: Int): MediaAsset =
    MediaAsset(id, "image", Array.tabulate(size)(i => (i % 251).toByte))

  test("extractFeatures: typed schema, stable hash, frame count from bytes") {
    val ds = Seq(asset(1L, 1000), asset(2L, 10), asset(3L, 0)).toDS()
    val out = Multimodal.extractFeatures(ds).collect().sortBy(_.asset_id)
    assert(out.map(_.byte_len).toSeq == Seq(1000L, 10L, 0L))
    assert(out.map(_.n_frames).toSeq == Seq(4, 1, 1)) // ceil(1000/256)=4
    assert(out.forall(_.features.length == Multimodal.FeatureDim))
    assert(out(0).content_hash.length == 32)

    // deterministic: same bytes -> same hash and features
    val again = Multimodal.extractFeatures(ds).collect().sortBy(_.asset_id)
    assert(again.map(_.content_hash).toSeq == out.map(_.content_hash).toSeq)
    assert(again(0).features.toSeq == out(0).features.toSeq)
  }

  test("sampleFrames: stride + cap, frame bytes sliced at the right offsets") {
    val ds = Seq(asset(7L, 1000)).toDS()
    val frames = Multimodal.sampleFrames(ds, stride = 2, maxFrames = 10)
      .as[(Long, Int, Array[Byte])].collect().sortBy(_._2)
    assert(frames.map(_._2).toSeq == Seq(0, 2)) // frames 0..3, stride 2
    assert(frames(0)._3.length == Multimodal.FrameBytes)
    assert(frames(1)._3.head == asset(7L, 1000).media(2 * Multimodal.FrameBytes))
  }

  test("documentFeatures wires the documents table shape end-to-end") {
    val docs = Seq((1L, "hello world"), (2L, "")).toDF("doc_id", "text")
    val out = Multimodal.documentFeatures(spark, docs).collect().sortBy(_.asset_id)
    assert(out(0).byte_len == 11L)
    assert(out(0).content_hash.length == 32)
    assert(out(1).byte_len == 0L)
  }
}
