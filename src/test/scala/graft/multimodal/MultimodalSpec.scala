package graft.multimodal

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq((1L, "hello world"), (2L, "héllo wörld")).toDF("doc_id", "text")

  test("byteStats: UTF-8 byte length vs char length") {
    val m = Multimodal.byteStats(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), (r.getInt(1), r.getInt(2)))).toMap
    assert(m(1L) === ((11, 11)))
    assert(m(2L) === ((13, 11))) // two 2-byte chars
  }

  test("imageMeta: deterministic stub decode, byte counts real") {
    val meta = Multimodal.imageMeta(Multimodal.asMedia(docs, "doc_id", "text"))
      .collect().map(m => m.media_id -> m).toMap
    assert(meta(1L).n_bytes === 11L)
    assert(meta(1L).width >= 640 && meta(1L).height >= 360)
    // determinism: same payload → same fake dims + hash
    val again = Multimodal.imageMeta(Multimodal.asMedia(docs, "doc_id", "text"))
      .collect().map(m => m.media_id -> m).toMap
    assert(meta(1L) === again(1L))
  }

  test("features: fixed dim, deterministic per payload") {
    val f = Multimodal.features(Multimodal.asMedia(docs, "doc_id", "text"), dim = 8)
      .collect().map(x => x.media_id -> x.feature.toSeq).toMap
    assert(f(1L).length === 8)
    val again = Multimodal.features(Multimodal.asMedia(docs, "doc_id", "text"), dim = 8)
      .collect().map(x => x.media_id -> x.feature.toSeq).toMap
    assert(f === again)
  }

  test("frameSamples: every Nth frame, frame count from payload size") {
    val big = Seq((1L, "x" * 5000)).toDF("doc_id", "text") // 5000 bytes → 5 frames
    val frames = Multimodal.frameSamples(Multimodal.asMedia(big, "doc_id", "text"),
      everyN = 2, dim = 4).collect()
    assert(frames.map(_.frame_index).sorted.toSeq === Seq(0, 2, 4))
  }

  test("resize: deterministic fake payload sized from target dims, metadata preserved") {
    val resized = Multimodal.resize(Multimodal.asMedia(docs, "doc_id", "text"), 64, 64)
      .collect().map(m => m.media_id -> m).toMap
    assert(resized(1L).content.length === 64)   // 64*64/64
    assert(resized(1L).mime === "image/png")
    val again = Multimodal.resize(Multimodal.asMedia(docs, "doc_id", "text"), 64, 64)
      .collect().map(m => m.media_id -> m.content.toSeq).toMap
    assert(resized(1L).content.toSeq === again(1L))
  }
}
