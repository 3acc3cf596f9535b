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

  /** Deterministic tiny image fixture: solid-color w×h, encoded in-test via
    * the same JDK ImageIO the engine decodes with.
    */
  private def encodedImage(w: Int, h: Int, format: String): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var x = 0
    while (x < w) { var y = 0; while (y < h) { img.setRGB(x, y, 0x336699); y += 1 }; x += 1 }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, format, bos)
    bos.toByteArray
  }

  private def media(rows: (Long, String, Array[Byte])*) =
    rows.toSeq.map { case (id, mime, bytes) => MediaRecord(id, mime, bytes) }.toDS()

  test("imageMeta: real javax.imageio dimensions for PNG/JPEG payloads") {
    val png  = encodedImage(17, 9, "png")
    val jpeg = encodedImage(3, 5, "jpg")
    val meta = Multimodal.imageMeta(media(
        (1L, "image/png", png), (2L, "image/jpeg", jpeg)))
      .collect().map(m => m.media_id -> m).toMap
    assert((meta(1L).width, meta(1L).height) === ((17, 9)))
    assert((meta(2L).width, meta(2L).height) === ((3, 5)))
    assert(meta(1L).n_bytes === png.length.toLong)
  }

  test("imageMeta: corrupt image payload falls back to the deterministic stub") {
    val broken = encodedImage(17, 9, "png").take(12) // valid magic, truncated header
    val meta = Multimodal.imageMeta(media((1L, "image/png", broken))).collect().head
    assert(meta.width >= 640 && meta.height >= 360) // stub range, no exception
  }

  test("resize: real decode + scale + PNG re-encode for image payloads") {
    val src = encodedImage(17, 9, "png")
    val out = Multimodal.resize(media((1L, "image/png", src)), 8, 4).collect().head
    assert(out.mime === "image/png")
    val back = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(out.content))
    assert((back.getWidth, back.getHeight) === ((8, 4)))
  }

  test("imageMeta: deterministic stub decode for non-image payloads, byte counts real") {
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
