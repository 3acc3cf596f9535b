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

  test("features: REAL pixel math on a decodable payload — exact channel means + histogram") {
    // solid 0x336699: mean_r=51, mean_g=102, mean_b=153 exactly;
    // lum = (51*299 + 102*587 + 153*114)/1000 = 92 -> bin 92*8/256 = 2
    val f = Multimodal.features(media((1L, "image/png", encodedImage(17, 9, "png"))), dim = 11)
      .collect().head.feature.toSeq
    assert(f === Seq[Float](51f, 102f, 153f, 0f, 0f, 1f, 0f, 0f, 0f, 0f, 0f))
  }

  test("syntheticMedia: PNG round trip is lossless — decoded features equal the closed form") {
    val ids = Seq((7L, ""), (123456L, "")).toDF("doc_id", "text")
    val got = Multimodal.features(
        Multimodal.syntheticMedia(ids, "doc_id", 24, 16), dim = 11)
      .collect().map(x => x.media_id -> x.feature.toSeq).toMap
    def expect(id: Long): Seq[Float] = {
      var sr = 0L; var sg = 0L; var sb = 0L
      val hist = new Array[Long](8)
      for (x <- 0 until 24; y <- 0 until 16) {
        val r = math.floorMod(id * 31 + x * 7 + y * 13, 256L).toInt
        val g = math.floorMod(id * 17 + x * 11 + y * 5, 256L).toInt
        val b = math.floorMod(id * 29 + x * 3 + y * 19, 256L).toInt
        sr += r; sg += g; sb += b
        hist((r * 299 + g * 587 + b * 114) / 1000 * 8 / 256) += 1
      }
      (Array(sr / 384.0, sg / 384.0, sb / 384.0) ++ hist.map(_ / 384.0)).map(_.toFloat).toSeq
    }
    assert(got(7L) === expect(7L))
    assert(got(123456L) === expect(123456L))
  }

  test("frameSamples: REAL frame count and per-frame features for decodable payloads") {
    // a still PNG has exactly 1 real frame (not bytes/1024+1), with the real feature
    val png = Multimodal.frameSamples(
        media((1L, "image/png", encodedImage(17, 9, "png"))), everyN = 1, dim = 11)
      .collect()
    assert(png.map(_.frame_index).toSeq === Seq(0))
    assert(png.head.feature.toSeq === Seq[Float](51f, 102f, 153f, 0f, 0f, 1f, 0f, 0f, 0f, 0f, 0f))
    // animated GIF: real frame count from the container, one feature per frame
    val gif = animatedGif(Seq(0xFF0000, 0x00FF00, 0x0000FF, 0xFFFFFF))
    val frames = Multimodal.frameSamples(media((2L, "image/gif", gif)), everyN = 2, dim = 11)
      .collect().sortBy(_.frame_index)
    assert(frames.map(_.frame_index).toSeq === Seq(0, 2))
    // frame 0 is solid red in GIF's 256-color space: mean_r near 255, mean_g/b 0
    assert(frames(0).feature(0) > 200f && frames(0).feature(1) < 50f)
  }

  test("frameSamples refuses a non-positive stride up front — everyN = 0 " +
       "used to throw `by 0` INSIDE an executor task") {
    val e = intercept[IllegalArgumentException] {
      Multimodal.frameSamples(
        media((1L, "image/png", encodedImage(4, 4, "png"))), everyN = 0, dim = 8)
    }
    assert(e.getMessage.contains("positive"), e.getMessage)
  }

  test("audioMeta never emits negative counts: an AU header with the " +
       "streaming unknown-size marker clamps to zero, stays decoded") {
    // hand-built AU header: ".snd", offset 24, dataSize 0xFFFFFFFF
    // (= unknown / streaming), encoding 3 (16-bit linear PCM), 8 kHz, mono
    val bb = java.nio.ByteBuffer.allocate(24 + 8)
      .order(java.nio.ByteOrder.BIG_ENDIAN)
    bb.put(".snd".getBytes("US-ASCII")).putInt(24).putInt(0xFFFFFFFF)
      .putInt(3).putInt(8000).putInt(1)
    bb.put(Array[Byte](0, 1, 0, 2, 0, 3, 0, 4)) // 4 PCM16 frames of data
    val rows = Multimodal.audioMeta(media((7L, "audio/basic", bb.array())))
      .collect()
    assert(rows.length === 1)
    val r = rows.head
    // whatever the JDK reports for the unknown-size container, the row
    // contract holds: sample count and duration are never negative
    assert(r.n_samples >= 0L, s"negative n_samples: $r")
    assert(r.duration_us >= 0L, s"negative duration: $r")
    if (r.decoded) assert(r.sample_rate === 8000, r.toString)
  }

  /** Multi-frame GIF fixture via the JDK's own GIF sequence writer. */
  private def animatedGif(colors: Seq[Int]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    try {
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      colors.foreach { c =>
        val img = new java.awt.image.BufferedImage(6, 4, java.awt.image.BufferedImage.TYPE_INT_RGB)
        for (x <- 0 until 6; y <- 0 until 4) img.setRGB(x, y, c)
        writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
      }
      writer.endWriteSequence()
    } finally { writer.dispose(); ios.close() }
    bos.toByteArray
  }

  test("features: a text payload with image magic bytes takes the fallback, never a wild decode") {
    // "BM..." passes the 2-byte BMP sniff; without the header-dims admission
    // guard ImageIO would parse the ASCII as a ~2-billion-pixel header and
    // die on raster allocation (OutOfMemoryError, which NonFatal misses)
    val trap = "BM25 scoring is a bag of words retrieval function used by search engines"
    val f = Multimodal.features(media((1L, "text/plain", trap.getBytes("UTF-8"))), dim = 8)
      .collect().head
    assert(f.feature.length === 8) // deterministic hash fallback, no crash
    val again = Multimodal.features(media((1L, "text/plain", trap.getBytes("UTF-8"))), dim = 8)
      .collect().head
    assert(f.feature.toSeq === again.feature.toSeq)
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

  /** Gradient fixture for the perceptual-hash tests: lum(x) = f(x), flat in
    * y, so the dHash is fully determined by the horizontal block ordering.
    */
  private def gradientPng(w: Int, h: Int, f: Int => Int,
                          hot: Set[(Int, Int)] = Set.empty): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var x = 0
    while (x < w) {
      var y = 0
      while (y < h) {
        val v = if (hot((x, y))) 255 else f(x) & 0xff
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
        y += 1
      }
      x += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  test("dHashes: perceptual — identical pixels equal, SCALE-INVARIANT on the same gradient, small edit = small Hamming, inverted = far") {
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    val base = gradientPng(24, 16, x => x * 10)
    val h = Multimodal.dHashes(media(
        (1L, "image/png", base),
        (2L, "image/png", gradientPng(24, 16, x => x * 10)),       // same pixels, re-encoded
        (3L, "image/png", gradientPng(48, 32, x => x * 5)),        // SAME gradient at 2x size
        (4L, "image/png", gradientPng(24, 16, x => (23 - x) * 10)), // inverted gradient
        // block (0,0) (x 0-2, y 0-1) blasted to 255 — exactly one comparison flips
        (5L, "image/png", gradientPng(24, 16, x => x * 10,
          hot = (for (x <- 0 to 2; y <- 0 to 1) yield (x, y)).toSet)),
        (6L, "text/plain", "not an image at all".getBytes("UTF-8")),
        (7L, "image/png", encodedImage(4, 4, "png")))              // raster below the 9x8 grid
      ).collect().map(r => r.media_id -> r.dhash).toMap
    assert(h(1L) === h(2L))
    // a strictly increasing gradient sets every comparison bit; halving the
    // resolution of the same gradient pools to the same ordering — the
    // resize robustness exact hashing cannot give
    assert(h(1L) === h(3L))
    assert(h(1L) === -1L) // all 64 bits set
    assert(ham(h(1L), h(4L)) === 64) // inverted: every comparison flips
    assert(ham(h(1L), h(5L)) === 1)  // local edit: one block comparison flips
    // non-decodable and sub-grid payloads take the deterministic fallback
    val again = Multimodal.dHashes(media(
        (6L, "text/plain", "not an image at all".getBytes("UTF-8")),
        (7L, "image/png", encodedImage(4, 4, "png"))))
      .collect().map(r => r.media_id -> r.dhash).toMap
    assert(again(6L) === h(6L) && again(7L) === h(7L))
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

  test("audioMeta: real RIFF/WAVE parse recovers the container facts; garbage doesn't decode") {
    val aud = Multimodal.syntheticAudio(docs, "doc_id", sampleRate = 8000, nSamples = 800)
    val meta = Multimodal.audioMeta(aud).collect().map(m => m.media_id -> m).toMap
    assert(meta(1L).sample_rate === 8000)
    assert(meta(1L).channels === 1)
    assert(meta(1L).bits_per_sample === 16)
    assert(meta(1L).n_samples === 800L)
    assert(meta(1L).duration_us === 100000L)
    assert(meta(1L).decoded)
    val bad = Multimodal.audioMeta(
      media((9L, "audio/wav", "not a wav at all".getBytes("UTF-8")))).collect()
    assert(bad.length === 1 && !bad.head.decoded)
  }

  test("audioFeatures: decoded-PCM stats equal an independent replay of the sawtooth") {
    val out = Multimodal.audioFeatures(
        Multimodal.syntheticAudio(docs, "doc_id", nSamples = 800))
      .collect().map(f => f.media_id -> f).toMap
    // independent replay of the generator contract for id 1
    var h = 0xcbf29ce484222325L
    "aud|1".getBytes("UTF-8").foreach(b => { h ^= (b & 0xffL); h *= 0x100000001b3L })
    val s0 = (h & 0xffffL).toInt
    val step = 1 + ((h >>> 16) % 32749L).toInt
    val samples = (0 until 800).map(t => ((s0 + step.toLong * t) % 65536L).toInt - 32768)
    val f = out(1L)
    assert(f.n_samples === 800L)
    assert(f.peak === samples.map(math.abs).max)
    assert(f.zero_crossings ===
      samples.sliding(2).count(p => (p(0) >= 0) != (p(1) >= 0)).toLong)
    assert(f.rms === math.sqrt(samples.map(s => s.toLong * s).sum.toDouble / 800))
    assert(f.mean === samples.map(_.toLong).sum.toDouble / 800)
  }

  test("audioFeatures: reads the payload, not the formula — a tampered sample changes the stats") {
    val clean = Multimodal.syntheticAudio(docs.filter(col("doc_id") === 1L), "doc_id")
      .collect().head
    val tampered = clean.content.clone()
    tampered(45) = (tampered(45) ^ 0x7f).toByte // high byte of sample 0
    val both = media((1L, "audio/wav", clean.content), (2L, "audio/wav", tampered))
    val f = Multimodal.audioFeatures(both).collect().map(x => x.media_id -> x).toMap
    assert(f(1L).rms !== f(2L).rms)
    // non-PCM16 payloads are skipped, not faked
    val skipped = Multimodal.audioFeatures(
      media((3L, "audio/wav", "definitely not audio".getBytes("UTF-8")))).collect()
    assert(skipped.isEmpty)
  }

  test("q_curate_multimodal: every modality gate genuinely bites (no vacuous pass)") {
    val dir = "/root/testdata/sf0.001"
    val total = spark.read.parquet(s"$dir/documents.parquet").count()
    val kept = graft.SparkEntry.queries("q_curate_multimodal")(spark, dir)
    val n = kept.count()
    assert(n > 0 && n < total)
    // image gate: dHash clustering must actually merge some images
    val dh = Multimodal.dHashes(Multimodal.syntheticMedia(
      spark.read.parquet(s"$dir/documents.parquet").select(col("doc_id")),
      "doc_id", 24, 16)).toDF()
    val imgKeeps = dh.select(countDistinct(col("dhash"))).head.getLong(0)
    assert(imgKeeps < total)
    // audio gate: the RMS band must reject some decodable clips
    val audKeeps = Multimodal.audioFeatures(Multimodal.syntheticAudio(
        spark.read.parquet(s"$dir/documents.parquet").select(col("doc_id")), "doc_id")).toDF()
      .filter(col("rms") >= 18910.0 && col("rms") <= 18930.0).count()
    assert(audKeeps > 0 && audKeeps < total)
    // text gate: the six-flag Gopher conjunction must reject some documents
    val g = graft.functions.TextFunctions.gopherFlags(col("text"))
    val gopherKeeps = spark.read.parquet(s"$dir/documents.parquet")
      .filter(g.getField("f_wc") && g.getField("f_mwl") && g.getField("f_symbol") &&
        g.getField("f_bullet") && g.getField("f_ellipsis") && g.getField("f_alpha"))
      .count()
    assert(gopherKeeps > 0 && gopherKeeps < total)
  }
}
