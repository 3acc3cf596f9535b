package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** A multimodal asset row: opaque binary payload + typed metadata. The
  * engine's data model for images/audio/video at 100 TB: content stays an
  * opaque `binary` column (never parsed by Catalyst), metadata is columnar
  * and filterable, heavy per-asset work runs batched per partition.
  */
final case class MediaRecord(media_id: Long, mime: String, content: Array[Byte])

final case class ImageMeta(media_id: Long, mime: String, width: Int, height: Int,
                           n_bytes: Long, sha_like: Long)

final case class FrameSample(media_id: Long, frame_index: Int, feature: Array[Float])

/** Multimodal column plumbing (north-star). The *decode* step is a clearly
  * marked STUB — no image/audio codecs exist in this environment — producing
  * deterministic fake values from the payload hash. Everything around it
  * (schema, batch iteration shape, partitioning, the typed Dataset API) is
  * the real production plumbing and is tested.
  *
  * Scale notes: per-asset work uses `mapPartitions` so any native decoder
  * would be initialized once per partition (not per record) and fed a batch
  * iterator — the JVM analog of a batched (Arrow/Pandas-style) UDF. Binary
  * payloads never enter a shuffle: derived metadata/features are small
  * columns; joins back to content go through the `media_id` key.
  */
object Multimodal {

  /** Deterministic 64-bit hash of a byte payload (FNV-1a). */
  private def fnv1a(bytes: Array[Byte]): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < bytes.length) { h ^= (bytes(i) & 0xffL); h *= 0x100000001b3L; i += 1 }
    h
  }

  /** Wrap a text table as fake media assets (test/fixture path: the container
    * has no real image corpus; payload = UTF-8 bytes of the text).
    */
  def asMedia(df: DataFrame, idCol: String, textCol: String): Dataset[MediaRecord] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long").as("media_id"), lit("image/png").as("mime"),
      encode(col(textCol), "UTF-8").as("content")).as[MediaRecord]
  }

  /** STUB decode ??? — stands in for a real image decoder (e.g. libjpeg via
    * JNI). Deterministic fake dimensions derived from the payload hash; a
    * real deployment swaps only this function's body.
    */
  private def decodeImageStub(payload: Array[Byte]): (Int, Int) = {
    val h = fnv1a(payload)
    (640 + (math.floorMod(h, 1280L)).toInt, 360 + (math.floorMod(h >>> 32, 720L)).toInt)
  }

  /** Extract image metadata, batched per partition. Decoder "init" happens
    * once per partition — the production shape for native codecs.
    */
  def imageMeta(media: Dataset[MediaRecord]): Dataset[ImageMeta] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { batch =>
      // per-partition decoder init would go here (JNI handle, thread-local buffers)
      batch.map { m =>
        val (w, h) = decodeImageStub(m.content)
        ImageMeta(m.media_id, m.mime, w, h, m.content.length.toLong, fnv1a(m.content))
      }
    }
  }

  /** STUB feature extraction ??? — deterministic pseudo-embedding (dim
    * floats seeded by the payload hash). Real deployment: an ONNX/vision
    * model session initialized per partition, fed fixed-size batches.
    */
  def features(media: Dataset[MediaRecord], dim: Int): Dataset[FrameSample] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { batch =>
      batch.map { m =>
        val rng = new scala.util.Random(fnv1a(m.content))
        FrameSample(m.media_id, 0, Array.fill(dim)(rng.nextFloat()))
      }
    }
  }

  /** Sample every `everyN`-th frame of a (fake) video: the explode/generator
    * shape for frame-level processing. Frame count is a STUB (payload
    * length / 1024 + 1); per-frame features are deterministic fakes.
    */
  def frameSamples(media: Dataset[MediaRecord], everyN: Int, dim: Int): Dataset[FrameSample] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.flatMap { m =>
      val frames = (m.content.length / 1024 + 1)
      (0 until frames by everyN).map { fi =>
        val rng = new scala.util.Random(fnv1a(m.content) ^ fi.toLong)
        FrameSample(m.media_id, fi, Array.fill(dim)(rng.nextFloat()))
      }
    }
  }

  /** STUB resize ??? — stands in for a real image resize (e.g. libvips).
    * Produces a deterministic fake payload of `ceil(w*h/64)` bytes derived
    * from the original hash; a real deployment swaps only the body. The
    * Dataset shape (binary in → binary out, metadata columns preserved,
    * per-partition batching) is the production plumbing.
    */
  def resize(media: Dataset[MediaRecord], w: Int, h: Int): Dataset[MediaRecord] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { batch =>
      // per-partition resize-library init would go here
      batch.map { m =>
        val seed = fnv1a(m.content)
        val n = math.max(1, w * h / 64)
        val out = new Array[Byte](n)
        var x = seed
        var i = 0
        while (i < n) { x = x * 6364136223846793005L + 1442695040888963407L; out(i) = (x >>> 56).toByte; i += 1 }
        MediaRecord(m.media_id, m.mime, out)
      }
    }
  }

  /** Byte-level metadata that needs no decode: pure Catalyst, oracle-checkable. */
  def byteStats(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol),
      length(encode(col(textCol), "UTF-8")).as("n_bytes"),
      length(col(textCol)).as("n_chars"))
}
