package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns for a training-data pipeline (SURVEY §2 D12):
  * image/audio/video as opaque `binary` columns + typed metadata, with
  * decode / feature-extract / resize / frame-sample as per-partition
  * transforms.
  *
  * The Spark-side plumbing — schema, encoders, `mapPartitions` batch
  * shape, partition sizing — is real and tested. The actual media
  * decoding is STUBBED (`StubCodec`): this container has no image/audio
  * libraries, so the stub derives deterministic pseudo-content from the
  * bytes. Swapping `StubCodec` for a JNI/javacv decoder changes no
  * schema or plan shape: the stub is the only non-production line.
  *
  * Why `mapPartitions` (preference (d) in the custom-op ladder): media
  * decode is genuinely imperative per-blob native-library work — exactly
  * the case the DataFrame API delegates to partition-level iteration.
  * Batching per partition amortizes codec init (one `StubCodec` per
  * partition, as a real decoder pool would be).
  */
object Multimodal {

  /** One media blob + typed metadata. `bytes` stays opaque binary. */
  case class Asset(
      asset_id: Long,
      kind: String, // image | audio | video
      bytes: Array[Byte],
      width: Int,
      height: Int,
      sample_rate: Int,
      n_frames: Int)

  case class ImageFeatures(
      asset_id: Long,
      width: Int,
      height: Int,
      mean_luma: Double,
      embedding: Array[Float])

  case class Frame(
      asset_id: Long,
      frame_index: Int,
      frame_bytes: Array[Byte])

  implicit val assetEnc: org.apache.spark.sql.Encoder[Asset] =
    Encoders.product[Asset]
  implicit val featEnc: org.apache.spark.sql.Encoder[ImageFeatures] =
    Encoders.product[ImageFeatures]
  implicit val frameEnc: org.apache.spark.sql.Encoder[Frame] =
    Encoders.product[Frame]

  /** STUB decoder — deterministic fake standing in for a real codec.
    * Everything it returns is a pure function of the input bytes, so
    * tests are reproducible and the pipeline shape is exercised
    * honestly.
    */
  final class StubCodec {
    def decodeLuma(bytes: Array[Byte]): Array[Int] =
      bytes.map(b => (b & 0xff)) // ??? real: image decode to luma plane

    def resize(bytes: Array[Byte], w: Int, h: Int): Array[Byte] = {
      // ??? real: decode → scale → re-encode; fake: size-preserving slice
      val out = new Array[Byte](math.min(bytes.length, w * h))
      System.arraycopy(bytes, 0, out, 0, out.length)
      out
    }

    def embed(bytes: Array[Byte], dims: Int): Array[Float] = {
      // ??? real: vision model forward pass; fake: byte-histogram projection
      val v = new Array[Float](dims)
      var i = 0
      while (i < bytes.length) { v(i % dims) += (bytes(i) & 0xff) / 255f; i += 1 }
      v
    }
  }

  /** Decode + feature-extract, batched per partition (one codec per
    * partition ≈ one decoder pool per executor core at scale).
    */
  def imageFeatures(assets: Dataset[Asset], embedDims: Int = 16): Dataset[ImageFeatures] =
    assets.filter(_.kind == "image").mapPartitions { it =>
      val codec = new StubCodec
      it.map { a =>
        val luma = codec.decodeLuma(a.bytes)
        val mean = if (luma.isEmpty) 0.0 else luma.sum.toDouble / luma.length
        ImageFeatures(a.asset_id, a.width, a.height,
          math.round(mean * 10000).toDouble / 10000,
          codec.embed(a.bytes, embedDims))
      }
    }

  /** Resize: metadata updated, bytes re-encoded (stub). */
  def resize(assets: Dataset[Asset], w: Int, h: Int): Dataset[Asset] =
    assets.mapPartitions { it =>
      val codec = new StubCodec
      it.map(a => a.copy(bytes = codec.resize(a.bytes, w, h),
        width = w, height = h))
    }

  /** Frame sampling: one output row per sampled frame — the video
    * analog of the product_details explode.
    */
  def sampleFrames(assets: Dataset[Asset], everyN: Int): Dataset[Frame] =
    assets.filter(_.kind == "video").flatMap { a =>
      val n = math.max(a.n_frames, 0)
      (0 until n by math.max(everyN, 1)).map { f =>
        // ??? real: container demux + frame decode; fake: offset slice
        val off = math.min(f * 16, math.max(a.bytes.length - 16, 0))
        Frame(a.asset_id, f,
          a.bytes.slice(off, math.min(off + 16, a.bytes.length)))
      }
    }

  /** D12 gate entry: binary-column metadata plumbing — byte length and
    * magic-bytes sniff over an opaque blob column, the (deterministic)
    * first step of any media-type dispatch. Pure codegen'd column ops;
    * oracle-checked against DuckDB blob functions.
    */
  val defs: Map[String, graft.QueryDef] = Map(
    "binary_meta" -> graft.QueryDef(
      (s, d) =>
        graft.Tables.documents(s, d)
          .select(col("doc_id"),
            length(col("text").cast("binary")).cast("bigint").as("n_bytes"),
            upper(hex(substring(col("text"), 1, 4).cast("binary")))
              .as("magic"))
          .orderBy("doc_id"),
      """SELECT doc_id,
                octet_length(encode(text)) AS n_bytes,
                upper(hex(encode(substring(text, 1, 4)))) AS magic
         FROM documents ORDER BY doc_id"""))

  /** Synthesize a deterministic asset table from the documents corpus
    * (bytes = utf8 text), so specs exercise realistic blob sizes.
    */
  def syntheticAssets(s: SparkSession, dir: String): Dataset[Asset] = {
    import s.implicits._
    graft.Tables.documents(s, dir)
      .select(col("doc_id"), col("text"), col("n_chars"))
      .map { r =>
        val id = r.getLong(0)
        val bytes = r.getString(1).getBytes("UTF-8")
        val kind = (id % 3) match {
          case 0 => "image"; case 1 => "audio"; case _ => "video"
        }
        Asset(id, kind, bytes, 64, 48, 16000, (bytes.length / 32).toInt)
      }
  }
}
