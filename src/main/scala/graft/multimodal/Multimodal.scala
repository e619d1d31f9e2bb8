package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns for a training-data pipeline (SURVEY §2 D12):
  * image/audio/video as opaque `binary` columns + typed metadata, with
  * decode / feature-extract / resize / frame-sample as per-partition
  * transforms.
  *
  * The Spark-side plumbing — schema, encoders, `mapPartitions` batch
  * shape, partition sizing — is real and tested, and IMAGE decode/resize
  * is real too (`javax.imageio`, JDK-builtin). Non-image blobs
  * (audio/video, and the synthetic text-byte corpus) fall back to a
  * deterministic pseudo-decode, and the embedding remains a stand-in
  * for a vision-model forward pass — swapping those for a JNI/javacv
  * decoder or a real model changes no schema or plan shape.
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

  /** Image decode via `javax.imageio` (JDK-builtin — PNG/JPEG/GIF/BMP
    * read+write with zero external dependencies). Real image bytes get
    * a REAL decode; non-image bytes (the synthetic corpus, audio/video
    * blobs) fall back to a deterministic pseudo-decode so the pipeline
    * shape stays exercised end-to-end in this container. The embedding
    * remains a stand-in for a vision-model forward pass — that is the
    * one genuinely un-runnable step here and it is computed from the
    * decoded luma plane when a real decode succeeded.
    */
  final class StubCodec {
    import java.awt.image.BufferedImage

    // the blobs are already in memory; without this ImageIO spools every
    // read/write through a disk-backed cache file — per-record executor
    // disk I/O for nothing (JVM-global flag, idempotent)
    javax.imageio.ImageIO.setUseCache(false)

    private def tryDecode(bytes: Array[Byte]): Option[BufferedImage] =
      try Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes)))
      catch { case _: Throwable => None }

    /** ITU-R BT.601 integer luma per pixel; falls back to raw bytes for
      * non-image blobs.
      */
    def decodeLuma(bytes: Array[Byte]): Array[Int] =
      tryDecode(bytes) match {
        case Some(img) =>
          val (w, h) = (img.getWidth, img.getHeight)
          val out = new Array[Int](w * h)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val rgb = img.getRGB(x, y)
              val (r, g, b) = ((rgb >> 16) & 0xff, (rgb >> 8) & 0xff, rgb & 0xff)
              out(y * w + x) = (299 * r + 587 * g + 114 * b) / 1000
              x += 1
            }
            y += 1
          }
          out
        case None => bytes.map(b => (b & 0xff))
      }

    /** Decode → bilinear scale → PNG re-encode for real images;
      * size-preserving slice fallback for non-image blobs.
      */
    def resize(bytes: Array[Byte], w: Int, h: Int): Array[Byte] =
      tryDecode(bytes) match {
        case Some(img) =>
          val scaled = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
          val g2 = scaled.createGraphics()
          try {
            g2.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
              java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
            g2.drawImage(img, 0, 0, w, h, null)
          } finally g2.dispose()
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(scaled, "png", bos)
          bos.toByteArray
        case None =>
          val out = new Array[Byte](math.min(bytes.length, w * h))
          System.arraycopy(bytes, 0, out, 0, out.length)
          out
      }

    /** ??? real: vision-model forward pass; stand-in: luma-histogram
      * projection over the (really) decoded plane.
      */
    def embed(bytes: Array[Byte], dims: Int): Array[Float] =
      embedLuma(decodeLuma(bytes), dims)

    /** Integer accumulation + ONE float division per dim (round 12):
      * the feature is a pure function of each dim's luma SUM, so it is
      * bit-identical under any partitioning/vectorization (no float-
      * add associativity) and exactly replicable by an integer-sum
      * oracle — what makes the decode→feature path hash-gatable
      * (`image_features`). The long→float cast and the /255f are each
      * single correctly-rounded IEEE ops.
      */
    def embedLuma(luma: Array[Int], dims: Int): Array[Float] = {
      val acc = new Array[Long](dims)
      var i = 0
      while (i < luma.length) { acc(i % dims) += luma(i); i += 1 }
      val v = new Array[Float](dims)
      var d = 0
      while (d < dims) { v(d) = acc(d).toFloat / 255f; d += 1 }
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
          codec.embedLuma(luma, embedDims))
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

  /** Deterministic PNG fixture set for the REAL-image pHash gate
    * (D105b): `n` 16×16 RGB images whose pixel values are a pure
    * integer formula of (x, y, pattern) — pattern = img_id % 12 for
    * the first 48 ids (four exact copies each), img_id itself above
    * (unique). Each row REALLY encodes the raster through
    * `javax.imageio` PNG — the bytes column is a genuine PNG file —
    * so a consumer decoding it exercises the full codec round trip.
    * The formula (not the bytes) is what the DuckDB oracle replays:
    * PNG encoders may differ byte-for-byte, decoded pixels may not.
    */
  def syntheticPngs(s: SparkSession, n: Int): DataFrame = {
    import s.implicits._
    s.range(n).map { idBoxed =>
      val id: Long = idBoxed
      val p = (if (id < 48) id % 12 else id).toInt
      val img = new java.awt.image.BufferedImage(16, 16,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < 16) {
        var x = 0
        while (x < 16) {
          val r = (x * (16 + p) + y * 7 + p * 31) % 256
          val g = (x * 5 + y * (11 + p) + p * 13) % 256
          val b = (x * 3 + y * 29 + p * 47) % 256
          img.setRGB(x, y, (r << 16) | (g << 8) | b)
          x += 1
        }
        y += 1
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.setUseCache(false)
      javax.imageio.ImageIO.write(img, "png", bos)
      (id, bos.toByteArray)
    }.toDF("img_id", "png")
  }

  /** D12 gate entry: binary-column metadata plumbing — byte length and
    * magic-bytes sniff over an opaque blob column, the (deterministic)
    * first step of any media-type dispatch. Pure codegen'd column ops;
    * oracle-checked against DuckDB blob functions.
    */
  val defs: Map[String, graft.QueryDef] = Map(

    // D105 — perceptual-hash near-dup over the binary columns: the
    // 8×8-of-16×16 DCT pHash (graft.functions.Phash64 — fixed-point
    // integer DCT, bit-identical across engines) bucketing blobs whose
    // low-frequency planes agree, then exact-dedup semantics per bucket
    // (min-id representative, dup verdict). This promotes the D12
    // multimodal plumbing to a gate-checked dedup capability: swap the
    // deterministic byte-plane stand-in for StubCodec's real
    // javax.imageio luma decode and the plan is unchanged. One shuffle
    // on the 63-bit hash (self-join back on the same key — exchange
    // reuse), output corpus-bounded; at 100 TB this is exactly the
    // dedup_exact shape, which scales by construction. Oracle = the
    // same integer DCT in DuckDB list comprehensions over char codes
    // (== utf8 bytes on the all-ASCII gate corpora).
    "phash_dedup" -> graft.QueryDef(
      (s, d) => {
        val withHash = graft.Tables.documents(s, d)
          .select(col("doc_id"),
            graft.functions.HashOps.phash(col("text").cast("binary"))
              .as("phash"))
        val groups = withHash.groupBy("phash")
          .agg(min("doc_id").as("rep_id"), count(lit(1)).as("n_members"))
        withHash.join(groups, "phash")
          .select(col("doc_id"), col("phash"), col("rep_id"),
            (col("n_members") > 1L).as("is_dup"))
          .orderBy("doc_id")
      },
      """WITH kt AS (SELECT
           [[16384,16384,16384,16384,16384,16384,16384,16384,16384,16384,16384,16384,16384,16384,16384,16384],
            [16305,15679,14449,12665,10394,7723,4756,1606,-1606,-4756,-7723,-10394,-12665,-14449,-15679,-16305],
            [16069,13623,9102,3196,-3196,-9102,-13623,-16069,-16069,-13623,-9102,-3196,3196,9102,13623,16069],
            [15679,10394,1606,-7723,-14449,-16305,-12665,-4756,4756,12665,16305,14449,7723,-1606,-10394,-15679],
            [15137,6270,-6270,-15137,-15137,-6270,6270,15137,15137,6270,-6270,-15137,-15137,-6270,6270,15137],
            [14449,1606,-12665,-15679,-4756,10394,16305,7723,-7723,-16305,-10394,4756,15679,12665,-1606,-14449],
            [13623,-3196,-16069,-9102,9102,16069,3196,-13623,-13623,3196,16069,9102,-9102,-16069,-3196,13623],
            [12665,-7723,-15679,1606,16305,4756,-14449,-10394,10394,14449,-4756,-16305,-1606,15679,7723,-12665]]
           AS K),
         lum AS (
           SELECT doc_id,
                  [CASE WHEN length(text) = 0 THEN 0
                        ELSE unicode(substring(text,
                               (s * length(text)) // 256 + 1, 1)) END
                   for s in range(0, 256)] AS g
           FROM documents),
         rowp AS (
           SELECT doc_id,
                  [list_sum([g[(i % 16) * 16 + x + 1] * K[i // 16 + 1][x + 1]
                             for x in range(0, 16)])
                   for i in range(0, 128)] AS t
           FROM lum CROSS JOIN kt),
         colp AS (
           SELECT doc_id,
                  [list_sum([K[i // 8 + 1][y + 1] * t[(i % 8) * 16 + y + 1]
                             for y in range(0, 16)])
                   for i in range(0, 64)] AS c
           FROM rowp CROSS JOIN kt),
         hashed AS (
           SELECT doc_id,
                  CAST(list_sum(
                    [CASE WHEN c[i + 1] > list_sort(c[2:64])[32]
                          THEN CAST(1 AS BIGINT) << (i - 1) ELSE 0 END
                     for i in range(1, 64)]) AS BIGINT) AS phash
           FROM colp),
         groups AS (
           SELECT phash, min(doc_id) AS rep_id, count(*) AS n_members
           FROM hashed GROUP BY phash)
         SELECT h.doc_id, h.phash, g.rep_id, g.n_members > 1 AS is_dup
         FROM hashed h JOIN groups g USING (phash)
         ORDER BY h.doc_id"""),

    // D105b — pHash over REAL image bytes (round-8 verdict item 4):
    // the fixture PNGs are genuine ImageIO-encoded files; the engine
    // pipeline is the production one — PNG decode (javax.imageio, the
    // real path in StubCodec.decodeLuma, NOT the byte-plane stand-in),
    // BT.601 integer luma, then the same fixed-point 16×16→8×8 DCT
    // hash and dedup-bucket semantics as phash_dedup. The oracle
    // CANNOT decode PNG, so it replays the fixtures' ground-truth
    // pixel FORMULA (syntheticPngs scaladoc) into the identical
    // integer-DCT replica: the gate therefore proves the whole
    // encode→decode→luma→hash round trip end-to-end — any defect in
    // the codec path or luma arithmetic diverges the hash. Per-blob
    // work is O(1); the only shuffle is the hash-keyed group —
    // dedup_exact shape, scales by construction.
    "phash_image" -> graft.QueryDef(
      (s, d) => {
        import s.implicits._
        val withHash = syntheticPngs(s, 96)
          .as[(Long, Array[Byte])]
          .mapPartitions { it =>
            val codec = new StubCodec
            it.map { case (id, png) =>
              val luma = codec.decodeLuma(png)
              (id, graft.functions.Phash64.hash(luma.map(_.toByte)))
            }
          }.toDF("img_id", "phash")
        val groups = withHash.groupBy("phash")
          .agg(min("img_id").as("rep_id"), count(lit(1)).as("n_members"))
        withHash.join(groups, "phash")
          .select(col("img_id"), col("phash"), col("rep_id"),
            (col("n_members") > 1L).as("is_dup"))
          .orderBy("img_id")
      },
      """WITH kt AS (SELECT
           [[16384,16384,16384,16384,16384,16384,16384,16384,16384,16384,16384,16384,16384,16384,16384,16384],
            [16305,15679,14449,12665,10394,7723,4756,1606,-1606,-4756,-7723,-10394,-12665,-14449,-15679,-16305],
            [16069,13623,9102,3196,-3196,-9102,-13623,-16069,-16069,-13623,-9102,-3196,3196,9102,13623,16069],
            [15679,10394,1606,-7723,-14449,-16305,-12665,-4756,4756,12665,16305,14449,7723,-1606,-10394,-15679],
            [15137,6270,-6270,-15137,-15137,-6270,6270,15137,15137,6270,-6270,-15137,-15137,-6270,6270,15137],
            [14449,1606,-12665,-15679,-4756,10394,16305,7723,-7723,-16305,-10394,4756,15679,12665,-1606,-14449],
            [13623,-3196,-16069,-9102,9102,16069,3196,-13623,-13623,3196,16069,9102,-9102,-16069,-3196,13623],
            [12665,-7723,-15679,1606,16305,4756,-14449,-10394,10394,14449,-4756,-16305,-1606,15679,7723,-12665]]
           AS K),
         imgs AS (
           SELECT CAST(r.range AS BIGINT) AS img_id,
                  CAST(CASE WHEN r.range < 48 THEN r.range % 12
                            ELSE r.range END AS BIGINT) AS p
           FROM range(0, 96) r),
         lum AS (
           SELECT img_id,
                  [(299 * (((s % 16) * (16 + p) + (s // 16) * 7 + p * 31) % 256)
                    + 587 * (((s % 16) * 5 + (s // 16) * (11 + p) + p * 13) % 256)
                    + 114 * (((s % 16) * 3 + (s // 16) * 29 + p * 47) % 256))
                   // 1000
                   for s in range(0, 256)] AS g
           FROM imgs),
         rowp AS (
           SELECT img_id,
                  [list_sum([g[(i % 16) * 16 + x + 1] * K[i // 16 + 1][x + 1]
                             for x in range(0, 16)])
                   for i in range(0, 128)] AS t
           FROM lum CROSS JOIN kt),
         colp AS (
           SELECT img_id,
                  [list_sum([K[i // 8 + 1][y + 1] * t[(i % 8) * 16 + y + 1]
                             for y in range(0, 16)])
                   for i in range(0, 64)] AS c
           FROM rowp CROSS JOIN kt),
         hashed AS (
           SELECT img_id,
                  CAST(list_sum(
                    [CASE WHEN c[i + 1] > list_sort(c[2:64])[32]
                          THEN CAST(1 AS BIGINT) << (i - 1) ELSE 0 END
                     for i in range(1, 64)]) AS BIGINT) AS phash
           FROM colp),
         groups AS (
           SELECT phash, min(img_id) AS rep_id, count(*) AS n_members
           FROM hashed GROUP BY phash)
         SELECT h.img_id, h.phash, g.rep_id, g.n_members > 1 AS is_dup
         FROM hashed h JOIN groups g USING (phash)
         ORDER BY h.img_id"""),

    // D12 gate (round-11 verdict item 5) — the full decode→feature
    // path of the D12 pipeline as a hash-gated key, retiring its
    // spec-only status: the fixture PNGs (real ImageIO files) run the
    // PRODUCTION imageFeatures stage — javax.imageio decode, BT.601
    // integer luma, mean-luma summary, and the 16-dim luma-histogram
    // embedding (the documented model-inference stand-in, now
    // integer-exact per dim). The oracle cannot decode PNG, so — the
    // phash_image pattern — it replays the fixtures' ground-truth
    // pixel FORMULA into the same integer arithmetic: any defect in
    // the codec path, luma, mean rounding, or the histogram fold
    // diverges the values. mean_luma replicates math.round as
    // floor(x·1e4 + 0.5)/1e4 (exact: x·1e4 = sum·625/16 is an exact
    // double); feat = float32(sum)/255f — both single correctly-
    // rounded IEEE ops, bit-equal across engines. Per-blob work is
    // O(1) and entirely map-side (decode + explode are local; the only
    // exchanges are the gate output's orderBy) — at 100 TB the
    // production stage is a pure scan.
    "image_features" -> graft.QueryDef(
      (s, d) => {
        import s.implicits._
        val assets = syntheticPngs(s, 96).as[(Long, Array[Byte])]
          .map { case (id, png) => Asset(id, "image", png, 16, 16, 0, 0) }
        imageFeatures(assets).toDF()
          .select(col("asset_id").as("img_id"), col("width"),
            col("height"), col("mean_luma"),
            posexplode(col("embedding")).as(Seq("dim", "feat")))
          .orderBy("img_id", "dim")
      },
      """WITH imgs AS (
           SELECT CAST(r.range AS BIGINT) AS img_id,
                  CAST(CASE WHEN r.range < 48 THEN r.range % 12
                            ELSE r.range END AS BIGINT) AS p
           FROM range(0, 96) r),
         lum AS (
           SELECT img_id,
                  [(299 * (((s % 16) * (16 + p) + (s // 16) * 7 + p * 31) % 256)
                    + 587 * (((s % 16) * 5 + (s // 16) * (11 + p) + p * 13) % 256)
                    + 114 * (((s % 16) * 3 + (s // 16) * 29 + p * 47) % 256))
                   // 1000
                   for s in range(0, 256)] AS g
           FROM imgs),
         feats AS (
           SELECT img_id, d.range AS dim,
                  list_sum([g[i + 1] for i in range(0, 256)
                            if i % 16 = d.range]) AS fsum,
                  list_sum(g) AS total
           FROM lum, range(0, 16) d)
         SELECT img_id, 16 AS width, 16 AS height,
                floor((total / 256.0) * 10000 + 0.5) / 10000 AS mean_luma,
                CAST(dim AS INT) AS dim,
                CAST(CAST(fsum AS REAL) / CAST(255 AS REAL) AS REAL) AS feat
         FROM feats ORDER BY img_id, dim"""),

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
