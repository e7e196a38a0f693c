package graft.multimodal

import java.security.MessageDigest
import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions.{col, concat_ws}

/** Multimodal columns (SURVEY.md §7.5 north star): image/audio/video
  * carried as opaque `binary` columns with typed metadata structs, and
  * decode / frame-sample / resize / feature-extract as executor-side
  * batch transforms (`mapPartitions` — the Scala analogue of
  * `mapInPandas`: one iterator of rows per partition, no driver hops).
  *
  * The CODEC IS A STUB: this container has no image/audio libraries, so
  * [[FakeCodec]] deterministically expands the binary content into
  * pseudo-pixels / pseudo-samples (SHA-256 counter stream). Everything
  * around it — schemas, partitioning, batch shape, resize and feature
  * math over the decoded arrays — is real and tested; swapping in a real
  * codec changes one class.
  *
  * Scale: decode is embarrassingly parallel; `repartition(media_id)`
  * spreads hot media evenly, and features re-aggregate by key only.
  */
final case class MediaMeta(
    modality: String,           // image | audio | video
    mimeType: String,
    width: Option[Int],
    height: Option[Int],
    durationMs: Option[Long],
    sampleRateHz: Option[Int])

final case class MediaRow(media_id: Long, meta: MediaMeta, content: Array[Byte])

final case class Frame(media_id: Long, frame_index: Int, width: Int, height: Int,
    pixels: Array[Byte], modality: String = "image")
final case class MediaFeatures(media_id: Long, modality: String, feature: Array[Float])
final case class FrameHash(media_id: Long, frame_index: Int, dhash: String)
final case class MediaFingerprint(media_id: Long, media_fp: String, canonical_media: Long)

/** Decode stub: deterministic byte expansion standing in for a real
  * image/video codec (??? boundary of this module).
  */
trait MediaCodec extends Serializable {
  def decodeFrame(content: Array[Byte], frameIndex: Int, width: Int, height: Int): Array[Byte]
}

/** SHA-256 counter-mode expansion of the content — stable across runs,
  * partitionings and executors, so tests can assert exact outputs.
  */
object FakeCodec extends MediaCodec {
  override def decodeFrame(content: Array[Byte], frameIndex: Int, width: Int, height: Int): Array[Byte] = {
    val need = width * height * 3
    val out = new Array[Byte](need)
    val md = MessageDigest.getInstance("SHA-256")
    var off = 0
    var ctr = 0
    while (off < need) {
      md.reset()
      md.update(content)
      md.update(Array[Byte](frameIndex.toByte, ctr.toByte, (ctr >> 8).toByte))
      val block = md.digest()
      val n = math.min(block.length, need - off)
      System.arraycopy(block, 0, out, off, n)
      off += n; ctr += 1
    }
    out
  }
}

/** Real still-image codec over the JDK's built-in `javax.imageio`
  * registry (PNG/BMP/GIF/JPEG on a stock JRE — no external libraries).
  * `frameIndex` is accepted for the [[MediaCodec]] contract but still
  * images have exactly one frame, so every index decodes the same
  * raster (a 1 fps slideshow under video metadata); the decoded image
  * is nearest-neighbour-sampled to the REQUESTED width×height so the
  * downstream w·h·3 RGB byte contract follows the metadata dims, not
  * the file's. This is the class [[FakeCodec]] stands in for: with it,
  * dHash's perceptual property — visually near-identical images land
  * at small Hamming distance — is actually testable (MultimodalSpec),
  * where FakeCodec's avalanche expansion could only show exact-content
  * collision.
  */
object ImageIoCodec extends MediaCodec {
  override def decodeFrame(content: Array[Byte], frameIndex: Int, width: Int, height: Int): Array[Byte] = {
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(content))
    require(img != null, "javax.imageio has no reader for this content")
    val out = new Array[Byte](width * height * 3)
    var y = 0
    while (y < height) {
      val sy = y * img.getHeight / height
      var x = 0
      while (x < width) {
        val sx = x * img.getWidth / width
        val rgb = img.getRGB(sx, sy) // TYPE_INT_ARGB regardless of source model
        val o = (y * width + x) * 3
        out(o) = ((rgb >> 16) & 0xff).toByte
        out(o + 1) = ((rgb >> 8) & 0xff).toByte
        out(o + 2) = (rgb & 0xff).toByte
        x += 1
      }
      y += 1
    }
    out
  }
}

object Multimodal {
  private implicit val frameEnc = Encoders.product[Frame]
  private implicit val featEnc = Encoders.product[MediaFeatures]
  private implicit val mediaEnc = Encoders.product[MediaRow]

  /** Deterministic synthetic media table (images + 1 fps videos). */
  def syntheticMedia(spark: SparkSession, n: Int): Dataset[MediaRow] = {
    val rows = (0 until n).map { i =>
      val content = Array.tabulate(64)(j => ((i * 131 + j * 7) & 0xff).toByte)
      if (i % 3 == 2)
        MediaRow(i.toLong, MediaMeta("video", "video/fake", Some(8), Some(6), Some(3000L), None), content)
      else
        MediaRow(i.toLong, MediaMeta("image", "image/fake", Some(8), Some(6), None, None), content)
    }
    spark.createDataset(rows)
  }

  /** Decode: images → 1 frame; videos → one frame per second (the
    * frame-sample step), every `sampleEveryMs`. Runs per-partition on
    * executors.
    */
  def decode(media: Dataset[MediaRow], codec: MediaCodec, sampleEveryMs: Long = 1000L): Dataset[Frame] =
    media.mapPartitions(_.flatMap { m =>
      // fail LOUDLY on missing dimensions: the old getOrElse(1) default
      // decoded every dimension-less asset to a 1x1 frame whose dhash is
      // the empty bit string — ALL such assets then shared one
      // fingerprint and the dedup pipeline silently collapsed them into
      // a single canonical (data loss, not an error)
      val w = m.meta.width.getOrElse(throw new IllegalArgumentException(
        s"media ${m.media_id}: width missing — cannot decode frames without dimensions"))
      val h = m.meta.height.getOrElse(throw new IllegalArgumentException(
        s"media ${m.media_id}: height missing — cannot decode frames without dimensions"))
      val nFrames = m.meta.modality match {
        case "video" => math.max(1, (m.meta.durationMs.getOrElse(0L) / sampleEveryMs).toInt)
        case _ => 1
      }
      (0 until nFrames).iterator.map(f =>
        Frame(m.media_id, f, w, h, codec.decodeFrame(m.content, f, w, h), m.meta.modality))
    })

  /** Nearest-neighbour resize — real math over the decoded RGB bytes. */
  def resize(frames: Dataset[Frame], outW: Int, outH: Int): Dataset[Frame] =
    frames.mapPartitions(_.map { fr =>
      val out = new Array[Byte](outW * outH * 3)
      var y = 0
      while (y < outH) {
        val sy = y * fr.height / outH
        var x = 0
        while (x < outW) {
          val sx = x * fr.width / outW
          var c = 0
          while (c < 3) {
            out((y * outW + x) * 3 + c) = fr.pixels((sy * fr.width + sx) * 3 + c)
            c += 1
          }
          x += 1
        }
        y += 1
      }
      Frame(fr.media_id, fr.frame_index, outW, outH, out, fr.modality)
    })

  /** Difference hash (dHash) per frame: one bit per horizontally
    * adjacent R-channel pixel pair ((w−1)×h bits) — the standard
    * perceptual fingerprint: with a REAL codec, visually near-identical
    * images keep most bits and land within small Hamming distance (the
    * d6 pigeonhole machinery then finds near-dup pairs). With
    * [[FakeCodec]]'s avalanche expansion only EXACT content collides —
    * the spec exercises that path; the plumbing is codec-independent.
    */
  def dhash(frames: Dataset[Frame]): Dataset[FrameHash] = {
    import frames.sparkSession.implicits._
    frames.mapPartitions(_.map { fr =>
      val sb = new StringBuilder((fr.width - 1) * fr.height)
      var y = 0
      while (y < fr.height) {
        var x = 0
        while (x < fr.width - 1) {
          val a = fr.pixels((y * fr.width + x) * 3) & 0xff
          val b = fr.pixels((y * fr.width + x + 1) * 3) & 0xff
          sb.append(if (a > b) '1' else '0')
          x += 1
        }
        y += 1
      }
      FrameHash(fr.media_id, fr.frame_index, sb.toString)
    })
  }

  /** Media-level dedup bridge into the d1/d7 family: per-media
    * fingerprint = md5 over the frame-order-joined dHashes (frame order
    * restored explicitly — `mapGroups` iterators carry no order
    * guarantee), canonical = min media_id per fingerprint. One combinable
    * group per media + one hash-shuffle on the fingerprint — the d1
    * shape, with media_fp standing in for md5(text).
    */
  def dedupByFingerprint(hashes: Dataset[FrameHash]): Dataset[MediaFingerprint] = {
    import hashes.sparkSession.implicits._
    val perMedia = hashes.groupByKey(_.media_id).mapGroups { (id, hs) =>
      val joined = hs.toSeq.sortBy(_.frame_index).map(_.dhash).mkString("|")
      val md = MessageDigest.getInstance("MD5")
      val fp = md.digest(joined.getBytes("UTF-8")).map("%02x".format(_)).mkString
      (id, fp)
    }.toDF("media_id", "media_fp")
    import org.apache.spark.sql.functions.{col, min}
    import org.apache.spark.sql.expressions.Window
    perMedia
      .withColumn("canonical_media",
        min(col("media_id")).over(Window.partitionBy(col("media_fp"))))
      .as[MediaFingerprint]
  }

  /** Media table derived from the driver's `documents` parquet: each doc
    * is one asset whose binary content is the UTF-8 bytes of
    * `source|lang` — a COARSE key, so the corpus contains genuine
    * re-uploads of the same asset (10-16 docs share a (source, lang)
    * pair at sf0.01) — and whose modality alternates image / 3 s video
    * by `doc_id % 3`. This is fixture synthesis, not operator logic: the
    * point is that the decode → dhash → fingerprint pipeline must
    * rediscover exactly the (content, modality) duplicate groups the
    * oracle can state directly over the source columns.
    */
  def mediaFromDocuments(s: SparkSession, d: String): Dataset[MediaRow] = {
    import s.implicits._
    graft.Tables.documents(s, d)
      .select(col("doc_id"), concat_ws("|", col("source"), col("lang")).as("asset"))
      .as[(Long, String)]
      .map { case (id, asset) =>
        val content = asset.getBytes("UTF-8")
        if (id % 3 == 2)
          MediaRow(id, MediaMeta("video", "video/fake", Some(8), Some(6), Some(3000L), None), content)
        else
          MediaRow(id, MediaMeta("image", "image/fake", Some(8), Some(6), None, None), content)
      }
  }

  type Q = (SparkSession, String) => DataFrame

  /** Oracle-gated multimodal queries (VERDICT r9 gap #1: this was the
    * one north-star family with spec-only coverage). The oracle cannot
    * decode frames, but it CAN state the ground-truth duplicate groups
    * of [[mediaFromDocuments]] — so a single wrong bit anywhere in the
    * decode / dhash / fingerprint path shows up as a grouping mismatch.
    */
  def queries: Map[String, Q] = Map(
    // End-to-end media dedup: documents-derived binary assets → decode
    // (frame-sampled for videos) → per-frame dHash → media fingerprint →
    // canonical = min media_id per fingerprint. Must reproduce the
    // (source, lang, modality) duplicate groups exactly: identical
    // content+modality collide by construction; distinct contents
    // separate because FakeCodec's SHA-256 stream avalanches into the
    // 42-bit-per-frame dHash (cross-group collision odds ~2^-31 here,
    // and deterministic for the fixed corpus — verified at all three SFs).
    "m1_media_dedup" -> { (s, d) =>
      val fps = dedupByFingerprint(dhash(decode(mediaFromDocuments(s, d), FakeCodec)))
      fps.select(col("media_id"), col("canonical_media")).orderBy("media_id")
    },
    // Decode/frame-sample/resize plumbing shape: videos fan out to one
    // frame per second, images to one, and every frame lands at the
    // requested resize dims — the mapPartitions batch contract the rest
    // of the family builds on.
    "m2_frame_sample" -> { (s, d) =>
      val frames = resize(decode(mediaFromDocuments(s, d), FakeCodec), 4, 3)
      frames.select(col("media_id"), col("frame_index"), col("width"), col("height"))
        .orderBy("media_id", "frame_index")
    },
    // Byte-entropy integrity screen over the OPAQUE binary column — the
    // pre-decode triage a media pipeline runs on every asset: Shannon
    // entropy of the byte histogram flags degenerate content (constant
    // padding / truncated headers read low; well-formed compressed media
    // reads near 8 bits) without ever invoking a codec. Byte classes
    // come from hex(content) split into 2-char cells, so the whole
    // histogram is (media, byte)-keyed and map-side combinable — the
    // explode is bytes-linear and collapses to ≤256 rows per asset
    // before any exchange; the media-level re-agg joins two post-agg
    // frames on media_id. Entropy terms follow the x10 log discipline:
    // each p·ln(p)/ln2 is rounded to 9 digits BEFORE the decimal-exact
    // per-media sum, so cross-engine libm ulps cannot reorder the hash.
    "m3_byte_entropy" -> { (s, d) =>
      import org.apache.spark.sql.functions._
      val hx = mediaFromDocuments(s, d).toDF()
        .select(col("media_id"), hex(col("content")).as("hx"))
      // empty assets yield ZERO byte rows, not bogus classes: Spark's
      // sequence(1, 0) is DESCENDING [1, 0], so an unguarded transform
      // would emit two empty-string "bytes" for zero-length content.
      // Unreachable with mediaFromDocuments' constructed payloads, but
      // the operator must be safe for arbitrary binary input.
      val bytes = hx.filter(length(col("hx")) >= 2).select(col("media_id"),
        explode(expr(
          "transform(sequence(1, length(hx) div 2), i -> substring(hx, i*2-1, 2))")).as("byte"))
      val cnts = bytes.groupBy("media_id", "byte").agg(count(lit(1)).as("cnt"))
      val tots = cnts.groupBy("media_id")
        .agg(sum(col("cnt")).as("n_bytes"), count(lit(1)).as("n_classes"))
      val p = col("cnt").cast("double") / col("n_bytes").cast("double")
      cnts.join(tots, "media_id")
        .withColumn("term", round(p * log(p) / lit(0.6931471805599453), 9))
        .groupBy("media_id")
        .agg(max(col("n_bytes")).as("n_bytes"),
          max(col("n_classes")).as("n_classes"),
          (-sum(col("term").cast(org.apache.spark.sql.types.DecimalType(28, 12))))
            .cast("double").as("entropy"))
        .withColumn("is_degenerate", col("entropy") < 2.7)
        .orderBy("media_id")
    }
  )

  def oracles: Map[String, String] = Map(
    "m1_media_dedup" ->
      """SELECT doc_id AS media_id,
        |  MIN(doc_id) OVER (PARTITION BY source, lang, doc_id % 3 = 2) AS canonical_media
        |FROM documents ORDER BY media_id""".stripMargin,
    "m2_frame_sample" ->
      """WITH fr AS (SELECT doc_id,
        |    unnest(CASE WHEN doc_id % 3 = 2 THEN [0, 1, 2] ELSE [0] END) AS f
        |  FROM documents)
        |SELECT doc_id AS media_id, CAST(f AS INTEGER) AS frame_index,
        |  CAST(4 AS INTEGER) AS width, CAST(3 AS INTEGER) AS height
        |FROM fr ORDER BY media_id, frame_index""".stripMargin,
    // The asset binary is the UTF-8 of source||'|'||lang by construction
    // (mediaFromDocuments), so the oracle reproduces the byte stream via
    // hex(encode(...)) and walks the identical 2-char hex cells.
    "m3_byte_entropy" ->
      """WITH m AS (SELECT doc_id AS media_id,
        |    hex(encode(source || '|' || lang)) AS hx
        |  FROM documents),
        |b AS (SELECT media_id, substr(hx, CAST(u AS INTEGER) * 2 - 1, 2) AS byte
        |  FROM m, unnest(range(1, CAST(length(hx) // 2 AS BIGINT) + 1)) AS r(u)),
        |c AS (SELECT media_id, byte, CAST(count(*) AS BIGINT) AS cnt
        |  FROM b GROUP BY 1, 2),
        |t AS (SELECT media_id, CAST(sum(cnt) AS BIGINT) AS n_bytes,
        |    CAST(count(*) AS BIGINT) AS n_classes
        |  FROM c GROUP BY 1),
        |tm AS (SELECT c.media_id, n_bytes, n_classes,
        |    round((CAST(cnt AS DOUBLE) / CAST(n_bytes AS DOUBLE)) *
        |      ln(CAST(cnt AS DOUBLE) / CAST(n_bytes AS DOUBLE)) /
        |      CAST(0.6931471805599453 AS DOUBLE), 9) AS term
        |  FROM c JOIN t USING (media_id))
        |SELECT media_id, max(n_bytes) AS n_bytes, max(n_classes) AS n_classes,
        |  CAST(-sum(CAST(term AS DECIMAL(28,12))) AS DOUBLE) AS entropy,
        |  CAST(-sum(CAST(term AS DECIMAL(28,12))) AS DOUBLE) < 2.7 AS is_degenerate
        |FROM tm GROUP BY media_id ORDER BY media_id""".stripMargin
  )

  /** Feature extraction: per-channel means + an 8-bin luma histogram →
    * 11-dim float feature, averaged over a medium's frames.
    */
  def features(frames: Dataset[Frame]): Dataset[MediaFeatures] = {
    import frames.sparkSession.implicits._
    frames.groupByKey(_.media_id).mapGroups { (id, fs) =>
      val acc = new Array[Double](11)
      var n = 0
      var mod = "image"
      fs.foreach { fr =>
        mod = fr.modality
        val px = fr.pixels
        val hist = new Array[Double](8)
        val chan = new Array[Double](3)
        var i = 0
        while (i < px.length) {
          val v = px(i) & 0xff
          chan(i % 3) += v
          if (i % 3 == 0) hist(v >> 5) += 1 // luma proxy: R channel
          i += 1
        }
        val nPix = px.length / 3
        (0 until 3).foreach(c => acc(c) += chan(c) / nPix / 255.0)
        (0 until 8).foreach(b => acc(3 + b) += hist(b) / nPix)
        n += 1
      }
      // modality is CARRIED from the source metadata, not re-derived
      // from the frame count (a short video sampled to one frame is
      // still a video)
      MediaFeatures(id, mod, acc.map(v => (v / n).toFloat))
    }
  }
}
