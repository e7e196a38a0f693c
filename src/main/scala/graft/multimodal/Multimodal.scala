package graft.multimodal

import java.security.MessageDigest
import org.apache.spark.sql.{Dataset, Encoders, SparkSession}

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

final case class Frame(media_id: Long, frame_index: Int, width: Int, height: Int, pixels: Array[Byte])
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
      val w = m.meta.width.getOrElse(1)
      val h = m.meta.height.getOrElse(1)
      val nFrames = m.meta.modality match {
        case "video" => math.max(1, (m.meta.durationMs.getOrElse(0L) / sampleEveryMs).toInt)
        case _ => 1
      }
      (0 until nFrames).iterator.map(f => Frame(m.media_id, f, w, h, codec.decodeFrame(m.content, f, w, h)))
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
      Frame(fr.media_id, fr.frame_index, outW, outH, out)
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

  /** Feature extraction: per-channel means + an 8-bin luma histogram →
    * 11-dim float feature, averaged over a medium's frames.
    */
  def features(frames: Dataset[Frame]): Dataset[MediaFeatures] = {
    import frames.sparkSession.implicits._
    frames.groupByKey(_.media_id).mapGroups { (id, fs) =>
      val acc = new Array[Double](11)
      var n = 0
      fs.foreach { fr =>
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
      MediaFeatures(id, if (n > 1) "video" else "image", acc.map(v => (v / n).toFloat))
    }
  }
}
