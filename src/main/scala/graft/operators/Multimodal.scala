package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) column plumbing: media travel as
  * opaque `binary` columns with typed metadata structs; decode /
  * feature-extract steps run per-partition so heavy native decoders
  * amortize initialization per task, not per row.
  *
  * NOTE ON STUBS: this container ships no image/audio codecs, so
  * [[FakeCodec]] derives deterministic pseudo-metadata/features from the
  * bytes. The Spark-side contract — schema, batching, partition sizing,
  * per-partition decoder lifecycle — is real and tested; swapping
  * [[FakeCodec]] for a JNI/javacv decoder changes no plumbing.
  */
object Multimodal {

  /** One media asset row. */
  final case class MediaAsset(
      asset_id: Long,
      media_type: String, // image | audio | video
      content: Array[Byte])

  final case class MediaMeta(
      asset_id: Long,
      media_type: String,
      byte_size: Long,
      width: Int,
      height: Int,
      duration_ms: Long,
      format: String)

  final case class MediaFeature(
      asset_id: Long,
      feature: Array[Float])

  /** STUB decoder: deterministic pseudo-properties from content bytes.
    * Replace with a real codec for production; signature stays.
    *
    * Properties derive from the md5-prefix of the content (28-bit value,
    * same construction as [[graft.functions.TextFunctions]]' h28) so the
    * extraction is reproducible in any engine with md5 — this is what
    * makes q_media_meta / q_media_features DuckDB-oracle-checkable. */
  object FakeCodec {
    /** 28-bit value from the leading 7 hex digits of md5(bytes) —
      * bit-identical to SQL `conv(substring(md5(x),1,7),16,10)`. */
    def h28(bytes: Array[Byte]): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(bytes).map("%02x".format(_)).mkString.substring(0, 7)
      java.lang.Long.parseLong(hex, 16)
    }

    def probe(mediaType: String, bytes: Array[Byte]): (Int, Int, Long, String) = {
      val h = h28(bytes)
      val w = (64 + h % 1024).toInt
      val ht = (64 + (h / 1024) % 1024).toInt
      val dur = if (mediaType == "image") 0L else 1000L + h % 600000
      val fmt = mediaType match {
        case "image" => if (h % 2 == 0) "png" else "jpeg"
        case "audio" => "wav"
        case _ => "mp4"
      }
      (w, ht, dur, fmt)
    }

    /** Deterministic fixed-width feature vector (stands in for an
      * embedding model forward pass): component i = permil value
      * `(h28 * (i+31)) % 1000 / 1000`. */
    def features(bytes: Array[Byte], dim: Int = 16): Array[Float] = {
      val h = h28(bytes)
      val out = new Array[Float](dim)
      var i = 0
      while (i < dim) {
        out(i) = ((h * (i + 31)) % 1000) / 1000.0f
        i += 1
      }
      out
    }
  }

  /** Extract typed metadata. Runs as mapPartitions so a real decoder
    * initializes once per task. */
  def extractMeta(assets: Dataset[MediaAsset]): Dataset[MediaMeta] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      // per-partition decoder init would go here
      it.map { a =>
        val (w, h, dur, fmt) = FakeCodec.probe(a.media_type, a.content)
        MediaMeta(a.asset_id, a.media_type, a.content.length.toLong, w, h, dur, fmt)
      }
    }
  }

  /** Per-asset feature vectors (batch shape: one partition per task,
    * decoder amortized). */
  def extractFeatures(assets: Dataset[MediaAsset], dim: Int = 16): Dataset[MediaFeature] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions(_.map(a => MediaFeature(a.asset_id, FakeCodec.features(a.content, dim))))
  }

  /** Frame sampling plumbing for video: emit (asset_id, frame_idx,
    * frame_bytes) rows — the stub slices the source bytes; a real
    * implementation decodes at timestamps. Output explodes rows, so
    * repartition by asset first to bound task size. */
  def sampleFrames(assets: Dataset[MediaAsset], everyMs: Long = 1000L): DataFrame = {
    import assets.sparkSession.implicits._
    assets.filter(_.media_type == "video").flatMap { a =>
      val (_, _, dur, _) = FakeCodec.probe(a.media_type, a.content)
      val n = math.min(dur / everyMs, 32L).toInt
      (0 until n).map { i =>
        val start = (i * math.max(a.content.length / math.max(n, 1), 1)) % math.max(a.content.length, 1)
        val end = math.min(start + 16, a.content.length)
        (a.asset_id, i, a.content.slice(start, end))
      }
    }.toDF("asset_id", "frame_idx", "frame_bytes")
  }

  /** Media-aware repartitioning: pack assets into tasks by cumulative
    * byte size (a 100 TB media table must not put 2 GB videos and 2 KB
    * icons in the same fixed-row-count partitions). */
  def repartitionBySize(df: DataFrame, targetBytesPerTask: Long): DataFrame = {
    val sized = df.withColumn("__bytes", length(col("content")).cast("long"))
    val total = sized.agg(sum("__bytes")).collect()(0).getLong(0)
    val parts = math.max(1, (total / targetBytesPerTask).toInt)
    sized.drop("__bytes").repartition(parts)
  }
}
