package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * payloads with typed metadata, plus decode / feature-extract /
  * resize / frame-sample operators.
  *
  * The DECODE STEP IS A STUB: real decoders (JPEG/PNG/audio codecs)
  * are not available in this environment, so `FakeCodec` derives
  * deterministic pseudo-decoded values from the raw bytes. Everything
  * around it — the binary schema, the typed Dataset API, the
  * mapPartitions batch shape, the partition-preserving execution — is
  * the real plumbing a production decoder would drop into: replace
  * `FakeCodec.decode` with a JNI/JavaCV call and nothing else changes.
  *
  * 100 TB posture: payloads stay distributed (no collect); decode runs
  * per-partition with bounded batch memory (BatchSize records at a
  * time); frame sampling explodes rows, so downstream partitioning is
  * re-established by the caller where needed.
  */
object Multimodal {

  /** One media object: opaque payload + typed envelope metadata. */
  case class MediaRecord(
      media_id: Long,
      media_type: String,          // image | audio | video
      content: Array[Byte],        // opaque payload
      declared_mime: String)

  /** Output of (stub) decode. */
  case class DecodedMeta(
      media_id: Long,
      media_type: String,
      n_bytes: Long,
      width: Int,                  // images/video
      height: Int,
      duration_ms: Long,           // audio/video
      n_frames: Int)               // video

  case class MediaFeatures(
      media_id: Long,
      n_bytes: Long,
      byte_mean: Double,
      byte_entropy_x1e4: Long,     // deterministic integer emission
      head_hash: Long)

  case class Frame(media_id: Long, frame_idx: Int, frame_bytes: Array[Byte])

  /** Per-partition processing batch size — the analog of an Arrow
    * record-batch: bounds peak decode memory per task regardless of
    * partition size. */
  val BatchSize = 64

  /** STUB codec: deterministic pseudo-decode derived from payload
    * bytes. Replace with a real decoder binding in production. */
  object FakeCodec {
    def decode(r: MediaRecord): DecodedMeta = {
      val n = r.content.length.toLong
      DecodedMeta(
        media_id = r.media_id,
        media_type = r.media_type,
        n_bytes = n,
        width = if (r.media_type == "audio") 0 else (n % 640).toInt,
        height = if (r.media_type == "audio") 0 else (n % 480).toInt,
        duration_ms = if (r.media_type == "image") 0L else n * 10,
        n_frames = if (r.media_type == "video") (n % 120 + 1).toInt else 1)
    }

    /** Deterministic pseudo "resize": returns a payload whose length
      * encodes the target box (a real impl would re-encode pixels). */
    def resize(content: Array[Byte], w: Int, h: Int): Array[Byte] =
      content.take(math.max(1, math.min(content.length, (w * h) % 1024)))
  }

  /** Build a media table from the `documents` fixture: text bytes act
    * as the opaque payload (deterministic; UTF-8 of ASCII text). */
  def fromDocuments(spark: SparkSession, dir: String): Dataset[MediaRecord] = {
    import spark.implicits._
    spark.read.parquet(s"$dir/documents.parquet")
      .select(
        col("doc_id").as("media_id"),
        when(col("doc_id") % 3 === 0, "image")
          .when(col("doc_id") % 3 === 1, "audio")
          .otherwise("video").as("media_type"),
        col("text").cast("binary").as("content"),
        when(col("doc_id") % 3 === 0, "image/jpeg")
          .when(col("doc_id") % 3 === 1, "audio/wav")
          .otherwise("video/mp4").as("declared_mime"))
      .as[MediaRecord]
  }

  /** Decode metadata for every record — batched per partition. */
  def decodeAll(ds: Dataset[MediaRecord]): Dataset[DecodedMeta] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions(_.grouped(BatchSize).flatMap(_.map(FakeCodec.decode)))
  }

  /** Per-record content features: byte-level moments + head hash.
    * Entropy is emitted as floor(x*1e4) so results are exactly
    * reproducible across JVMs. */
  def extractFeatures(ds: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions(_.grouped(BatchSize).flatMap(_.map { r =>
      val bytes = r.content
      val n = bytes.length
      val counts = new Array[Long](256)
      var sum = 0L
      var i = 0
      while (i < n) { val b = bytes(i) & 0xff; counts(b) += 1; sum += b; i += 1 }
      var entropy = 0.0
      var j = 0
      while (j < 256) {
        if (counts(j) > 0) {
          val p = counts(j).toDouble / n
          entropy -= p * math.log(p) / math.log(2.0)
        }
        j += 1
      }
      var hash = 0L
      var k = 0
      val head = math.min(16, n)
      while (k < head) { hash = hash * 31 + (bytes(k) & 0xff); k += 1 }
      MediaFeatures(r.media_id, n.toLong, sum.toDouble / n,
                    math.floor(entropy * 10000).toLong, hash)
    }))
  }

  case class MediaFeaturesExact(
      media_id: Long,
      media_type: String,
      n_bytes: Long,
      byte_sum: Long,               // Σ unsigned byte values — exact
      head_hash: Long)              // 31-polynomial of first 16 bytes mod P

  /** Modulus for the head hash: both engines fold Σ bᵢ·31^(h−1−i)
    * mod P with the sum < 2⁶³ before the mod, so the value is
    * integer-exact cross-engine (an UNreduced 31-polynomial of 16
    * bytes overflows 64 bits, and DuckDB errors on overflow where
    * the JVM wraps — the explicit mod is what makes the feature
    * portable). */
  val HeadHashP = 1000000007L

  /** Integer-exact per-record content features (the oracle-checkable
    * counterpart of `extractFeatures`, whose float entropy is not
    * bit-portable across engines): byte mass and a modular
    * polynomial fingerprint of the head. Same bounded-batch
    * mapPartitions plumbing. */
  def extractFeaturesExact(ds: Dataset[MediaRecord]): Dataset[MediaFeaturesExact] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions(_.grouped(BatchSize).flatMap(_.map { r =>
      val bytes = r.content
      val n = bytes.length
      var sum = 0L
      var i = 0
      while (i < n) { sum += (bytes(i) & 0xff); i += 1 }
      var hash = 0L
      var k = 0
      val head = math.min(16, n)
      while (k < head) {
        hash = (hash * 31 + (bytes(k) & 0xff)) % HeadHashP
        k += 1
      }
      MediaFeaturesExact(r.media_id, r.media_type, n.toLong, sum, hash)
    }))
  }

  /** Pseudo-resize images/video stills to a bounding box. */
  def resizeAll(ds: Dataset[MediaRecord], w: Int, h: Int): Dataset[MediaRecord] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions(_.map { r =>
      if (r.media_type == "audio") r
      else r.copy(content = FakeCodec.resize(r.content, w, h))
    })
  }

  /** Sample every `everyN`-th frame of each video into its own row
    * (one-to-many: callers repartition downstream if needed). */
  def sampleFrames(ds: Dataset[MediaRecord], everyN: Int): Dataset[Frame] = {
    import ds.sparkSession.implicits._
    ds.filter(_.media_type == "video").mapPartitions(_.flatMap { r =>
      val meta = FakeCodec.decode(r)
      (0 until meta.n_frames by everyN).map { idx =>
        // STUB frame extraction: slice stands in for a decoded frame.
        val off = idx % math.max(1, r.content.length)
        Frame(r.media_id, idx, r.content.slice(off, off + 8))
      }
    })
  }
}
