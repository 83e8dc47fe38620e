package graft.extensions

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._

/** One media object: opaque binary payload + routing metadata. At 100 TB the
  * payload column dominates — loaders should keep
  * `spark.sql.files.maxPartitionBytes` at its 128 MB default so a partition
  * holds a bounded number of blobs, and operators below never materialize a
  * whole partition (strictly iterator-to-iterator).
  */
case class MediaRow(media_id: Long, kind: String, payload: Array[Byte])

/** Typed decode result (per-kind fields zeroed when not applicable). */
case class MediaMeta(media_id: Long, kind: String, n_bytes: Long,
    width: Long, height: Long, n_frames: Long)

/** One sampled frame of a video payload. */
case class MediaFrame(media_id: Long, frame_idx: Long, frame_bytes: Array[Byte])

/** Fixed-dim feature vector extracted from a payload (embedding-shaped:
  * joins/ANN-compatible with the `embeddings` table operators).
  */
case class MediaFeature(media_id: Long, kind: String, feature: Array[Float])

/** Multimodal (image/audio/video) column processing: opaque `binary` payloads
  * with typed metadata, processed by iterator-based `mapPartitions` passes —
  * the Scala analogue of arrow-batched `mapInPandas`: one JVM-side codec
  * instance per partition, streamed row batches, typed output schema.
  *
  * ── STUB BOUNDARY ──────────────────────────────────────────────────────
  * This container has no image/audio codec libraries, so `FakeCodec` below
  * is a DETERMINISTIC FAKE: it derives plausible metadata/frames/features
  * from the payload bytes alone (documented formulas, mirrored by the
  * DuckDB oracle). A production deployment swaps `FakeCodec` for a real
  * codec (e.g. javax.imageio / ffmpeg bindings) behind the same
  * `MediaCodec` trait — every Spark-side shape (schemas, partitioning,
  * lazy iterator batching, per-partition codec lifecycle) is real and
  * tested. [[WavCodec]] demonstrates the boundary with a real format: it
  * parses actual RIFF/WAVE bytes (no library needed) through the identical
  * trait, and MultimodalSpec decodes a genuine PCM fixture with it.
  * ───────────────────────────────────────────────────────────────────────
  */
object Multimodal {

  /** Codec contract: one instance is created per partition (cheap here; a
    * real codec would hold native handles — hence per-partition, not per-row).
    */
  trait MediaCodec extends Serializable {
    def decode(m: MediaRow): MediaMeta
    def frames(m: MediaRow, everyNBytes: Int): Iterator[MediaFrame]
    def feature(m: MediaRow, dim: Int): Array[Float]
  }

  /** Deterministic fake codec (see STUB BOUNDARY above). Formulas:
    *   width    = 16 + n_bytes mod 64          (image/video; 0 for audio)
    *   height   = 16 + (n_bytes * 7) mod 64    (image/video; 0 for audio)
    *   n_frames = image → 1, audio → 0, video → ceil(n_bytes / 256)
    *              (== frames(m, 256).size — metadata and frame sampling must
    *              agree; MultimodalSpec cross-checks them)
    *   frame i  = payload[i*everyN ... min((i+1)*everyN, n)-1]
    *   feature  = L2-normalized folded byte sums over `dim` strides
    */
  object FakeCodec extends MediaCodec {
    def decode(m: MediaRow): MediaMeta = {
      val n = m.payload.length.toLong
      m.kind match {
        case "image" => MediaMeta(m.media_id, m.kind, n, 16 + n % 64, 16 + (n * 7) % 64, 1L)
        case "audio" => MediaMeta(m.media_id, m.kind, n, 0L, 0L, 0L)
        case _       => MediaMeta(m.media_id, m.kind, n, 16 + n % 64, 16 + (n * 7) % 64, (n + 255) / 256)
      }
    }
    def frames(m: MediaRow, everyNBytes: Int): Iterator[MediaFrame] =
      m.payload.grouped(everyNBytes).zipWithIndex.map { case (chunk, i) =>
        MediaFrame(m.media_id, i.toLong, chunk)
      }
    def feature(m: MediaRow, dim: Int): Array[Float] = {
      val acc = new Array[Double](dim)
      var i = 0
      while (i < m.payload.length) {
        acc(i % dim) += (m.payload(i) & 0xff).toDouble
        i += 1
      }
      val nrm = math.sqrt(acc.map(x => x * x).sum) max 1e-12
      acc.map(x => (x / nrm).toFloat)
    }
  }

  /** A REAL decoder behind the same trait — proof the stub boundary holds
    * for genuine media bytes: parses RIFF/WAVE headers (PCM) with no codec
    * library. Field mapping for [[MediaMeta]] on audio:
    * `width` := sample rate (Hz), `height` := channel count,
    * `n_frames` := PCM sample frames (data bytes / block align).
    * `frames` slices the data section in block-align-preserving chunks;
    * `feature` folds the 16-bit little-endian samples (normalized to
    * [-1, 1]) over `dim` strides, then L2-normalizes. Malformed bytes
    * throw — a codec's contract is real media in, not silent zeros.
    */
  object WavCodec extends MediaCodec {
    private def u16(b: Array[Byte], o: Int): Int =
      (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
    private def u32(b: Array[Byte], o: Int): Long =
      (b(o) & 0xffL) | ((b(o + 1) & 0xffL) << 8) |
        ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)
    private def tag(b: Array[Byte], o: Int): String =
      new String(b, o, 4, "US-ASCII")

    /** (sampleRate, channels, blockAlign, dataOffset, dataSize). */
    private def parse(b: Array[Byte]): (Int, Int, Int, Int, Int) = {
      require(b.length >= 44 && tag(b, 0) == "RIFF" && tag(b, 8) == "WAVE",
        "not a RIFF/WAVE payload")
      var o = 12
      var rate = -1; var ch = -1; var align = -1
      var dOff = -1; var dLen = -1
      while (o + 8 <= b.length) {
        val id = tag(b, o); val len = u32(b, o + 4).toInt
        if (id == "fmt " && o + 24 <= b.length) {
          ch = u16(b, o + 10); rate = u32(b, o + 12).toInt; align = u16(b, o + 20)
        } else if (id == "data") { dOff = o + 8; dLen = math.min(len, b.length - dOff) }
        o += 8 + len + (len & 1) // RIFF chunks are word-aligned
      }
      require(rate > 0 && ch > 0 && align > 0 && dOff >= 0,
        "WAVE payload missing fmt/data chunks")
      (rate, ch, align, dOff, dLen)
    }

    def decode(m: MediaRow): MediaMeta = {
      val (rate, ch, align, _, dLen) = parse(m.payload)
      MediaMeta(m.media_id, m.kind, m.payload.length.toLong,
        rate.toLong, ch.toLong, dLen.toLong / align)
    }

    def frames(m: MediaRow, everyNBytes: Int): Iterator[MediaFrame] = {
      val (_, _, align, dOff, dLen) = parse(m.payload)
      val step = math.max(align, everyNBytes / align * align) // whole frames
      Iterator.range(0, dLen, step).zipWithIndex.map { case (start, i) =>
        val end = math.min(start + step, dLen)
        MediaFrame(m.media_id, i.toLong,
          java.util.Arrays.copyOfRange(m.payload, dOff + start, dOff + end))
      }
    }

    def feature(m: MediaRow, dim: Int): Array[Float] = {
      val (_, _, _, dOff, dLen) = parse(m.payload)
      val acc = new Array[Double](dim)
      var i = 0
      var s = 0
      while (i + 1 < dLen) {
        val sample = (u16(m.payload, dOff + i) << 16) >> 16 // sign-extend
        acc(s % dim) += sample / 32768.0
        i += 2; s += 1
      }
      val nrm = math.sqrt(acc.map(x => x * x).sum) max 1e-12
      acc.map(x => (x / nrm).toFloat)
    }
  }

  /** Adapt the `documents` table into a media table (payload = UTF-8 bytes,
    * kind assigned by id mod 3) — the fixture generator for the multimodal
    * path; a real pipeline reads (id, kind, payload) parquet directly.
    */
  def toMedia(docs: DataFrame, idCol: String, textCol: String): Dataset[MediaRow] = {
    implicit val enc = Encoders.product[MediaRow]
    docs.select(
      col(idCol).cast("long").as("media_id"),
      when(col(idCol) % 3 === 0, "image")
        .when(col(idCol) % 3 === 1, "audio")
        .otherwise("video").as("kind"),
      encode(col(textCol), "UTF-8").as("payload")).as[MediaRow]
  }

  /** Materialize a media table as real `(media_id, kind, payload binary)`
    * parquet and read it back — the binary-column IO a production pipeline
    * performs between acquisition and processing (parquet stores the payload
    * as BYTE_ARRAY; the read-back is the fixture every downstream operator
    * sees). Write + scan both stream; nothing driver-side.
    */
  def roundTripParquet(media: Dataset[MediaRow], path: String): Dataset[MediaRow] = {
    implicit val enc = Encoders.product[MediaRow]
    media.toDF().write.mode("overwrite").parquet(path)
    media.sparkSession.read.parquet(path).as[MediaRow]
  }

  /** Decode pass: binary → typed metadata. Iterator-to-iterator (no partition
    * materialization); codec instantiated once per partition.
    */
  def extractMeta(media: Dataset[MediaRow],
      codec: MediaCodec = FakeCodec): Dataset[MediaMeta] = {
    implicit val enc = Encoders.product[MediaMeta]
    media.mapPartitions(it => it.map(codec.decode))
  }

  /** Frame sampling: one input row → n output rows (flatMap batch shape). */
  def frameSample(media: Dataset[MediaRow], everyNBytes: Int = 256,
      codec: MediaCodec = FakeCodec): Dataset[MediaFrame] = {
    implicit val enc = Encoders.product[MediaFrame]
    media.mapPartitions(it => it.flatMap(m => codec.frames(m, everyNBytes)))
  }

  /** Feature extraction: binary → fixed-dim float vector, embedding-shaped
    * so downstream similarity/ANN operators (Similarity.*) apply unchanged.
    */
  def extractFeatures(media: Dataset[MediaRow], dim: Int = 8,
      codec: MediaCodec = FakeCodec): Dataset[MediaFeature] = {
    implicit val enc = Encoders.product[MediaFeature]
    media.mapPartitions(it => it.map(m =>
      MediaFeature(m.media_id, m.kind, codec.feature(m, dim))))
  }

  /** Metadata-level resize plan: new dims + scale factors, computed
    * relationally (no payload touch — a real resize would be another
    * mapPartitions pass over payloads with the same output schema).
    */
  def resizePlan(meta: Dataset[MediaMeta], targetW: Long, targetH: Long): DataFrame =
    meta.toDF()
      .filter(col("width") > 0)
      .select(col("media_id"), col("kind"), col("width"), col("height"),
        lit(targetW).as("new_width"), lit(targetH).as("new_height"),
        round(lit(targetW) / col("width"), 4).as("scale_x"),
        round(lit(targetH) / col("height"), 4).as("scale_y"))
}
