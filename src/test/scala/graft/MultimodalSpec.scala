package graft

import org.apache.spark.sql.functions._

import graft.extensions.{Multimodal, Similarity}
import graft.extensions.Multimodal.FakeCodec

/** Multimodal binary-column plumbing: schemas, iterator batching, flatMap
  * frame explosion, and embedding-shaped features feeding the similarity
  * operators unchanged — plus the four REAL codecs behind the trait
  * (RIFF/WAVE audio, BMP and ImageIO PNG/JPEG images, RIFF/AVI video)
  * decoding genuine media bytes. FakeCodec appears only as the h14
  * plumbing fixture whose formulas the oracle replays.
  */
class MultimodalSpec extends SparkSpec {

  private def media = Multimodal.toMedia(
    Tables.documents(spark, sf), "doc_id", "text")

  test("toMedia: binary payload column with kind routing, round-trippable") {
    val m = media
    assert(m.schema("payload").dataType.typeName === "binary")
    val kinds = m.toDF().groupBy("kind").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(kinds.keySet === Set("image", "audio", "video"))
    // payload really is the UTF-8 text bytes
    val row = m.filter(col("media_id") === 0).head()
    val doc0 = Tables.documents(spark, sf).filter(col("doc_id") === 0)
      .head().getAs[String]("text")
    assert(new String(row.payload, "UTF-8") === doc0)
  }

  test("parquet round-trip preserves binary payloads bit-for-bit") {
    val back = Multimodal.roundTripParquet(media, "target/media_fixture_test")
    assert(back.schema("payload").dataType.typeName === "binary")
    val orig = media.collect().map(m => m.media_id -> m.payload.toSeq).toMap
    val rt = back.collect().map(m => m.media_id -> m.payload.toSeq).toMap
    assert(rt === orig)
  }

  test("extractMeta matches the fake-codec formulas for every kind") {
    val metas = Multimodal.extractMeta(media).collect()
    assert(metas.length === media.count())
    metas.foreach { mm =>
      mm.kind match {
        case "audio" =>
          assert(mm.width === 0 && mm.height === 0 && mm.n_frames === 0)
        case "image" =>
          assert(mm.width === 16 + mm.n_bytes % 64)
          assert(mm.n_frames === 1)
        case "video" =>
          assert(mm.height === 16 + (mm.n_bytes * 7) % 64)
          assert(mm.n_frames === (mm.n_bytes + 255) / 256)
      }
    }
  }

  test("video metadata n_frames equals actual frameSample output count") {
    val videos = media.filter(col("kind") === "video")
    val metaCounts = Multimodal.extractMeta(videos).toDF()
      .select("media_id", "n_frames")
    val frameCounts = Multimodal.frameSample(videos, everyNBytes = 256).toDF()
      .groupBy("media_id").count()
    val mismatches = metaCounts.join(frameCounts, "media_id")
      .filter(col("n_frames") =!= col("count")).count()
    assert(mismatches === 0)
  }

  test("frameSample explodes payloads into contiguous chunks that reassemble") {
    val one = media.filter(col("media_id") === 2) // video kind (2 % 3 = 2)
    val frames = Multimodal.frameSample(one, everyNBytes = 64).collect()
      .sortBy(_.frame_idx)
    val orig = one.head().payload
    assert(frames.map(_.frame_bytes.length).sum === orig.length)
    assert(frames.dropRight(1).forall(_.frame_bytes.length === 64))
    assert(frames.flatMap(_.frame_bytes).toSeq === orig.toSeq)
  }

  test("features are deterministic, L2-normalized, and ANN-compatible") {
    val f1 = Multimodal.extractFeatures(media, dim = 8)
    val fits = f1.limit(50).collect()
    fits.foreach { f =>
      assert(f.feature.length === 8)
      val n = math.sqrt(f.feature.map(x => x.toDouble * x).sum)
      assert(math.abs(n - 1.0) < 1e-5, s"not normalized: $n")
    }
    // embedding-shaped: brute-force top-k over features runs unchanged
    val feats = f1.toDF().select(col("media_id").as("vec_id"), col("feature").as("embedding"))
    val topk = Similarity.bruteForceTopK(
      feats, feats.filter(col("vec_id") < 2), "vec_id", "embedding", 3)
    assert(topk.count() === 6)
  }

  test("resizePlan excludes audio and scales dims") {
    val plan = Multimodal.resizePlan(Multimodal.extractMeta(media), 32, 32)
    assert(plan.filter(col("kind") === "audio").count() === 0)
    val r = plan.head()
    assert(r.getAs[Double]("scale_x") ===
      BigDecimal(32.0 / r.getAs[Long]("width"))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("ivfTopK: high recall vs brute force; k-means refinement never hurts") {
    val embs = Tables.embeddings(spark, sf)
    // query vectors DISJOINT from the 16 seed ids: a seed query's nearest
    // centroid is trivially itself, which would flatter the seed-only run
    val qs = embs.filter(col("vec_id") >= 100 && col("vec_id") < 116)
    val exact = Similarity.bruteForceTopK(embs, qs, "vec_id", "embedding", 5)
      .select("query_id", "neighbor_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    def recallAt(iters: Int): Double = {
      val ivf = Similarity.ivfTopK(embs, qs, "vec_id", "embedding", 5,
        nProbe = 4, kmeansIters = iters)
        .select("query_id", "neighbor_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(ivf.size === exact.size)
      (ivf intersect exact).size.toDouble / exact.size
    }
    val seedOnly = recallAt(0)
    val refined = recallAt(2)
    assert(refined >= 0.5, s"IVF recall too low: $refined")
    assert(refined >= seedOnly, s"k-means refinement regressed recall: $seedOnly -> $refined")
  }

  test("ivfTopK: fixed-point k-means is invariant under partitioning") {
    val embs = Tables.embeddings(spark, sf)
    val qs = embs.filter(col("vec_id") < 8)
    def run(parts: Int): Seq[String] =
      Similarity.ivfTopK(embs.repartition(parts), qs, "vec_id", "embedding", 5)
        .orderBy("query_id", "rank").collect().map(_.toString).toSeq
    assert(run(1) === run(7))
  }

  // --- WavCodec: real RIFF/WAVE bytes through the same codec trait --------

  /** Genuine PCM WAV bytes (canonical 44-byte header + 16-bit LE samples). */
  private def wavBytes(sampleRate: Int, channels: Int,
      samples: Array[Short]): Array[Byte] = {
    val blockAlign = channels * 2
    val dataLen = samples.length * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
    bb.put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
    bb.putShort(1).putShort(channels.toShort).putInt(sampleRate)
    bb.putInt(sampleRate * blockAlign).putShort(blockAlign.toShort).putShort(16)
    bb.put("data".getBytes("US-ASCII")).putInt(dataLen)
    samples.foreach(bb.putShort)
    bb.array()
  }

  test("WavCodec decodes real RIFF/WAVE fixtures through the distributed pipeline") {
    import spark.implicits._
    val mono = (0 until 1000).map(i =>
      (math.sin(i * 0.1) * 20000).toShort).toArray
    val stereo = (0 until 800).map(i =>
      (math.cos(i * 0.05) * 15000).toShort).toArray // 400 frames × 2 channels
    val rows = Seq(
      graft.extensions.MediaRow(1L, "audio", wavBytes(8000, 1, mono)),
      graft.extensions.MediaRow(2L, "audio", wavBytes(44100, 2, stereo)))
    val ds = spark.createDataset(rows)(
      org.apache.spark.sql.Encoders.product[graft.extensions.MediaRow])
    val meta = Multimodal.extractMeta(ds, codec = Multimodal.WavCodec)
      .collect().map(m => m.media_id -> m).toMap
    // width := sample rate, height := channels, n_frames := PCM frames
    assert(meta(1L).width === 8000L && meta(1L).height === 1L &&
      meta(1L).n_frames === 1000L)
    assert(meta(2L).width === 44100L && meta(2L).height === 2L &&
      meta(2L).n_frames === 400L)
    // frame chunks cover the data section exactly and preserve block align
    val frames = Multimodal.frameSample(ds, everyNBytes = 256,
      codec = Multimodal.WavCodec).collect()
    val rebuilt = frames.filter(_.media_id == 1L).sortBy(_.frame_idx)
      .flatMap(_.frame_bytes)
    assert(rebuilt.toSeq === wavBytes(8000, 1, mono).drop(44).toSeq)
    assert(frames.filter(_.media_id == 2L).forall(_.frame_bytes.length % 4 == 0))
    // features: L2-normalized, deterministic
    val f = Multimodal.extractFeatures(ds, dim = 4, codec = Multimodal.WavCodec)
      .collect().map(m => m.media_id -> m.feature).toMap
    assert(math.abs(f(1L).map(x => x.toDouble * x).sum - 1.0) < 1e-5)
    assert(f(1L).toSeq === Multimodal.extractFeatures(ds, dim = 4,
      codec = Multimodal.WavCodec).collect()
      .find(_.media_id == 1L).get.feature.toSeq)
    // malformed bytes are rejected, not silently zeroed
    intercept[Exception](Multimodal.WavCodec.decode(
      graft.extensions.MediaRow(3L, "audio", "not a wav at all".getBytes)))
    // non-integer-PCM (fmt tag 3 = IEEE float) must throw, not round-trip
    // mislabeled — the codec's sample math assumes integer PCM throughout
    val floatWav = wavBytes(8000, 1, mono.take(4))
    floatWav(20) = 3 // audioFormat LE low byte: 1 (PCM) → 3 (float)
    intercept[Exception](Multimodal.WavCodec.decode(
      graft.extensions.MediaRow(4L, "audio", floatWav)))
  }

  test("BmpCodec: encode/parse round-trip recovers dims and exact pixel bytes") {
    // width 5 → row stride 16 with 1 padding byte: exercises the alignment
    // logic that a naive 3*w stride would get wrong
    val px = Array.tabulate(5 * 4 * 3)(j => ((j * 11 + 3) % 256).toByte)
    val bmp = Multimodal.Bmp.encode(5, 4, px(_))
    assert(Multimodal.Bmp.parseHeader(bmp) === ((5, 4, 54)))
    assert(bmp.length === 54 + 16 * 4)
    assert(Multimodal.Bmp.pixels(bmp).toSeq === px.toSeq)
    // malformed bytes throw (same contract as WavCodec)
    intercept[Exception](Multimodal.Bmp.parseHeader("PNGnope".getBytes))
  }

  test("BmpCodec decodes real BMP fixtures through the distributed pipeline") {
    import graft.extensions.{MediaRow, Multimodal => M}
    val ds = M.toBmpMedia(Tables.documents(spark, sf), "doc_id")
    val meta = M.extractMeta(ds, codec = M.BmpCodec).collect()
    assert(meta.nonEmpty)
    meta.foreach { m =>
      assert(m.width === 4 + m.media_id % 5)
      assert(m.height === 3 + m.media_id % 4)
      assert(m.n_frames === 1L)
    }
    // imageStats sums match the generating arithmetic (the h52 oracle's view)
    val stats = M.imageStats(ds).collect()
    stats.foreach { s =>
      val expect = (0L until 3L * s.width * s.height)
        .map(j => (s.media_id * 31 + j * 7) % 256).sum
      assert(s.sum_bytes === expect, s"media ${s.media_id}")
    }
    // features are L2-normalized and padding-invariant (recompute from pixels)
    val feats = M.extractFeatures(ds, dim = 4, codec = M.BmpCodec).collect()
    feats.foreach(f =>
      assert(math.abs(f.feature.map(x => x.toDouble * x).sum - 1.0) < 1e-5))
  }

  test("resizeImages: real nearest-neighbor resample produces decodable BMPs") {
    import graft.extensions.{Multimodal => M}
    val ds = M.toBmpMedia(Tables.documents(spark, sf), "doc_id")
    val resized = M.resizeImages(ds, targetW = 3, targetH = 2)
    val meta = M.extractMeta(resized, codec = M.BmpCodec).collect()
    assert(meta.nonEmpty)
    meta.foreach(m => assert(m.width === 3L && m.height === 2L))
    // identity resize (same dims) is a pixel-exact no-op
    val one = ds.filter(_.media_id == 5L) // 5 → w=4+0=4? (5%5=0 → w=4, 5%4=1 → h=4)
    val src = one.collect().head
    val (w, h, _) = M.Bmp.parseHeader(src.payload)
    val same = M.resizeImages(one, w, h).collect().head
    assert(M.Bmp.pixels(same.payload).toSeq === M.Bmp.pixels(src.payload).toSeq)
    // nearest-neighbor content check on a hand-built 2x2 → 1x1 resize: the
    // surviving pixel is source (0,0)
    val px22 = Array.tabulate(2 * 2 * 3)(j => (10 * (j / 3) + j % 3).toByte)
    val small = M.Bmp.encode(2, 2, px22(_))
    val row = spark.createDataset(Seq(graft.extensions.MediaRow(9L, "image", small)))(
      org.apache.spark.sql.Encoders.product[graft.extensions.MediaRow])
    val shrunk = M.resizeImages(row, 1, 1).collect().head
    assert(M.Bmp.pixels(shrunk.payload).toSeq === px22.take(3).toSeq)
  }

  test("ImageIoCodec decodes real compressed PNGs; plane equals the BMP twin's") {
    import graft.extensions.{MediaRow, Multimodal => M}
    val docs = Tables.documents(spark, sf).limit(50)
    val png = M.toPngMedia(docs, "doc_id")
    // payloads are genuine PNG bytes (8-byte signature), not formula blobs
    val first = png.collect().head
    assert((first.payload(0) & 0xff) === 0x89 &&
      first.payload(1) === 'P'.toByte && first.payload(2) === 'N'.toByte)
    val meta = M.extractMeta(png, codec = M.ImageIoCodec).collect()
    assert(meta.nonEmpty)
    meta.foreach { m =>
      assert(m.width === 4 + m.media_id % 5)
      assert(m.height === 3 + m.media_id % 4)
      assert(m.n_frames === 1L)
    }
    // PNG is lossless, so the decoded top-down BGR plane must equal the
    // BMP twin's byte-for-byte — the cross-codec contract downstream
    // passes rely on
    val bmp = M.toBmpMedia(docs, "doc_id")
    val pPlanes = M.frameSample(png, codec = M.ImageIoCodec).collect()
      .map(f => f.media_id -> f.frame_bytes.toSeq).toMap
    val bPlanes = M.frameSample(bmp, codec = M.BmpCodec).collect()
      .map(f => f.media_id -> f.frame_bytes.toSeq).toMap
    assert(pPlanes === bPlanes)
    // identical planes ⇒ identical features across codecs
    val pf = M.extractFeatures(png, dim = 4, codec = M.ImageIoCodec).collect()
      .map(f => f.media_id -> f.feature.toSeq).toMap
    val bf = M.extractFeatures(bmp, dim = 4, codec = M.BmpCodec).collect()
      .map(f => f.media_id -> f.feature.toSeq).toMap
    assert(pf === bf)
    // undecodable bytes are rejected, not silently zeroed
    intercept[Exception](M.ImageIoCodec.decode(
      MediaRow(9L, "image", "not an image at all".getBytes)))
  }

  test("resizeImagesIo: compressed round-trip resize is pixel-exact; JPEG decodes") {
    import graft.extensions.{Multimodal => M}
    val docs = Tables.documents(spark, sf).limit(20)
    val png = M.toPngMedia(docs, "doc_id")
    val resized = M.resizeImagesIo(png, targetW = 3, targetH = 2)
    val planes = M.frameSample(resized, codec = M.ImageIoCodec).collect()
      .map(f => f.media_id -> f.frame_bytes).toMap
    assert(planes.nonEmpty)
    // nearest-neighbor expectation straight from the fixture formula,
    // through a decode→resample→PNG-encode→decode round trip
    planes.foreach { case (id, plane) =>
      val w = (4 + id % 5).toInt; val h = (3 + id % 4).toInt
      val expect = Array.tabulate(3 * 2 * 3) { j =>
        val p = j / 3; val c = j % 3
        val x = p % 3; val y = p / 3
        val sx = x * w / 3; val sy = y * h / 2
        ((id * 31 + ((sy * w + sx) * 3 + c).toLong * 7) % 256).toByte
      }
      assert(plane.toSeq === expect.toSeq, s"media $id")
    }
    // JPEG writer path: lossy, so assert the decode contract (dims), not bytes
    val jpg = M.resizeImagesIo(png, targetW = 4, targetH = 4, format = "jpg")
    val jm = M.extractMeta(jpg, codec = M.ImageIoCodec).collect()
    assert(jm.nonEmpty)
    jm.foreach(m => assert(m.width === 4L && m.height === 4L))
  }

  // --- ImageIoCodec negative payloads: the throw contract under real junk --

  test("ImageIoCodec rejects truncated, random, and empty payloads") {
    import graft.extensions.{MediaRow, Multimodal => M}
    val realPng = M.toPngMedia(Tables.documents(spark, sf).limit(1), "doc_id")
      .collect().head.payload
    // a valid 8-byte PNG signature with the data cut off mid-chunk: the
    // reader recognizes the format, then must fail the decode — not hang,
    // not return a null/zero row
    val truncated = realPng.take(12)
    val random = Array.tabulate[Byte](64)(i => ((i * 131 + 17) % 256).toByte)
    val empty = Array.empty[Byte]
    for (junk <- Seq(truncated, random, empty)) {
      val row = MediaRow(9L, "image", junk)
      intercept[Exception](M.ImageIoCodec.decode(row))
      intercept[Exception](M.ImageIoCodec.frames(row, 1).toList)
      intercept[Exception](M.ImageIoCodec.feature(row, 4))
    }
  }

  // --- AviCodec: real RIFF/AVI containers through the same codec trait ----

  test("Avi: encode/parse round-trip recovers dims, handler, frame slices") {
    import graft.extensions.{Multimodal => M}
    // width 5 → row stride 16 with padding: the same alignment trap the BMP
    // test pins, now inside frame chunks
    val f0 = M.Avi.rawFrame(5, 4, j => ((j * 11 + 3) % 256).toByte)
    val f1 = M.Avi.rawFrame(5, 4, j => ((j * 5 + 1) % 256).toByte)
    val avi = M.Avi.encode(5, 4, fps = 10, "DIB ", IndexedSeq(f0, f1))
    // closed-form container size the h99 oracle replays:
    // 232 + Σ(8 + len) + 16·n (movi chunk headers + idx1 entries)
    assert(avi.length === 232 + 2 * (8 + 16 * 4) + 16 * 2)
    val info = M.Avi.parse(avi)
    assert(info.width === 5 && info.height === 4 && info.fourcc === "DIB ")
    assert(info.frames.size === 2)
    assert(info.frames.forall(!_.compressed))
    val s0 = java.util.Arrays.copyOfRange(avi,
      info.frames(0).offset, info.frames(0).offset + info.frames(0).length)
    assert(s0.toSeq === f0.toSeq)
    // odd-length frames (possible under MJPG) are word-padded in the walk:
    // the second chunk must still be located exactly
    val odd = M.Avi.encode(2, 2, fps = 5, "MJPG",
      IndexedSeq(Array[Byte](1, 2, 3), Array[Byte](4, 5, 6, 7)))
    val oi = M.Avi.parse(odd)
    assert(oi.frames.map(_.length) === IndexedSeq(3, 4))
    assert(oi.frames.forall(_.compressed))
    assert(java.util.Arrays.copyOfRange(odd, oi.frames(1).offset,
      oi.frames(1).offset + 4).toSeq === Seq[Byte](4, 5, 6, 7))
    // malformed bytes throw (same contract as every codec)
    intercept[Exception](M.Avi.parse("RIFFjunk".getBytes))
    intercept[Exception](M.Avi.parse(avi.take(40))) // truncated mid-header
    intercept[Exception](M.Avi.parse(Array.empty[Byte]))
  }

  test("AviCodec decodes real AVI fixtures through the distributed pipeline") {
    import graft.extensions.{Multimodal => M}
    val ds = M.toAviMedia(Tables.documents(spark, sf), "doc_id")
    // payloads are genuine RIFF/AVI containers, not formula blobs
    val first = ds.collect().head
    assert(new String(first.payload, 0, 4, "US-ASCII") === "RIFF")
    assert(new String(first.payload, 8, 4, "US-ASCII") === "AVI ")
    val meta = M.extractMeta(ds, codec = M.AviCodec).collect()
    assert(meta.nonEmpty)
    meta.foreach { m =>
      assert(m.width === 4 + m.media_id % 5)
      assert(m.height === 3 + m.media_id % 4)
      assert(m.n_frames === 2 + m.media_id % 3)
    }
    // frame sampling: stride 2 over the container's frames — count, source
    // frame indices, and per-frame decoded plane vs the generating formula
    val frames = M.frameSample(ds, everyNBytes = 2, codec = M.AviCodec).collect()
    val byId = frames.groupBy(_.media_id)
    byId.foreach { case (id, fs) =>
      val nf = 2 + id % 3
      assert(fs.map(_.frame_idx).sorted.toSeq === (0L until nf by 2).toSeq)
      val w = (4 + id % 5).toInt; val h = (3 + id % 4).toInt
      fs.foreach { f =>
        val expect = Array.tabulate(3 * w * h)(j =>
          ((id * 31 + f.frame_idx * 11 + j.toLong * 7) % 256).toByte)
        assert(f.frame_bytes.toSeq === expect.toSeq, s"media $id frame ${f.frame_idx}")
      }
    }
    // videoStats (the h99 query body) matches the generating arithmetic
    val stats = M.videoStats(ds, frameStride = 2).collect()
    stats.foreach { s =>
      val nf = 2 + s.media_id % 3
      assert(s.n_frames === nf && s.n_sampled === (nf + 1) / 2)
      val expect = (0L until nf by 2).map { k =>
        (0L until 3L * s.width * s.height)
          .map(j => (s.media_id * 31 + k * 11 + j * 7) % 256).sum
      }.sum
      assert(s.sum_bytes === expect, s"media ${s.media_id}")
    }
    // features are L2-normalized and fold all frames
    val feats = M.extractFeatures(ds, dim = 4, codec = M.AviCodec).collect()
    feats.foreach(f =>
      assert(math.abs(f.feature.map(x => x.toDouble * x).sum - 1.0) < 1e-5))
  }

  test("resampleAudio: nearest-frame rate conversion, alignment and identity laws") {
    import graft.extensions.{MediaRow, Multimodal => M}
    val mono = (0 until 1000).map(_.toShort).toArray // sample value == index
    val stereo = (0 until 800).map(i =>
      (if (i % 2 == 0) i else -i).toShort).toArray // 400 L/R frames
    val ds = spark.createDataset(Seq(
      MediaRow(1L, "audio", wavBytes(8000, 1, mono)),
      MediaRow(2L, "audio", wavBytes(44100, 2, stereo))))(
      org.apache.spark.sql.Encoders.product[MediaRow])
    // 2:1 downsample: rate halves, every 2nd sample survives verbatim
    val down = M.resampleAudio(ds, 4000).filter(_.media_id == 1L).collect().head
    val meta = M.WavCodec.decode(down)
    assert(meta.width === 4000L && meta.height === 1L && meta.n_frames === 500L)
    val kept = down.payload.drop(44).grouped(2)
      .map(b => ((b(0) & 0xff) | (b(1) << 8)).toShort).toSeq
    assert(kept === (0 until 1000 by 2).map(_.toShort))
    // identity resample: byte-identical payload (header and data)
    val same = M.resampleAudio(ds, 8000).filter(_.media_id == 1L).collect().head
    assert(same.payload.toSeq === wavBytes(8000, 1, mono).toSeq)
    // stereo: block alignment preserved — L/R pairs move together
    val st = M.resampleAudio(ds, 22050).filter(_.media_id == 2L).collect().head
    val sm = M.WavCodec.decode(st)
    assert(sm.width === 22050L && sm.height === 2L && sm.n_frames === 200L)
    val firstFrame = st.payload.slice(44, 48) // one 4-byte L/R block
    assert(firstFrame.toSeq === wavBytes(44100, 2, stereo).slice(44, 48).toSeq)
    // upsample: frames repeat by nearest index, count scales
    val up = M.resampleAudio(ds, 16000).filter(_.media_id == 1L).collect().head
    assert(M.WavCodec.decode(up).n_frames === 2000L)
    val upSamples = up.payload.drop(44).grouped(2)
      .map(b => ((b(0) & 0xff) | (b(1) << 8)).toShort).toSeq
    assert(upSamples.take(4) === Seq[Short](0, 0, 1, 1))
  }

  test("toWavMedia + audioStats: real WAV fixture matches the generating arithmetic") {
    import graft.extensions.{Multimodal => M}
    val ds = M.toWavMedia(Tables.documents(spark, sf).limit(40), "doc_id")
    val first = ds.collect().head
    assert(new String(first.payload, 0, 4, "US-ASCII") === "RIFF")
    assert(new String(first.payload, 8, 4, "US-ASCII") === "WAVE")
    val stats = M.audioStats(ds).collect()
    assert(stats.nonEmpty)
    stats.foreach { s =>
      val n = 50 + s.media_id % 50
      assert(s.sample_rate === 8000L && s.channels === 1L && s.n_frames === n)
      assert(s.n_bytes === 44 + 2 * n)
      val expect = (0L until n)
        .map(i => (s.media_id * 13 + i * 7) % 65536 - 32768).sum
      assert(s.sum_samples === expect, s"media ${s.media_id}")
    }
  }

  test("resizeVideos: per-frame nearest-neighbor resample, fps and count preserved") {
    import graft.extensions.{MediaRow, Multimodal => M}
    val ds = M.toAviMedia(Tables.documents(spark, sf).limit(50), "doc_id")
    val resized = M.resizeVideos(ds, targetW = 3, targetH = 2)
    val meta = M.extractMeta(resized, codec = M.AviCodec).collect()
    assert(meta.nonEmpty)
    meta.foreach { m =>
      assert(m.width === 3L && m.height === 2L)
      assert(m.n_frames === 2 + m.media_id % 3) // frame count preserved
    }
    // fps preserved through parse → re-encode (fixture encodes at 10)
    val one = resized.filter(_.media_id == 4L).collect().head
    assert(M.Avi.parse(one.payload).fps === 10)
    // per-frame nearest-neighbor expectation straight from the fixture
    // formula, through a decode→resample→re-encode→decode round trip
    val frames = M.frameSample(resized, everyNBytes = 1, codec = M.AviCodec).collect()
    frames.foreach { f =>
      val id = f.media_id
      val w = (4 + id % 5).toInt; val h = (3 + id % 4).toInt
      val expect = Array.tabulate(3 * 2 * 3) { j =>
        val p = j / 3; val c = j % 3
        val x = p % 3; val y = p / 3
        val sx = x * w / 3; val sy = y * h / 2
        ((id * 31 + f.frame_idx * 11 + ((sy * w + sx) * 3 + c).toLong * 7) % 256).toByte
      }
      assert(f.frame_bytes.toSeq === expect.toSeq, s"media $id frame ${f.frame_idx}")
    }
    // identity resize (same dims) is pixel-exact per frame
    val five = ds.filter(_.media_id == 5L)
    val w5 = (4 + 5 % 5); val h5 = (3 + 5 % 4)
    val same = M.resizeVideos(five, w5, h5)
    val a = M.frameSample(five, 1, M.AviCodec).collect().sortBy(_.frame_idx)
    val b = M.frameSample(same, 1, M.AviCodec).collect().sortBy(_.frame_idx)
    assert(a.length === b.length)
    a.zip(b).foreach { case (x, y) =>
      assert(x.frame_bytes.toSeq === y.frame_bytes.toSeq)
    }
    // MJPEG input: resample decodes through the ImageIO frame path, output
    // is raw DIB at the target dims with the frame count preserved
    def jpeg(): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        8, 6, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 6; x <- 0 until 8) img.setRGB(x, y, (y * 8 + x) * 65793)
      val baos = new java.io.ByteArrayOutputStream()
      val out = new javax.imageio.stream.MemoryCacheImageOutputStream(baos)
      try require(javax.imageio.ImageIO.write(img, "jpg", out)) finally out.close()
      baos.toByteArray
    }
    val mj = spark.createDataset(Seq(MediaRow(77L, "video",
      M.Avi.encode(8, 6, fps = 25, "MJPG", IndexedSeq(jpeg(), jpeg(), jpeg())))))(
      org.apache.spark.sql.Encoders.product[MediaRow])
    val mjOut = M.resizeVideos(mj, 4, 3).collect().head
    val mjInfo = M.Avi.parse(mjOut.payload)
    assert(mjInfo.width === 4 && mjInfo.height === 3 && mjInfo.fps === 25)
    assert(mjInfo.fourcc === "DIB " && mjInfo.frames.size === 3)
    assert(mjInfo.frames.forall(!_.compressed))
  }

  test("AviCodec decodes MJPEG streams via the ImageIO frame path") {
    import graft.extensions.{MediaRow, Multimodal => M}
    // two genuine JPEG frames (8x6, distinct fills) encoded with ImageIO
    def jpeg(seed: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        8, 6, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 6; x <- 0 until 8)
        img.setRGB(x, y, ((seed * 37 + y * 8 + x) * 1315423911) & 0xffffff)
      val baos = new java.io.ByteArrayOutputStream()
      val out = new javax.imageio.stream.MemoryCacheImageOutputStream(baos)
      try require(javax.imageio.ImageIO.write(img, "jpg", out)) finally out.close()
      baos.toByteArray
    }
    val j0 = jpeg(1); val j1 = jpeg(2)
    val avi = M.Avi.encode(8, 6, fps = 10, "MJPG", IndexedSeq(j0, j1))
    val row = MediaRow(7L, "video", avi)
    val meta = M.AviCodec.decode(row)
    assert(meta.width === 8L && meta.height === 6L && meta.n_frames === 2L)
    // each decoded frame plane equals ImageIoCodec's decode of the SAME
    // JPEG bytes directly — the in-container and standalone paths agree
    // bit-for-bit (JPEG is lossy, but both decode identical bytes)
    val aviPlanes = M.AviCodec.frames(row, 1).toList.sortBy(_.frame_idx)
    val direct = Seq(j0, j1).zipWithIndex.map { case (j, i) =>
      M.ImageIoCodec.frames(MediaRow(i.toLong, "image", j), 1).next().frame_bytes
    }
    assert(aviPlanes.size === 2)
    assert(aviPlanes(0).frame_bytes.toSeq === direct(0).toSeq)
    assert(aviPlanes(1).frame_bytes.toSeq === direct(1).toSeq)
  }

  test("mjpegVerifyStats: in-container MJPEG decode matches regenerated frames") {
    import graft.extensions.{Multimodal => M}
    val docs = Tables.documents(spark, sf).limit(24)
    val rows = M.mjpegVerifyStats(M.toMjpegMedia(docs, "doc_id"), frameStride = 2)
      .collect().sortBy(_.media_id)
    assert(rows.length === 24)
    rows.foreach { r =>
      val id = r.media_id
      // fixture dims/frame-count law (the part the SQL oracle replays)
      assert(r.width === 8 + id % 5)
      assert(r.height === 6 + id % 4)
      assert(r.n_frames === 2 + id % 3)
      assert(r.n_sampled === (r.n_frames + 1) / 2)
      // every sampled frame's container-sliced decode equals the direct
      // decode of the regenerated JPEG — the h102 equality gate
      assert(r.n_matched === r.n_sampled,
        s"media $id: ${r.n_matched}/${r.n_sampled} frames matched")
    }
    // stride 1 samples (and must match) every frame
    val all = M.mjpegVerifyStats(M.toMjpegMedia(docs.limit(5), "doc_id"),
      frameStride = 1).collect()
    all.foreach(r => assert(r.n_sampled === r.n_frames && r.n_matched === r.n_frames))
  }

  test("AviCodec rejects raw frame chunks shorter than one frame") {
    import graft.extensions.{MediaRow, Multimodal => M}
    // Avi.encode takes the frame bytes verbatim, so a too-short '00db'
    // payload yields a structurally valid container whose frame chunk
    // cannot hold a 4x3 frame — decode must throw (codec contract), not
    // read adjacent container bytes (idx1/next header) as pixels
    val short = M.Avi.encode(4, 3, fps = 10, "DIB ",
      IndexedSeq(Array.fill[Byte](5)(1)))
    val ex = intercept[IllegalArgumentException] {
      M.AviCodec.frames(MediaRow(1L, "video", short), 1).toList
    }
    assert(ex.getMessage.contains("shorter than one"))
    // a full-size frame still decodes
    val ok = M.Avi.encode(4, 3, fps = 10, "DIB ",
      IndexedSeq(M.Avi.rawFrame(4, 3, _ => 7.toByte)))
    val planes = M.AviCodec.frames(MediaRow(2L, "video", ok), 1).toList
    assert(planes.size === 1 && planes.head.frame_bytes.forall(_ === 7.toByte))
  }
}
