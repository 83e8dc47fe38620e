package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalacheck.Prop.propBoolean

import graft.extensions.{Similarity, Splits, TextOps}

/** ScalaCheck property suites (SURVEY.md §5.2): algebraic laws of the text
  * primitives, similarity expression, deterministic dedup, and timestamp
  * derivation — each property runs its generated cases through real Spark
  * plans and compares against an independent driver-side reference
  * implementation.
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private val params = SCTest.Parameters.default
    .withMinSuccessfulTests(12)
    .withInitialSeed(org.scalacheck.rng.Seed(42L))

  private def check(p: Prop): Unit = {
    val res = SCTest.check(params, p)
    assert(res.passed, res.status.toString)
  }

  // printable-ascii words + assorted whitespace, the token-contract domain
  private val wordGen = Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString)
  private val wsGen = Gen.oneOf(" ", "  ", "\t", "\n", " \t ")
  private val textGen: Gen[String] = for {
    words <- Gen.listOfN(8, wordGen)
    seps <- Gen.listOfN(8, wsGen)
    lead <- wsGen
  } yield lead + words.zip(seps).map { case (w, s) => w + s }.mkString

  test("tokens == lowercased non-empty whitespace-split chunks (vs driver reference)") {
    check(Prop.forAll(Gen.listOfN(40, textGen)) { texts =>
      val got = texts.toDF("s").select(TextOps.tokens($"s").as("t"))
        .as[Seq[String]].collect()
      val want = texts.map(_.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq)
      got.toSeq == want
    })
  }

  test("shingles3 == tokens.sliding(3) (vs driver reference)") {
    check(Prop.forAll(Gen.listOfN(30, textGen)) { texts =>
      val got = texts.toDF("s")
        .select(TextOps.shingles3(TextOps.tokens($"s")).as("sh"))
        .as[Seq[String]].collect()
      val want = texts.map { s =>
        val t = s.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq
        if (t.size < 3) Seq.empty[String]
        else t.sliding(3).map(_.mkString(" ")).toSeq
      }
      got.toSeq == want
    })
  }

  private val vecGen: Gen[Seq[Float]] =
    Gen.listOfN(16, Gen.choose(-10.0f, 10.0f))
      .map(_.toSeq).suchThat(v => v.exists(x => math.abs(x) > 0.01f))

  test("cosine: self-similarity 1, symmetry, positive-scale invariance") {
    check(Prop.forAll(Gen.listOfN(20, Gen.zip(vecGen, vecGen, Gen.choose(0.1f, 8.0f)))) { triples =>
      val df = triples.toDF("a", "b", "s")
        .select(
          Similarity.cosine($"a", $"a").as("self"),
          Similarity.cosine($"a", $"b").as("ab"),
          Similarity.cosine($"b", $"a").as("ba"),
          Similarity.cosine(transform($"a", x => x * $"s"), $"b").as("scaled"))
        .collect()
      df.forall { r =>
        math.abs(r.getDouble(0) - 1.0) < 1e-6 &&
          math.abs(r.getDouble(1) - r.getDouble(2)) < 1e-12 &&
          math.abs(r.getDouble(1) - r.getDouble(3)) < 1e-5
      }
    })
  }

  test("deterministic dedup is idempotent and input-order invariant") {
    val rowGen = Gen.zip(Gen.choose(0, 5), Gen.identifier, Gen.choose(0, 100))
    check(Prop.forAll(Gen.listOfN(30, rowGen)) { rows =>
      rows.nonEmpty ==> {
        def dedup(xs: Seq[(Int, String, Int)]) =
          xs.toDF("k", "v", "ord")
            .groupBy($"k").agg(min(struct($"ord", $"v")).as("m"))
            .select($"k", $"m.v".as("v")).orderBy($"k")
            .collect().map(r => (r.getInt(0), r.getString(1))).toSeq
        val once = dedup(rows)
        dedup(scala.util.Random.shuffle(rows)) == once
      }
    })
  }

  test("date derivation inverts: to_date(date_format(ts)) == to_date(ts)") {
    val tsGen = Gen.choose(0L, 4102444800L) // 1970..2100 epoch seconds
    check(Prop.forAll(Gen.listOfN(40, tsGen)) { secs =>
      val df = secs.toDF("sec")
        .select(timestamp_seconds($"sec").as("ts"))
        .select(
          to_date(date_format($"ts", "yyyy-MM-dd")).as("via_string"),
          to_date($"ts").as("direct"))
      df.filter($"via_string" =!= $"direct").count() == 0
    })
  }

  test("sessionization: event conservation + gap bounds (vs driver fold)") {
    val evGen = Gen.zip(Gen.choose(1, 3), Gen.choose(0L, 20000L), Gen.choose(0.0, 9.0))
    check(Prop.forAll(Gen.listOfN(40, evGen)) { evs =>
      evs.nonEmpty ==> {
        val rows = evs.zipWithIndex.map { case ((u, off, v), i) =>
          (u.toLong, i.toLong, new java.sql.Timestamp(1600000000000L + off * 1000L),
            math.round(v * 100.0) / 100.0)
        }
        val out = graft.extensions.Sessionize.sessions(
          rows.toDF("user_id", "event_id", "ts", "value"), "user_id", "ts", 1800L)
          .collect()
        val nOut = out.map(_.getAs[Long]("n_events")).sum
        // driver-side reference: sort per user, fold on gap > 1800s
        val wantSessions = rows.groupBy(_._1).map { case (_, es) =>
          val ts = es.map(_._3.getTime).sorted
          1 + ts.sliding(2).count { case Seq(a, b) => b - a > 1800000L; case _ => false }
        }.sum
        nOut == rows.size && out.length == wantSessions
      }
    })
  }

  test("chunks: generated window/stride — coverage, overlap, reconstruction (vs driver reference)") {
    val caseGen = for {
      window <- Gen.choose(1, 9)
      stride <- Gen.choose(1, window)
      texts <- Gen.listOfN(12, textGen)
    } yield (window, stride, texts)
    check(Prop.forAll(caseGen) { case (window, stride, texts) =>
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val got = graft.extensions.Chunking
        .chunks(docs, "doc_id", "text", window, stride)
        .collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getString(3)))
        .groupBy(_._1)
      val want = texts.zipWithIndex.flatMap { case (t, i) =>
        val toks = t.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq
        if (toks.isEmpty) Nil
        else (0 to (toks.size - 1) / stride).map { c =>
          val piece = toks.slice(c * stride, c * stride + window)
          (i.toLong, c, piece.size, piece.mkString(" "))
        }
      }.groupBy(_._1)
      got.keySet == want.keySet &&
        got.forall { case (id, cs) =>
          cs.sortBy(_._2).toSeq == want(id).sortBy(_._2)
        }
    })
  }

  test("packBins: generated budgets — cumulative boundary law, monotone bins, dense pos") {
    val caseGen = for {
      budget <- Gen.choose(3, 60)
      texts <- Gen.listOfN(15, textGen)
    } yield (budget, texts)
    check(Prop.forAll(caseGen) { case (budget, texts) =>
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val out = graft.extensions.Chunking
        .packBins(docs, "doc_id", "text", budget)
        .collect()
        .map(r => (r.getString(1), r.getInt(2), r.getInt(3), r.getInt(4)))
      out.groupBy(_._1).forall { case (_, rows) =>
        val sorted = rows.sortBy(_._2) // by pos
        val cums = sorted.scanLeft(0) { case (c, (_, _, n, _)) => c + n }.tail
        val binsOk = sorted.zip(cums).forall { case ((_, _, _, bin), cum) =>
          bin == (cum - 1) / budget // the packing law, re-derived
        }
        // bins are monotone along the pack order (NOT contiguous: a doc
        // longer than the budget legitimately skips bin numbers)
        val monotone = sorted.map(_._4).toSeq == sorted.map(_._4).sorted.toSeq
        binsOk && monotone && sorted.map(_._2).toSeq == (1 to sorted.size)
      }
    })
  }

  test("Avi container: generated dims/frames round-trip encode→parse→decode exactly") {
    import graft.extensions.{MediaRow, Multimodal => M}
    val dimsGen = for {
      w <- Gen.choose(1, 12)
      h <- Gen.choose(1, 9)
      nf <- Gen.choose(0, 5) // zero-frame containers are legal AVI
      seed <- Gen.choose(0L, 1000000L)
    } yield (w, h, nf, seed)
    check(Prop.forAll(dimsGen) { case (w, h, nf, seed) =>
      def px(k: Int)(j: Int): Byte = ((seed + k * 131 + j.toLong * 7) % 256).toByte
      val frames = IndexedSeq.tabulate(nf)(k => M.Avi.rawFrame(w, h, px(k)))
      val avi = M.Avi.encode(w, h, fps = 10, "DIB ", frames)
      val info = M.Avi.parse(avi)
      val row = MediaRow(seed, "video", avi)
      val meta = M.AviCodec.decode(row)
      val planes = M.AviCodec.frames(row, 1).toList
      (info.width == w) :| "width" &&
        (info.height == h) :| "height" &&
        (info.fourcc == "DIB ") :| "fourcc" &&
        (meta.n_frames == nf.toLong) :| "n_frames" &&
        // closed-form size law the h99 oracle replays (rawFrame sizes are
        // 4-aligned, so no word padding enters)
        (avi.length == 232 + frames.map(8 + _.length).sum + 16 * nf) :| "size" &&
        (planes.size == nf) :| "planes" &&
        planes.zipWithIndex.forall { case (f, k) =>
          f.frame_bytes.toSeq == Array.tabulate(3 * w * h)(px(k)).toSeq
        } :| "pixel round-trip"
    })
  }

  test("Avi.parse rejects its RIFF sibling (WAVE) and truncations of valid AVIs") {
    import graft.extensions.{Multimodal => M}
    // a well-formed RIFF that is NOT an AVI must be rejected by format tag,
    // not mis-parsed — the two containers share the chunk grammar
    val wavish = "RIFF$   WAVEfmt ".getBytes("ISO-8859-1")
    intercept[Exception](M.Avi.parse(wavish))
    val avi = M.Avi.encode(3, 2, fps = 10, "DIB ",
      IndexedSeq(M.Avi.rawFrame(3, 2, j => j.toByte)))
    // every truncation point must throw or return only fully-contained
    // frames — never read past the buffer (no ArrayIndexOutOfBounds
    // escaping as a wrong answer)
    (12 until avi.length by 7).foreach { cut =>
      try {
        val info = M.Avi.parse(avi.take(cut))
        info.frames.foreach(fr => assert(fr.offset + fr.length <= cut))
      } catch { case _: IllegalArgumentException => /* contract throw */ }
    }
  }

  test("resampleAudio: generated rates/lengths obey the frame-count and kept-sample laws") {
    import graft.extensions.{MediaRow, Multimodal => M}
    def wav(rate: Int, samples: Array[Short]): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(44 + 2 * samples.length)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + 2 * samples.length)
      bb.put("WAVE".getBytes("US-ASCII"))
      bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
      bb.putShort(1).putShort(1).putInt(rate)
      bb.putInt(rate * 2).putShort(2).putShort(16)
      bb.put("data".getBytes("US-ASCII")).putInt(2 * samples.length)
      samples.foreach(bb.putShort)
      bb.array()
    }
    val gen = for {
      srcRate <- Gen.oneOf(4000, 8000, 11025, 16000, 44100)
      tgtRate <- Gen.oneOf(4000, 8000, 16000, 22050)
      n <- Gen.choose(1, 400)
      seed <- Gen.choose(0, 30000)
    } yield (srcRate, tgtRate, n, seed)
    check(Prop.forAll(gen) { case (srcRate, tgtRate, n, seed) =>
      val samples = Array.tabulate(n)(i => ((seed + i * 37) % 65536 - 32768).toShort)
      val ds = spark.createDataset(Seq(MediaRow(1L, "audio", wav(srcRate, samples))))(
        org.apache.spark.sql.Encoders.product[MediaRow])
      val out = M.resampleAudio(ds, tgtRate).collect().head
      val meta = M.WavCodec.decode(out)
      val expectN = (n.toLong * tgtRate / srcRate).toInt
      val got = out.payload.drop(44).grouped(2)
        .map(b => (((b(1) << 8) | (b(0) & 0xff))).toShort).toSeq
      val want = (0 until expectN).map(i => samples((i.toLong * srcRate / tgtRate).toInt))
      (meta.width == tgtRate.toLong) :| "rate" &&
        (meta.n_frames == expectN.toLong) :| "frame count law" &&
        (got == want) :| "kept-sample law" &&
        // identity law: resampling to the source rate is byte-exact
        (tgtRate != srcRate || out.payload.toSeq == wav(srcRate, samples).toSeq) :| "identity"
    })
  }

  test("MJPEG container slices decode identically to the standalone JPEGs (generated dims)") {
    import graft.extensions.{MediaRow, Multimodal => M}
    // generated dims/frame counts/fills produce JPEGs of arbitrary (odd and
    // even) byte lengths, so the word-padding path in the chunk walk is
    // exercised; the property pins that the in-container path (RIFF walk ->
    // '00dc' slice -> ImageIO) and the standalone ImageIO decode of the
    // SAME bytes agree bit-for-bit on every frame — h102's core claim over
    // the whole generated domain, not just the fixture law
    def jpeg(w: Int, h: Int, seed: Long): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w)
        img.setRGB(x, y, (((seed + y * w + x) * 1315423911L) & 0xffffff).toInt)
      val baos = new java.io.ByteArrayOutputStream()
      val out = new javax.imageio.stream.MemoryCacheImageOutputStream(baos)
      try require(javax.imageio.ImageIO.write(img, "jpg", out)) finally out.close()
      baos.toByteArray
    }
    val gen = for {
      w <- Gen.choose(1, 16)
      h <- Gen.choose(1, 12)
      nf <- Gen.choose(1, 4)
      seed <- Gen.choose(0L, 1000000L)
    } yield (w, h, nf, seed)
    check(Prop.forAll(gen) { case (w, h, nf, seed) =>
      val jpegs = IndexedSeq.tabulate(nf)(k => jpeg(w, h, seed + k * 977))
      val avi = M.Avi.encode(w, h, fps = 10, "MJPG", jpegs)
      val row = MediaRow(seed, "video", avi)
      val meta = M.AviCodec.decode(row)
      val planes = M.AviCodec.frames(row, 1).toList.sortBy(_.frame_idx)
      val direct = jpegs.map(j =>
        M.ImageIoCodec.frames(MediaRow(0L, "image", j), 1).next().frame_bytes)
      (meta.width == w.toLong && meta.height == h.toLong) :| "dims" &&
        (meta.n_frames == nf.toLong) :| "frame count" &&
        (planes.size == nf) :| "planes" &&
        planes.zip(direct).forall { case (p, d) =>
          p.frame_bytes.toSeq == d.toSeq
        } :| "slice == standalone decode"
    })
  }

  test("mjpegVerifyStats: every generated id/stride matches in full (vs the dims law)") {
    import graft.extensions.{Multimodal => M}
    import spark.implicits._
    val gen = for {
      ids <- Gen.listOfN(3, Gen.choose(0L, 100000L)).map(_.distinct)
      stride <- Gen.choose(1, 4)
    } yield (ids, stride)
    check(Prop.forAll(gen) { case (ids, stride) =>
      val media = M.toMjpegMedia(ids.toDF("doc_id"), "doc_id")
      val rows = M.mjpegVerifyStats(media, stride).collect()
      (rows.length == ids.size) :| "row per id" &&
        rows.forall { r =>
          val nf = 2 + r.media_id % 3
          r.width == 8 + r.media_id % 5 && r.height == 6 + r.media_id % 4 &&
            r.n_frames == nf &&
            r.n_sampled == (nf + stride - 1) / stride &&
            r.n_matched == r.n_sampled
        } :| "dims law + full match"
    })
  }

  test("rfmSegments fused ranking == driver-side ntile reference (generated activity)") {
    // random activity tables with deliberate ties (few distinct amounts and
    // dates) drive the fused union-rank path; a driver-side fold re-derives
    // ntile(5) per metric from the standard bucket law
    val txnGen = for {
      ent <- Gen.choose(1L, 12L)
      day <- Gen.choose(1, 28)
      amt <- Gen.oneOf(5.0, 10.0, 10.0, 25.0) // repeated → monetary ties
    } yield (ent, f"2024-01-$day%02d", amt)
    check(Prop.forAll(Gen.nonEmptyListOf(txnGen)) { txns =>
      val df = txns.toDF("cust", "d", "amt")
      val got = graft.extensions.Segmentation
        .rfmSegments(df, "cust", "d", "amt", "2024-02-01")
        .select("entity_id", "r_score", "f_score", "m_score")
        .as[(Long, Int, Int, Int)].collect()
        .map { case (e, a, b, c) => e -> ((a, b, c)) }.toMap
      // driver reference: aggregate, then ntile by the standard law
      val agg = txns.groupBy(_._1).map { case (e, rows) =>
        val rec = java.time.temporal.ChronoUnit.DAYS.between(
          java.time.LocalDate.parse(rows.map(_._2).max),
          java.time.LocalDate.parse("2024-02-01")).toInt
        val mon = BigDecimal(rows.map(_._3).sum).setScale(2,
          BigDecimal.RoundingMode.HALF_UP)
        (e, rec, rows.size.toLong, mon)
      }.toSeq
      val n = agg.size
      def ntile(rank: Int): Int = {
        val base = n / 5; val rem = n % 5; val cut = (base + 1) * rem
        if (rank <= cut) (rank - 1) / (base + 1) + 1
        else rem + (rank - cut - 1) / base + 1
      }
      def scores(sorted: Seq[Long]): Map[Long, Int] =
        sorted.zipWithIndex.map { case (e, i) => e -> ntile(i + 1) }.toMap
      val r = scores(agg.sortBy(a => (-a._2, a._1)).map(_._1))
      val f = scores(agg.sortBy(a => (a._3, a._1)).map(_._1))
      val m = scores(agg.sortBy(a => (a._4, a._1)).map(_._1))
      agg.forall { case (e, _, _, _) => got(e) == ((r(e), f(e), m(e))) }
    })
  }

  test("ppsSample: draw == driver systematic-PPS reference; hits partition total div step") {
    // weights include NEGATIVE and NULL entries: the contract clamps both
    // to 0 (keeping the cumulative line monotonic), and the w > 0 pick
    // filter then excludes them from the draw — the reference model applies
    // the same clamp before replaying the systematic selection
    val wGen = Gen.frequency(
      (8, Gen.chooseNum(-20L, 50L).map(Option(_))),
      (1, Gen.const(Option.empty[Long])))
    val rowsGen = Gen.listOfN(30, wGen)
    check(Prop.forAll(rowsGen, Gen.chooseNum(1, 10)) { (ws0, n) =>
      val ws = ws0.map(_.map(w => math.max(0L, w)).getOrElse(0L))
      val total = ws.sum
      (total > 0) ==> {
        val df = ws0.zipWithIndex.map { case (w, i) => (i.toLong, w) }.toDF("id", "w")
        val got = Splits.ppsSample(df, "id", $"w", n, bucketWidth = 7L)
          .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(4))).toSet
        val step = math.max(1L, total / n)
        var cum = 0L
        val want = ws.zipWithIndex.flatMap { case (w, i) =>
          val prev = cum; cum += w
          if (w > 0 && cum / step > prev / step)
            Some((i.toLong, cum, cum / step - prev / step))
          else None
        }.toSet
        val heavyDrawn = ws.zipWithIndex
          .filter { case (w, _) => w >= step }
          .forall { case (_, i) => got.exists(_._1 == i.toLong) }
        (got == want) :| s"draw mismatch: got=$got want=$want" &&
          (got.toSeq.map(_._3).sum == total / step) :| "hits must partition total div step" &&
          heavyDrawn :| "a row with w >= step must always be drawn" &&
          got.forall { case (i, _, _) => ws0(i.toInt).exists(_ > 0) } :|
            "a NULL- or negative-weight row must never be drawn"
      }
    })
  }

  test("budgetFill: kept == the greedy quality-order prefix; larger budgets only extend") {
    // weights again include NEGATIVE and NULL entries (clamp-to-0, then
    // excluded by the w > 0 kept filter) — the reference model clamps first
    val rowGen = for {
      w <- Gen.frequency(
        (8, Gen.chooseNum(-15L, 30L).map(Option(_))),
        (1, Gen.const(Option.empty[Long])))
      q <- Gen.chooseNum(0, 10000)
    } yield (w, q)
    check(Prop.forAll(Gen.listOfN(25, rowGen), Gen.chooseNum(1L, 300L)) { (rows, budget) =>
      val df = rows.zipWithIndex
        .map { case ((w, q), i) => (i.toLong, w, q / 10000.0) }.toDF("id", "w", "q")
      def fill(b: Long) = Splits.budgetFill(df, "id", $"w", $"q", b, bandWidth = 100)
        .collect().map(r => (r.getLong(0), r.getLong(3))).toSet
      val got = fill(budget)
      var cum = 0L
      val want = rows.zipWithIndex
        .map { case ((w, q), i) =>
          (i.toLong, w.map(x => math.max(0L, x)).getOrElse(0L), q) }
        .sortBy { case (id, _, q) => (-q, id) }
        .flatMap { case (id, w, _) =>
          val prev = cum; cum += w
          if (w > 0 && prev < budget) Some((id, cum)) else None
        }.toSet
      val extended = fill(budget + 37L).map(_._1)
      // the tie-split bucketing (exact-score bands subdivided by id range)
      // must be a pure partitioning change: identical kept set AND cums
      val gotTieSplit = Splits
        .budgetFill(df, "id", $"w", $"q", budget, bandWidth = 1, tieWidth = 3L)
        .collect().map(r => (r.getLong(0), r.getLong(3))).toSet
      (got == want) :| s"greedy prefix mismatch: got=$got want=$want" &&
        got.map(_._1).subsetOf(extended) :| "raising the budget must only add rows" &&
        (gotTieSplit == got) :| "tie-split path must equal the plain path exactly"
    })
  }

  test("budgetFill: degenerate all-equal scores — tie-split equals plain, greedy by id") {
    // the distribution no bandWidth can split: every score identical, one
    // band holds the corpus; tieWidth subdivides it by id ranges without
    // changing a single output value
    val df = (0L until 200L).map(i => (i, 5L, 0.5)).toDF("id", "w", "q")
    def out(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(r => (r.getLong(0), r.getLong(3))).toSeq.sortBy(_._1)
    val plain = out(Splits.budgetFill(df, "id", $"w", $"q", 333L, bandWidth = 100))
    val split = out(Splits.budgetFill(df, "id", $"w", $"q", 333L,
      bandWidth = 1, tieWidth = 7L))
    assert(plain === split)
    // greedy fill at equal quality is pure id order: 5 tokens each, prev
    // cum < 333 keeps ids 0..66 (the 67th row starts at 330 < 333)
    assert(plain === (0L to 66L).map(i => (i, (i + 1) * 5L)))
    // tieWidth without exact-score bands is rejected
    assertThrows[IllegalArgumentException] {
      Splits.budgetFill(df, "id", $"w", $"q", 333L, bandWidth = 100, tieWidth = 7L)
    }
  }

  test("splitRepair: move_to_train closes every leaky component; repairing a repaired split is a no-op") {
    import graft.extensions.Dedup
    val edgeGen = for {
      n <- Gen.choose(2, 40)
      edges <- Gen.listOfN(n,
        Gen.zip(Gen.choose(0L, 60L), Gen.choose(0L, 60L)))
    } yield edges.filter { case (a, b) => a != b }
    check(Prop.forAll(edgeGen) { edges =>
      (edges.nonEmpty) ==> {
        val pairs = edges.toDF("id_a", "id_b")
        val moved = Dedup.splitRepair(pairs, policy = "move_to_train")
          .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
        // driver-side ground truth: union-find components + md5 splits
        def split(id: Long): String = {
          val hex = java.security.MessageDigest.getInstance("MD5")
            .digest(id.toString.getBytes("UTF-8"))
            .map("%02x".format(_)).mkString.take(2)
          if (hex < "cd") "train" else if (hex < "e6") "valid" else "test"
        }
        val parent = scala.collection.mutable.Map[Long, Long]()
        def find(x: Long): Long = {
          val p = parent.getOrElseUpdate(x, x)
          if (p == x) x else { val r = find(p); parent(x) = r; r }
        }
        edges.foreach { case (a, b) => parent(find(a)) = find(b) }
        val comps = parent.keys.toSeq.groupBy(find)
        val leaky = comps.filter(_._2.map(split).distinct.size > 1)
        val wantMoved = leaky.values.flatten.filter(split(_) != "train").toSet
        val effSplit = (id: Long) =>
          if (moved.contains(id)) "train" else split(id)
        // (a) repair == leaky-component members not already in train,
        //     carrying their true old split
        (moved.keySet == wantMoved) :| s"moved ${moved.keySet} want $wantMoved" &&
        moved.forall { case (id, old) => old == split(id) } :| "old splits" &&
        // (b) no pair crosses the repaired labels (leak-free)
        edges.forall { case (a, b) => effSplit(a) == effSplit(b) ||
          comps.keys.isEmpty } :| "still leaky after repair" &&
        // (c) idempotence: with every moved doc in train, no component
        //     spans >1 effective split, so a second repair finds nothing
        comps.values.forall(_.map(effSplit).distinct.size == 1) :| "second pass non-empty"
      }
    })
  }

  test("splitRepair: drop_later removes one side of every cross pair; surviving pairs are leak-free") {
    import graft.extensions.Dedup
    val pairs = Seq((3L, 10L), (10L, 22L), (5L, 6L), (7L, 40L))
      .toDF("id_a", "id_b")
    val dropped = Dedup.splitRepair(pairs, policy = "drop_later")
      .collect().map(_.getLong(0)).toSet
    def split(id: Long): String = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(2)
      if (hex < "cd") "train" else if (hex < "e6") "valid" else "test"
    }
    val edges = Seq((3L, 10L), (10L, 22L), (5L, 6L), (7L, 40L))
    val wantDropped = edges.filter { case (a, b) => split(a) != split(b) }
      .map { case (a, b) => math.max(a, b) }.toSet
    assert(dropped === wantDropped)
    // idempotence: pairs among survivors never cross (every cross pair
    // lost its max endpoint; labels are pure functions of the id)
    val survivors = edges.filter { case (a, b) =>
      !dropped(a) && !dropped(b) }
    assert(survivors.forall { case (a, b) => split(a) == split(b) })
    // unknown policy fails loudly
    assertThrows[IllegalArgumentException] {
      Dedup.splitRepair(pairs, policy = "nonsense")
    }
  }

  test("boilerplateLines: drop-all-occurrences at minDf, order kept, idempotent") {
    import graft.extensions.Dedup
    // shared pool of boilerplate lines (df >= 2) + per-doc unique lines
    val docGen = for {
      nDocs <- Gen.choose(2, 8)
      docs <- Gen.listOfN(nDocs, for {
        nShared <- Gen.choose(0, 3)
        shared <- Gen.listOfN(nShared, Gen.oneOf("header nav", "footer fine print", "cookie banner"))
        nOwn <- Gen.choose(0, 4)
        own <- Gen.listOfN(nOwn, Gen.choose(0, 100000))
      } yield (shared, own.map(k => s"unique line $k")))
    } yield docs.zipWithIndex.map { case ((sh, own), i) =>
      (i.toLong, (sh ++ own).mkString("\n"))
    }
    check(Prop.forAll(docGen) { docs =>
      val withLines = docs.filter(_._2.nonEmpty)
      (withLines.nonEmpty) ==> {
        val df = withLines.toDF("doc_id", "text")
        val out = Dedup.boilerplateLines(df, "doc_id", "text", minDf = 2)
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
            if (r.isNullAt(3)) null else r.getString(3))).toSeq.sortBy(_._1)
        // driver replay: normalized df across docs, drop ALL occurrences
        val lineSets = withLines.map { case (id, t) =>
          id -> t.split("\n").toSeq.filter(_.trim.nonEmpty) }
        val dfMap = lineSets.flatMap { case (_, ls) =>
          ls.map(_.toLowerCase.replaceAll("\\s+", " ").trim).distinct }
          .groupBy(identity).view.mapValues(_.size).toMap
        val want = lineSets.map { case (id, ls) =>
          val kept = ls.filter(l =>
            dfMap(l.toLowerCase.replaceAll("\\s+", " ").trim) < 2)
          (id, ls.size.toLong, kept.size.toLong,
            if (kept.isEmpty) null else kept.mkString("\n"))
        }.sortBy(_._1)
        (out == want) :| s"got $out want $want" && {
          // idempotence: a second pass over the cleaned text drops nothing
          val cleaned = out.filter(_._4 != null).map(r => (r._1, r._4))
          cleaned.isEmpty || {
            val again = Dedup.boilerplateLines(
                cleaned.toDF("doc_id", "text"), "doc_id", "text", minDf = 2)
              .collect().map(r => (r.getLong(0),
                if (r.isNullAt(3)) null else r.getString(3))).toSeq.sortBy(_._1)
            again == cleaned.sortBy(_._1)
          }
        } :| "second pass changed the text"
      }
    })
  }

  // --- exportManifest (h120) -----------------------------------------------

  test("exportManifest: conservation, contiguous full shards, idempotent re-export") {
    import graft.extensions.Chunking
    val docs = Tables.documents(spark, sf)
    def manifest() = Chunking.exportManifest(docs, "doc_id", "text",
      epochSeed = 29L, budget = 256, shardSize = 4L)
      .orderBy("out_shard").collect().toSeq
    val m1 = manifest()
    // idempotent re-export: the manifest is a pure function of
    // (ids, token counts, seed, budget, shardSize) — byte-identical rerun
    assert(m1 === manifest())
    val packed = Chunking.packBins(docs, "doc_id", "text", budget = 256)
    val nDocs = packed.count()
    val nTokens = packed.agg(sum(col("n_toks"))).head().getLong(0)
    val nSeqs = packed.select(col("shard"), col("bin")).distinct().count()
    // conservation: every packed doc, token, and sequence lands in exactly
    // one manifest shard
    assert(m1.map(_.getLong(2)).sum === nDocs)
    assert(m1.map(_.getLong(3)).sum === nTokens)
    assert(m1.map(_.getLong(1)).sum === nSeqs)
    // shard ids are contiguous 0..ceil(S/4)-1 and every shard except the
    // last holds exactly shardSize sequences (global_pos div is total)
    val ids = m1.map(_.getLong(0))
    assert(ids === (0L until (nSeqs + 3) / 4))
    assert(m1.dropRight(1).forall(_.getLong(1) === 4L),
      "a non-final shard is not full")
    // the Merkle property: shard fingerprints XOR up to the dataset-level
    // fingerprint over the same content columns
    val order = Chunking.epochShuffle(
      packed.select(concat_ws(":", col("shard"), col("bin")).as("seq_id"))
        .distinct(), "seq_id", 29L)
    val full = graft.extensions.Provenance.datasetFingerprint(
      packed.withColumn("seq_id", concat_ws(":", col("shard"), col("bin")))
        .join(order.select(col("seq_id"), col("global_pos")), "seq_id"),
      Seq.empty, Seq("doc_id", "seq_id", "global_pos")).head()
    assert(m1.map(_.getLong(4)).reduce(_ ^ _) === full.getLong(1))
  }
}
