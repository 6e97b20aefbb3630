package graft

import graft.multimodal.Multimodal
import graft.multimodal.Multimodal.MediaRecord
import org.scalatest.funsuite.AnyFunSuite

class MultimodalSpec extends AnyFunSuite with SparkTest {

  private def media = {
    import spark.implicits._
    Seq(
      MediaRecord(1L, "image", "fake-png-bytes-aaaa".getBytes("UTF-8")),
      MediaRecord(2L, "video", ("frame" * 20).getBytes("UTF-8")),
      MediaRecord(3L, "audio", "pcm".getBytes("UTF-8"))
    ).toDS()
  }

  test("decodeFeatures is deterministic; non-container payloads sniff unknown") {
    val a = Multimodal.decodeFeatures(media).collect().sortBy(_.media_id)
    val b = Multimodal.decodeFeatures(media).collect().sortBy(_.media_id)
    assert(a.toSeq == b.toSeq)
    assert(a.map(_.media_id).toSeq == Seq(1L, 2L, 3L))
    assert(a.forall(f => f.n_bytes > 0 && f.format == "unknown" &&
      f.width == 0 && f.sample_rate == 0))
  }

  test("PNG parser reads golden spec bytes (independently computed CRC)") {
    // header region of a valid 3x2 truecolor PNG, bytes fixed by the W3C
    // spec and an externally computed CRC32 — NOT produced by our encoder
    val golden = Array(
      0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a, 0x00, 0x00, 0x00,
      0x0d, 0x49, 0x48, 0x44, 0x52, 0x00, 0x00, 0x00, 0x03, 0x00, 0x00,
      0x00, 0x02, 0x08, 0x02, 0x00, 0x00, 0x00, 0x12, 0x16, 0xf1, 0x4d)
      .map(_.toByte)
    val p = Multimodal.HeaderCodec.parse(golden)
    assert(p.contains(Multimodal.HeaderCodec.Parsed("png", 3, 2, 0, 0, 0L)))
    // corrupt ONE header byte: CRC check must reject, not misparse
    val bad = golden.clone(); bad(19) = 0x04
    assert(Multimodal.HeaderCodec.parse(bad).isEmpty)
  }

  test("encoders round-trip through the parser (png/bmp/wav)") {
    import Multimodal.HeaderCodec._
    assert(parse(encodePng(640, 480)).contains(Parsed("png", 640, 480, 0, 0, 0L)))
    assert(parse(encodeBmp(31, 7)).contains(Parsed("bmp", 31, 7, 0, 0, 0L)))
    assert(parse(encodeWav(44100, 2, 1234L))
      .contains(Parsed("wav", 0, 0, 44100, 2, 1234L)))
  }

  test("WAV chunk walk skips a LIST chunk before fmt; BMP abs(top-down height)") {
    import Multimodal.HeaderCodec._
    // splice a LIST metadata chunk between RIFF header and fmt — legal
    // layout that fixed-offset parsers misread
    val wav = encodeWav(8000, 1, 10L)
    val list = "LIST".getBytes("US-ASCII") ++
      Array[Byte](6, 0, 0, 0) ++ "INFOab".getBytes("US-ASCII")
    val spliced = wav.take(12) ++ list ++ wav.drop(12)
    // patch RIFF size (not read by the walk, but keep the file honest)
    assert(parse(spliced).contains(Parsed("wav", 0, 0, 8000, 1, 10L)))
    // top-down BMP: negative height, magnitude is the real height
    val bmp = encodeBmp(5, 3)
    val bb = java.nio.ByteBuffer.wrap(bmp)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putInt(22, -3)
    assert(parse(bmp).contains(Parsed("bmp", 5, 3, 0, 0, 0L)))
  }

  test("malformed RIFF chunk sizes terminate the walk instead of looping/escaping") {
    import Multimodal.HeaderCodec._
    def riff(chunks: Array[Byte]): Array[Byte] = {
      val h = java.nio.ByteBuffer.allocate(12)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      h.put("RIFF".getBytes("US-ASCII")).putInt(4 + chunks.length)
        .put("WAVE".getBytes("US-ASCII"))
      h.array() ++ chunks
    }
    // u32 size 0xFFFFFFF8 would wrap .toInt to -8 (step 0 = infinite loop)
    val evil = java.nio.ByteBuffer.allocate(16)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    evil.put("JUNK".getBytes("US-ASCII")).putInt(0xFFFFFFF8)
      .put(new Array[Byte](8))
    assert(parse(riff(evil.array())).isEmpty) // returns, no hang/AIOOBE
    // size overrunning the buffer by one: also terminates as unknown
    val over = java.nio.ByteBuffer.allocate(12)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    over.put("JUNK".getBytes("US-ASCII")).putInt(5).put(new Array[Byte](4))
    assert(parse(riff(over.array())).isEmpty)
    // legal truncation: fmt + data headers present, body absent -> still
    // parses the declared sample count (metadata-of-truncated-file case)
    val wav = encodeWav(8000, 1, 100L)
    assert(parse(wav.take(44)).contains(Parsed("wav", 0, 0, 8000, 1, 100L)))
  }

  test("sampleFrames explodes only video payloads with strided chunks") {
    val frames = Multimodal.sampleFrames(media, stride = 16).collect()
    assert(frames.nonEmpty)
    assert(frames.map(_.getLong(0)).toSet == Set(2L))
    assert(frames.map(_.getInt(1)).forall(_ % 2 == 0)) // every 2nd chunk
  }

  test("full training-data shape: decode -> featurize -> embed -> ANN") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import graft.functions.{VectorFunctions => V}
    // media -> stub features -> deterministic fake embedding (bytes-driven)
    // -> cosine top-k against itself: the end-to-end pipeline plumbing a
    // real decoder/encoder would slot into without schema changes
    val media = (0 until 20).map(i =>
      MediaRecord(i.toLong, "image", s"payload-$i-${"x" * (i % 5)}".getBytes("UTF-8"))).toDS()
    val feats = Multimodal.decodeFeatures(media)
    val embedded = feats.toDF()
      .select(col("media_id").as("vec_id"),
        array((0 until 8).map(j =>
          (pmod(pmod(col("checksum"), lit(100000)) * (j + 1), lit(1000))
            .cast("double") / 1000.0)): _*)
          .as("cv"))
    val queries = embedded.filter(col("vec_id") === 0)
      .select(col("vec_id").as("q_id"), col("cv").as("qv"))
    val top = graft.operators.Similarity.bruteForceTopK(queries, embedded, 3)
      .orderBy("rn").select("vec_id").collect().map(_.getLong(0))
    assert(top.head == 0L) // self-match ranks first
    assert(top.length == 3)
  }

  test("fromDocuments wraps text tables in the media schema") {
    import spark.implicits._
    val docs = Seq((7L, "hello world")).toDF("doc_id", "text")
    val m = Multimodal.fromDocuments(docs)
    assert(m.schema.fieldNames.toSeq == Seq("media_id", "kind", "payload"))
    assert(m.schema("payload").dataType.typeName == "binary")
    assert(m.count() == 1)
  }

  test("resize bounds every payload to the target grid, deterministically") {
    import spark.implicits._
    val media = Seq(
      Multimodal.MediaRecord(1L, "image", Array.tabulate(1000)(_.toByte)),
      Multimodal.MediaRecord(2L, "image", Array.tabulate(7)(_.toByte)),
      Multimodal.MediaRecord(3L, "image", Array.emptyByteArray)).toDS()
    val r = Multimodal.resize(media, 8, 4).collect().sortBy(_.media_id)
    assert(r.forall(x => x.width == 8 && x.height == 4))
    assert(r(0).payload.length == 32 && r(1).payload.length == 32)
    assert(r(2).payload.isEmpty)
    // strided selection is reproducible
    val again = Multimodal.resize(media, 8, 4).collect().sortBy(_.media_id)
    assert(r.zip(again).forall { case (a, b) => a.payload.sameElements(b.payload) })
  }

  test("patterned BMP decode inverts bottom-up rows, BGR order and padding exactly") {
    // 5x3 needs row padding (15 bytes -> 16); pattern is defined in IMAGE
    // coordinates, so equality here proves the decoder inverted the file
    // layout rather than echoing it
    val p = Multimodal.HeaderCodec
      .decodeBmpPixels(Multimodal.HeaderCodec.encodeBmpPattern(7L, 5, 3)).get
    assert(p.width == 5 && p.height == 3)
    for (y <- 0 until 3; x <- 0 until 5; c <- 0 until 3)
      assert((p.rgb((y * 5 + x) * 3 + c) & 0xff) ==
        Multimodal.HeaderCodec.patternValue(7L, x, y, c), s"($x,$y,$c)")
    // foreign bytes and non-24bpp refuse rather than throw
    assert(Multimodal.HeaderCodec.decodeBmpPixels("not a bmp".getBytes).isEmpty)
    assert(Multimodal.HeaderCodec
      .decodeBmpPixels(Multimodal.HeaderCodec.encodePng(4, 4)).isEmpty)
  }

  test("patterned PNG decode reconstructs all five row filters; ImageIO independently agrees") {
    import Multimodal.HeaderCodec._
    // heights >= 5 so the (id%5 + y) % 5 filter cycle hits every spec
    // filter; ids shift the phase so each filter also appears as row 0
    // (no above-row) somewhere; width 1 exercises the no-left-pixel edge
    for ((id, w, h) <- Seq((0L, 7, 6), (1L, 5, 5), (2L, 1, 9), (3L, 13, 5), (4L, 64, 8))) {
      val bytes = encodePngPattern(id, w, h)
      val p = decodePngPixels(bytes).get
      assert(p.width == w && p.height == h)
      for (y <- 0 until h; x <- 0 until w; c <- 0 until 3)
        assert((p.rgb((y * w + x) * 3 + c) & 0xff) == patternValue(id, x, y, c),
          s"id=$id ($x,$y,$c)")
      // independent JDK decoder (javax.imageio) must see the same pixels —
      // validates our ENCODER's filtering against a foreign implementation,
      // and therefore our decoder by the equality above
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      for (y <- 0 until h; x <- 0 until w) {
        val argb = img.getRGB(x, y)
        assert(((argb >> 16) & 0xff) == patternValue(id, x, y, 0), s"iio R ($x,$y)")
        assert(((argb >> 8) & 0xff) == patternValue(id, x, y, 1), s"iio G ($x,$y)")
        assert((argb & 0xff) == patternValue(id, x, y, 2), s"iio B ($x,$y)")
      }
    }
    // black PNG (filter 0 rows) decodes to zeros
    val black = decodePngPixels(encodePng(4, 3)).get
    assert(black.rgb.forall(_ == 0) && black.width == 4 && black.height == 3)
  }

  test("decodePngPixels refuses corrupt, truncated and foreign payloads") {
    import Multimodal.HeaderCodec._
    val good = encodePngPattern(11L, 9, 7)
    assert(decodePngPixels(good).isDefined)
    // corrupt one IDAT payload byte: the chunk CRC must reject it
    val corrupt = good.clone()
    corrupt(45) = (corrupt(45) ^ 0x5a).toByte
    assert(decodePngPixels(corrupt).isEmpty)
    // truncate mid-IDAT: chunk walk stops, no IEND -> None, never throws
    assert(decodePngPixels(good.take(good.length - 20)).isEmpty)
    // foreign containers and junk refuse
    assert(decodePngPixels(encodeBmpPattern(1L, 4, 4)).isEmpty)
    assert(decodePngPixels("not a png at all".getBytes).isEmpty)
    // the header-only parser still accepts the good file (metadata path)
    assert(parse(good).contains(Parsed("png", 9, 7, 0, 0, 0L)))
  }

  test("decodePngPixels refuses dimension bombs without throwing (r15 ADVICE)") {
    import Multimodal.HeaderCodec._
    // rebuild a CRC-valid file around a crafted IHDR: width 2^30 overflowed
    // the old Int stride (3*2^30 < 0) and reached new Array with a negative
    // size; large-but-valid dims allocated multi-GB from a tiny payload
    def withDims(width: Int, height: Int): Array[Byte] = {
      val base = encodePng(4, 3)
      val out = base.clone()
      def putBe32(off: Int, v: Int): Unit = {
        out(off) = (v >>> 24).toByte; out(off + 1) = (v >>> 16).toByte
        out(off + 2) = (v >>> 8).toByte; out(off + 3) = v.toByte
      }
      // IHDR data starts at 16 (8 sig + 4 len + 4 type); CRC covers 12..28
      putBe32(16, width); putBe32(20, height)
      val crc = new java.util.zip.CRC32
      crc.update(out, 12, 17)
      putBe32(29, crc.getValue.toInt)
      out
    }
    // sanity: the rewrite machinery itself produces decodable files
    assert(withDims(4, 3).sameElements(encodePng(4, 3)))
    // Int-overflow stride: must refuse, not NegativeArraySizeException
    assert(decodePngPixels(withDims(1 << 30, 2)).isEmpty)
    // valid dims past the 64 MiB decoded-size cap: refuse before allocating
    assert(decodePngPixels(withDims(10000, 10000)).isEmpty)
    // products that overflow Long-free paths stay safe too
    assert(decodePngPixels(withDims(Int.MaxValue, Int.MaxValue)).isEmpty)
  }

  test("decodeBmpPixels refuses dimension bombs without throwing (r16 ADVICE)") {
    import Multimodal.HeaderCodec._
    // rebuild a BMP header with crafted dims over a tiny payload: width in
    // [~715827883, 2^31) overflows width*3 negative, the negative
    // rowSize*height then PASSED the old bounds check and reached
    // new Array[Byte](width*height*3) with a negative size — and
    // decodeImageAuto tries the BMP decoder FIRST on every blob
    def withDims(width: Int, height: Int): Array[Byte] = {
      val out = encodeBmp(4, 3).clone()
      def putLe32(off: Int, v: Int): Unit = {
        out(off) = v.toByte; out(off + 1) = (v >>> 8).toByte
        out(off + 2) = (v >>> 16).toByte; out(off + 3) = (v >>> 24).toByte
      }
      putLe32(18, width); putLe32(22, height)
      out
    }
    // sanity: the rewrite machinery itself produces decodable files
    assert(decodeBmpPixels(withDims(4, 3)).isDefined)
    // Int-overflow rowSize (the exact ADVICE class): refuse, don't throw
    assert(decodeBmpPixels(withDims(715827883, 2)).isEmpty)
    assert(decodeBmpPixels(withDims(1 << 30, 2)).isEmpty)
    // valid dims past the 64 MiB decoded-size cap: refuse before allocating
    assert(decodeBmpPixels(withDims(10000, 10000)).isEmpty)
    // Long-product overflow paths stay safe too
    assert(decodeBmpPixels(withDims(Int.MaxValue, Int.MaxValue)).isEmpty)
    // and the auto path (BMP decoder first) stays silent on the same bytes
    assert(Multimodal.HeaderCodec
      .decodeBmpPixels(withDims(715827883, 3)).isEmpty)
  }

  test("resizeImageArea: PNG and BMP of the same pattern resample identically") {
    import spark.implicits._
    val dims = Seq((3, 2), (8, 4), (13, 9), (1, 7))
    val media = dims.zipWithIndex.flatMap { case ((w, h), i) =>
      Seq(
        Multimodal.MediaRecord(i.toLong, "image",
          Multimodal.HeaderCodec.encodePngPattern(i.toLong, w, h)),
        // same id+dims as BMP under a shifted media_id for comparison
        Multimodal.MediaRecord(100L + i, "image",
          Multimodal.HeaderCodec.encodeBmpPattern(i.toLong, w, h)))
    } :+ Multimodal.MediaRecord(999L, "audio",
      Multimodal.HeaderCodec.encodeWav(8000, 1, 4))
    val got = Multimodal.resizeImageArea(media.toDS(), 8, 4).collect()
      .map(r => r.media_id -> r.payload.toSeq).toMap
    dims.indices.foreach { i =>
      assert(got(i.toLong) == got(100L + i), s"png/bmp divergence at dims ${dims(i)}")
    }
    // the WAV record is dropped by the registry, not zero-filled
    assert(!got.contains(999L) && got.size == dims.size * 2)
  }

  test("resizeBmpArea golden bytes: 2x2 box-average, 1x1 upsample repeat, non-BMP dropped") {
    import spark.implicits._
    val media = Seq(
      Multimodal.MediaRecord(0L, "image", Multimodal.HeaderCodec.encodeBmpPattern(0L, 2, 2)),
      Multimodal.MediaRecord(1L, "image", Multimodal.HeaderCodec.encodeBmpPattern(9L, 1, 1)),
      Multimodal.MediaRecord(2L, "image", Multimodal.HeaderCodec.encodeWav(8000, 1, 4))).toDS()
    // id 0 to 1x1: one box over all 4 pixels. pattern(0, x, y, c) =
    // (3x + 5y + 11c) % 256 -> R: (0+3+5+8)/4 = 4; G: +11 each -> 15; B: 26
    val one = Multimodal.resizeBmpArea(media.filter(_.media_id == 0L), 1, 1).collect()(0)
    assert(one.payload.toSeq == Seq[Byte](4, 15, 26), one.payload.toSeq.toString)
    // exact hand-computed 8x4 golden bytes for the 1x1 source: every box
    // clamps to the single pixel, so all 32 cells repeat pattern(9, 0, 0, c)
    val up = Multimodal.resizeBmpArea(media.filter(_.media_id == 1L), 8, 4).collect()(0)
    val cell = (0 until 3).map(c => Multimodal.HeaderCodec.patternValue(9L, 0, 0, c).toByte)
    assert(up.payload.toSeq == Seq.fill(32)(cell).flatten, up.payload.toSeq.toString)
    // the WAV record is dropped, not zero-filled
    assert(Multimodal.resizeBmpArea(media, 8, 4).collect().map(_.media_id).sorted.toSeq
      == Seq(0L, 1L))
  }

  test("resizeBmpArea matches a per-pixel brute-force replay on awkward dims") {
    import spark.implicits._
    // dims around the 8x4 target: smaller, equal, larger, padded widths
    val dims = Seq((3, 2), (8, 4), (13, 9), (5, 17), (64, 64), (1, 7))
    val media = dims.zipWithIndex.map { case ((w, h), i) =>
      Multimodal.MediaRecord(i.toLong, "image",
        Multimodal.HeaderCodec.encodeBmpPattern(i.toLong, w, h))
    }.toDS()
    val got = Multimodal.resizeBmpArea(media, 8, 4).collect()
      .map(r => r.media_id -> r.payload).toMap
    dims.zipWithIndex.foreach { case ((w, h), i) =>
      val id = i.toLong
      for (cy <- 0 until 4; cx <- 0 until 8; c <- 0 until 3) {
        val x0 = cx * w / 8; val x1 = math.max(x0 + 1, (cx + 1) * w / 8)
        val y0 = cy * h / 4; val y1 = math.max(y0 + 1, (cy + 1) * h / 4)
        val vals = for (y <- y0 until y1; x <- x0 until x1)
          yield Multimodal.HeaderCodec.patternValue(id, x, y, c).toLong
        val want = (vals.sum / vals.size).toByte
        assert(got(id)((cy * 8 + cx) * 3 + c) == want, s"id=$id cell=($cx,$cy,$c)")
      }
    }
  }

  test("WAV PCM sample decode inverts little-endian i16 (pattern + spliced LIST)") {
    import Multimodal.HeaderCodec._
    val b = encodeWavPattern(17L, 8000, 300)
    val w = decodeWavSamples(b).get
    assert(w.sampleRate == 8000 && w.channels == 1 && w.samples.length == 300)
    assert((0 until 300).forall(i => w.samples(i) == sampleValue(17L, i).toShort))
    // chunk walk, not fixed offsets: a LIST chunk before fmt must not shift
    // the sample extraction
    val list = "LIST".getBytes("US-ASCII") ++
      Array[Byte](6, 0, 0, 0) ++ "INFOab".getBytes("US-ASCII")
    val spliced = b.take(12) ++ list ++ b.drop(12)
    val w2 = decodeWavSamples(spliced).get
    assert(w2.samples.toSeq == w.samples.toSeq)
    // negative pattern values really exercise the sign bit
    assert(w.samples.exists(_ < 0) && w.samples.exists(_ > 0))
  }

  test("decodeWavSamples claims only 16-bit integer PCM") {
    import Multimodal.HeaderCodec._
    val b = encodeWav(8000, 1, 10L)
    // patch audioFormat (offset 20, le16) to 3 = IEEE float: not claimed
    val floatFmt = b.clone(); floatFmt(20) = 3
    assert(decodeWavSamples(floatFmt).isEmpty)
    // patch bits-per-sample (offset 34, le16) to 8: not claimed
    val eightBit = b.clone(); eightBit(34) = 8
    assert(decodeWavSamples(eightBit).isEmpty)
    // foreign bytes: None, never a throw
    assert(decodeWavSamples("not audio at all".getBytes("UTF-8")).isEmpty)
    // stereo stays interleaved in file order
    val st = decodeWavSamples(encodeWav(44100, 2, 5L)).get
    assert(st.channels == 2 && st.samples.length == 10)
    // truncated data chunk (declared size past the buffer): decode the
    // samples actually present — never index past the array
    val full = encodeWavPattern(3L, 8000, 100)
    val cut = full.take(full.length - 40) // drop 20 samples' bytes
    val tr = decodeWavSamples(cut).get
    assert(tr.samples.length == 80)
    assert((0 until 80).forall(i => tr.samples(i) == sampleValue(3L, i).toShort))
  }

  test("audioFrameFeatures golden frames: energy/sum_abs/peak/zero_cross, no cross-boundary pair") {
    import spark.implicits._
    import Multimodal.HeaderCodec._
    // hand-built signal [3, -2, 0, -5, 4] at frame=3:
    //  frame 0 = [3, -2, 0]: energy 13, sum_abs 5, peak 3,
    //    crossings (3,-2) and (-2,0) -> 2  (0 counts as nonnegative)
    //  frame 1 = [-5, 4]: n=2, energy 41, sum_abs 9, peak 5, crossing 1;
    //    the boundary pair (0, -5) must NOT count in either frame
    val sig = Array[Short](3, -2, 0, -5, 4)
    val wav = encodeWav(8000, 1, sig.length.toLong)
    sig.zipWithIndex.foreach { case (v, i) =>
      wav(44 + 2 * i) = (v & 0xff).toByte
      wav(44 + 2 * i + 1) = ((v >> 8) & 0xff).toByte
    }
    val media = Seq(
      Multimodal.MediaRecord(1L, "audio", wav),
      Multimodal.MediaRecord(2L, "text", "dropped".getBytes("UTF-8"))).toDS()
    val got = Multimodal.audioFrameFeatures(media, frame = 3).collect()
      .sortBy(f => (f.media_id, f.frame_idx))
    assert(got.map(_.media_id).toSeq == Seq(1L, 1L), "non-PCM payload must drop")
    val Seq(f0, f1) = got.toSeq
    assert((f0.n, f0.energy, f0.sum_abs, f0.peak, f0.zero_cross) == ((3, 13L, 5L, 3, 2L)))
    assert((f1.n, f1.energy, f1.sum_abs, f1.peak, f1.zero_cross) == ((2, 41L, 9L, 5, 1L)))
  }

  test("audioFrameFeatures matches a brute-force replay on patterned WAVs") {
    import spark.implicits._
    import Multimodal.HeaderCodec._
    val lens = Seq(1, 255, 256, 257, 700)
    val media = lens.zipWithIndex.map { case (n, i) =>
      Multimodal.MediaRecord(i.toLong, "audio", encodeWavPattern(i.toLong, 8000, n))
    }.toDS()
    val got = Multimodal.audioFrameFeatures(media, frame = 256).collect()
      .map(f => (f.media_id, f.frame_idx) -> f).toMap
    lens.zipWithIndex.foreach { case (n, i) =>
      val s = (0 until n).map(j => sampleValue(i.toLong, j))
      (0 until n by 256).foreach { start =>
        val fr = s.slice(start, start + 256)
        val f = got((i.toLong, start / 256))
        assert(f.n == fr.length)
        assert(f.energy == fr.map(v => v.toLong * v).sum)
        assert(f.sum_abs == fr.map(v => math.abs(v).toLong).sum)
        assert(f.peak == fr.map(math.abs).max)
        val end = math.min(start + 256, n)
        val zc = (start + 1 until end).count(j => (s(j - 1) < 0) != (s(j) < 0))
        assert(f.zero_cross == zc.toLong, s"id=$i frame=${start / 256}")
      }
    }
    assert(got.size == lens.map(n => (n + 255) / 256).sum)
  }

  test("mixed patterned fixture routes by container claim: BMPs to resize, WAVs to audio features") {
    import spark.implicits._
    val docs = (0L until 8L).map(i => (i, 100L + i)).toDF("doc_id", "n_chars")
    val media = Multimodal.plantedPatternMedia(docs)
    // codec-registry routing: each decoder claims exactly its container —
    // no per-row format dispatch needed in the composed q_mm_pipeline plan
    val imgIds = Multimodal.resizeBmpArea(media, 4, 2).collect().map(_.media_id).sorted
    val audIds = Multimodal.audioFrameFeatures(media, 256).collect().map(_.media_id).distinct.sorted
    assert(imgIds.toSeq == Seq(0L, 2L, 4L, 6L))
    assert(audIds.toSeq == Seq(1L, 3L, 5L, 7L))
    // both branches see planted arithmetic content, not silence/black
    assert(Multimodal.resizeBmpArea(media, 4, 2).collect()
      .forall(_.payload.exists(_ != 0)))
  }
}
