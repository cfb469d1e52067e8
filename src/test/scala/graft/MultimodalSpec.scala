package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Multimodal
import graft.sources.Tables

class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val docs = Seq(
    (2L, "hello world content", "imgsrc"), // even id → BMP
    (3L, "other longer content with many more bytes in it", "audsrc"))
    .toDF("doc_id", "text", "source")

  test("asMedia emits real containers: BMP magic for images, RIFF/WAVE for audio") {
    val m = Multimodal.asMedia(docs)
    val schema = m.schema.map(f => f.name -> f.dataType.simpleString).toMap
    assert(schema("payload") === "binary")
    val r = m.orderBy("doc_id").collect()
    val bmp = r(0).getAs[Array[Byte]]("payload")
    assert(r(0).getString(1) === "image/bmp")
    assert(bmp(0) === 'B'.toByte && bmp(1) === 'M'.toByte)
    val wav = r(1).getAs[Array[Byte]]("payload")
    assert(r(1).getString(1) === "audio/wav")
    assert(new String(wav, 0, 4, "US-ASCII") === "RIFF")
    assert(new String(wav, 8, 4, "US-ASCII") === "WAVE")
  }

  test("decodeMeta parses the real headers back to the encoded geometry") {
    val m = Multimodal.asMedia(docs)
    val d = Multimodal.decodeMeta(spark, m).orderBy("doc_id").collect()
    // BMP: dims derive from utf-8 length via bmpDims
    val nImg = "hello world content".getBytes("UTF-8").length
    val (w, h) = Multimodal.bmpDims(nImg)
    assert(d(0).width === w && d(0).height === h && d(0).channels === 3)
    assert(d(0).byte_len === d(0).byte_len.toLong.toInt)
    // WAV: width = samples (one per byte), height = sample rate
    val nAud =
      "other longer content with many more bytes in it".getBytes("UTF-8").length
    val (ch, sr) = Multimodal.wavShape(nAud)
    assert(d(1).width === nAud && d(1).height === sr && d(1).channels === ch)
    // decode is partition-mapped: no shuffle in the plan
    val plan = Multimodal.decodeMeta(spark, m)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
  }

  test("decoded byte_len equals the real container size formulas") {
    val d = Multimodal.decodeMeta(spark, Multimodal.asMedia(docs))
      .orderBy("doc_id").collect()
    val nImg = "hello world content".getBytes("UTF-8").length
    val (w, h) = Multimodal.bmpDims(nImg)
    assert(d(0).byte_len === 54 + (3 * w + 3) / 4 * 4 * h)
    val nAud =
      "other longer content with many more bytes in it".getBytes("UTF-8").length
    val (ch, _) = Multimodal.wavShape(nAud)
    assert(d(1).byte_len === 44 + nAud * ch * 2)
  }

  test("feature extraction computes real channel/sample statistics") {
    val f = Multimodal.extractFeatures(spark, Multimodal.asMedia(docs))
      .orderBy("doc_id").collect()
    assert(f.forall(_.feature.length === 8))
    // image channel means land strictly inside (0,1) for ascii text pixels
    assert(f(0).feature.take(3).forall(v => v > 0f && v < 1f))
    // audio RMS is positive and bounded for non-silent samples
    assert(f(1).feature(0) > 0f && f(1).feature(0) <= 1f)
    assert(f(1).feature(2) >= 0f && f(1).feature(2) <= 1f) // zero-cross rate
  }

  test("frame sampling walks the real structure (scanlines / sample blocks)") {
    // image: one frame per everyK-th scanline, each w*3 bytes
    val img = Seq((2L, "z" * 100, "img")).toDF("doc_id", "text", "source")
    val (w, h) = Multimodal.bmpDims(100)
    val imgFrames = Multimodal.sampleFrames(spark, Multimodal.asMedia(img),
      everyK = 2).collect()
    assert(imgFrames.length === (h + 1) / 2)
    assert(imgFrames.forall(_.frame_bytes.length === w * 3))
    // audio: every 2nd block of 256 samples
    val aud = Seq((3L, "x" * 2048, "aud")).toDF("doc_id", "text", "source")
    val audFrames = Multimodal.sampleFrames(spark, Multimodal.asMedia(aud),
      frameSize = 256, everyK = 2).collect()
    val (ch, _) = Multimodal.wavShape(2048)
    assert(audFrames.length === 4) // 2048/256 = 8 frames, every 2nd
    assert(audFrames.map(_.frame_idx).toSeq === Seq(0, 2, 4, 6))
    assert(audFrames.forall(_.frame_bytes.length === 256 * ch * 2))
  }

  test("extracted features compose with the ANN similarity operators") {
    // multimodal → similarity: real feature vectors feed directly into
    // the cosine top-k path (schema compatibility is the contract)
    Tables.register(spark, TestSpark.sfDir)
    val media = Multimodal.asMedia(
      spark.table("documents").limit(50))
    val feats = Multimodal.extractFeatures(spark, media)
      .toDF("vec_id", "embedding")
    val q = feats.filter(col("vec_id") === feats.first().getLong(0))
    val nn = graft.operators.Similarity.bruteForceTopK(feats, q, k = 5)
      .collect()
    assert(nn.length === 5)
    assert(nn.forall(r => r.getDouble(2) <= 1.0 + 1e-9))
  }

  test("hostile payloads neither hang nor throw: unknown-format fallback") {
    // magic sniffing admits arbitrary binary — a RIFF chunk with a huge
    // size field, a zero-dimension BMP, and plain garbage must all take
    // the graceful unknown-format path (the RIFF walk previously could
    // spin on a negative size)
    val evilWav = {
      val b = new Array[Byte](64)
      System.arraycopy("RIFF".getBytes, 0, b, 0, 4)
      System.arraycopy("WAVE".getBytes, 0, b, 8, 4)
      System.arraycopy("fmt ".getBytes, 0, b, 12, 4)
      b(16) = -8; b(17) = -1; b(18) = -1; b(19) = -1 // size 0xFFFFFFF8
      b
    }
    val evilBmp = {
      val b = new Array[Byte](64)
      b(0) = 'B'; b(1) = 'M' // all geometry fields zero
      b
    }
    val junk = Array.fill[Byte](64)(0x5a)
    // a fmt chunk HEADER that fits in the buffer while its 16-byte PCM
    // body does not: junk chunk of size 36 at offset 12 walks to a
    // 'fmt ' header starting at offset 56 of a 64-byte buffer — the
    // truncated body must be rejected, not indexed out of bounds
    val truncatedFmt = {
      val b = new Array[Byte](64)
      System.arraycopy("RIFF".getBytes, 0, b, 0, 4)
      System.arraycopy("WAVE".getBytes, 0, b, 8, 4)
      System.arraycopy("JUNK".getBytes, 0, b, 12, 4)
      b(16) = 36 // chunk size 36 → next chunk header at offset 56
      System.arraycopy("fmt ".getBytes, 0, b, 56, 4)
      b(60) = 16 // claimed fmt size 16, but only 0 body bytes remain
      b
    }
    val media = Seq(
      Multimodal.MediaRow(1L, "audio/wav", evilWav),
      Multimodal.MediaRow(2L, "image/bmp", evilBmp),
      Multimodal.MediaRow(3L, "application/junk", junk),
      Multimodal.MediaRow(4L, "audio/wav", truncatedFmt))
      .toDF()
    val d = Multimodal.decodeMeta(spark, media).orderBy("doc_id").collect()
    assert(d.forall(r => r.width === 0 && r.height === 0 &&
      r.channels === 0))
    assert(d.forall(_.byte_len === 64))
    // features and frames degrade instead of crashing
    val f = Multimodal.extractFeatures(spark, media).collect()
    assert(f.forall(_.feature.length === 8))
    val fr = Multimodal.sampleFrames(spark, media).collect()
    assert(fr.length === 4) // one whole-payload fallback frame each
  }

  test("png round trip: inflate + de-filter recovers the exact pixels") {
    // long enough that height ≥ 5 → all five scanline filter types
    // (None/Sub/Up/Average/Paeth) are exercised by the decode
    var text = ("real compressed container round trip " * 8).trim
    while (Multimodal.pngDims(text.getBytes("UTF-8").length)._2 < 5)
      text += "x"
    val bytes = text.getBytes("UTF-8")
    val png = Multimodal.encodePng(bytes)
    val (w, h) = Multimodal.pngDims(bytes.length)
    assert(h >= 5)
    val Some((pw, ph, pc, px)) = Multimodal.parsePng(png)
    assert((pw, ph, pc) === (w, h, 3))
    assert(px.length === w * h * 3)
    px.zipWithIndex.foreach { case (p, i) =>
      assert(p === bytes(i % bytes.length), s"pixel $i")
    }
  }

  test("png resize: nearest-neighbor half-size samples exactly the " +
      "even-coordinate pixels, odd dims round up") {
    import spark.implicits._
    val texts = Seq(
      "a" * 60, // w=1 (60%60=0): the 1-wide edge
      ("resize me through the real container " * 6).trim,
      "tiny")
    val media = Multimodal.asPngMedia(
      texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text"))
    val got = Multimodal.pngResize(spark, media).collect()
      .map(r => r.doc_id -> r).toMap
    texts.zipWithIndex.foreach { case (t, i) =>
      val b = t.getBytes("UTF-8")
      val (w, h) = Multimodal.pngDims(b.length)
      val (w2, h2) = ((w + 1) / 2, (h + 1) / 2)
      var want = 0L
      for (y <- 0 until h2; x <- 0 until w2; ch <- 0 until 3)
        want += b((((2 * y) * w + 2 * x) * 3 + ch) % b.length) & 0xff
      val r = got(i.toLong)
      assert((r.src_w, r.src_h, r.width, r.height) === (w, h, w2, h2),
        s"doc $i geometry")
      assert(r.px_sum === want, s"doc $i checksum")
    }
  }

  test("png decode rejects corruption instead of returning wrong data") {
    val bytes = "some document text that becomes pixels".getBytes("UTF-8")
    val png = Multimodal.encodePng(bytes)
    // flip one byte inside the first IDAT body → CRC must catch it
    val corrupt = png.clone()
    corrupt(8 + 25 + 8 + 4) = (corrupt(8 + 25 + 8 + 4) ^ 0x40).toByte
    assert(Multimodal.parsePng(corrupt).isEmpty)
    // truncate mid-IDAT → chunk walk must reject, not crash
    assert(Multimodal.parsePng(
      java.util.Arrays.copyOfRange(png, 0, png.length / 2)).isEmpty)
    // valid signature + garbage body
    val junk = new Array[Byte](64)
    System.arraycopy(png, 0, junk, 0, 8)
    assert(Multimodal.parsePng(junk).isEmpty)
  }

  test("png flows through decodeMeta / features / frames") {
    val media = Multimodal.asPngMedia(docs)
    val d = Multimodal.decodeMeta(spark, media).orderBy("doc_id").collect()
    d.foreach { r =>
      val n = docs.filter(col("doc_id") === r.doc_id)
        .select("text").collect().head.getString(0)
        .getBytes("UTF-8").length
      assert((r.width, r.height, r.channels) ===
        (Multimodal.pngDims(n)._1, Multimodal.pngDims(n)._2, 3))
    }
    val f = Multimodal.extractFeatures(spark, media).collect()
    assert(f.forall(r => r.feature(5) === 3 / 4f)) // channels/4
    assert(f.forall(r => r.feature(0) > 0f)) // real channel means
    val fr = Multimodal.sampleFrames(spark, media, everyK = 2).collect()
    assert(fr.nonEmpty)
    // each frame is one de-filtered scanline: w*3 bytes
    fr.foreach { r =>
      val n = docs.filter(col("doc_id") === r.doc_id)
        .select("text").collect().head.getString(0)
        .getBytes("UTF-8").length
      assert(r.frame_bytes.length === Multimodal.pngDims(n)._1 * 3)
    }
  }

  test("pipeline stats aggregates per media type") {
    val r = Multimodal.pipelineStats(spark, docs).collect()
    assert(r.length === 2)
    assert(r.map(_.getLong(1)).sum === 2)
  }

  test("audioStats: exact-integer energy/magnitude/crossings match a " +
      "sample-by-sample reference over the real decode") {
    // mixed corpus: ASCII, multi-byte UTF-8, empty, and a byte
    // straddling the 128 sign boundary repeatedly
    val corpus = Seq(
      (0L, "hello world", "s"),
      (1L, "héllo wörld — ünïcode", "s"),
      (2L, "", "s"),
      (3L, " ÿ AZaz09", "s"))
      .toDF("doc_id", "text", "source")
    val got = Multimodal
      .audioStats(spark, Multimodal.asWavMedia(corpus))
      .orderBy("doc_id").collect()
    corpus.orderBy("doc_id").collect().zip(got).foreach { case (src, g) =>
      val bytes = src.getString(1).getBytes("UTF-8")
      val n = bytes.length
      val (ch, sr) = Multimodal.wavShape(n)
      val samples = bytes.map(b => ((b & 0xff) - 128) << 8)
      assert(g.channels === ch && g.sample_rate === sr &&
        g.n_samples === n)
      assert(g.sum_sq === ch.toLong *
        samples.map(s => s.toLong * s).sum)
      assert(g.sum_abs === ch.toLong *
        samples.map(s => math.abs(s).toLong).sum)
      // crossings on the interleaved stream equal byte-level sign
      // flips around 128 — channel duplicates never flip
      val flips = samples.sliding(2).count {
        case Array(a, b) => (a ^ b) < 0
        case _ => false
      }
      assert(g.crossings === flips.toLong)
    }
  }

  test("audioStats: malformed payloads degrade to a zero row, no throw") {
    val bad = Seq(
      Multimodal.MediaRow(1L, "audio/wav", Array[Byte](1, 2, 3)),
      Multimodal.MediaRow(2L, "audio/wav",
        ("RIFF1234WAVE" + "x" * 40).getBytes("US-ASCII")))
      .toDF()
    val r = Multimodal.audioStats(spark, bad).orderBy("doc_id").collect()
    assert(r.length === 2)
    r.foreach { row =>
      assert(row.channels === 0 && row.sum_sq === 0L &&
        row.crossings === 0L)
    }
  }

  test("dHash: signature matches a naive per-position recompute from " +
      "the source bytes, and identical texts collide at Hamming 0") {
    val corpus = Seq(
      (0L, "the quick brown fox jumps over the lazy dog", "s"),
      (1L, "the quick brown fox jumps over the lazy dog", "s"), // dup
      (2L, "a completely different document body here", "s"),
      (3L, "", "s"))
      .toDF("doc_id", "text", "source")
    val sigs = Multimodal.dHash(spark, Multimodal.asPngMedia(corpus))
      .collect().map(r => r.doc_id -> r.sig).toMap
    // naive reference: sample the cycled text bytes on the 9×8 grid
    def ref(text: String): Long = {
      val bytes = text.getBytes("UTF-8")
      val n = bytes.length
      val w = 1 + n % 60
      val h = 1 + (n * 11) % 47
      def gray(gx: Int, gy: Int): Int =
        if (n == 0) 0
        else {
          val p = ((gy * h / 8) * w + gx * w / 9) * 3
          (0 to 2).map(c => bytes((p + c) % n) & 0xff).sum / 3
        }
      (0 until 64).foldLeft(0L) { (s, k) =>
        if (gray(k % 8, k / 8) < gray(k % 8 + 1, k / 8)) s | (1L << k)
        else s
      }
    }
    assert(sigs(0L) === ref("the quick brown fox jumps over the lazy dog"))
    assert(sigs(2L) === ref("a completely different document body here"))
    assert(sigs(0L) === sigs(1L)) // exact dup ⇒ identical signature
    assert(sigs(3L) === 0L)       // empty image ⇒ flat gradient
    // the crossover: signatures feed the banded Hamming join and the
    // duplicate pair comes out at distance 0
    val pairs = graft.operators.Dedup.hammingPairsFromSigs(
        Multimodal.dHash(spark, Multimodal.asPngMedia(corpus)).toDF(),
        maxHamming = 5, bands = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(pairs.contains((0L, 1L, 0)))
  }

  test("avi round trip: the RIFF walk recovers every frame's exact " +
      "logical pixels, sampling keeps every 2nd frame") {
    val d = Seq((1L, "a moving picture of several frames"), (2L, ""))
      .toDF("doc_id", "text")
    val r = Multimodal.aviFrameSample(spark, Multimodal.asAviMedia(d))
      .orderBy("doc_id").collect()
    val text = "a moving picture of several frames".getBytes("UTF-8")
    val n = text.length // 34
    val (w, h, frames) = (1 + n % 24, 1 + (n * 5) % 18, 2 + n % 6)
    assert((r(0).width, r(0).height, r(0).n_frames) === ((w, h, frames)))
    // reference: sum text((f*3wh + i) % n) over sampled frames
    var expect = 0L
    for (f <- 0 until frames if f % 2 == 0; i <- 0 until 3 * w * h)
      expect += text((f * 3 * w * h + i) % n) & 0xff
    assert(r(0).px_sum === expect)
    assert(r(0).n_sampled === (frames + 1) / 2)
    // empty text: zero-filled frames, geometry from n = 0
    assert((r(1).width, r(1).height, r(1).n_frames, r(1).px_sum)
      === ((1, 1, 2, 0L)))
  }

  test("avi decode rejects corruption instead of returning wrong data") {
    val good = {
      val d = Seq((1L, "some frames here please")).toDF("doc_id", "text")
      Multimodal.asAviMedia(d).collect()(0).getAs[Array[Byte]]("payload")
    }
    def stats(b: Array[Byte]): Long = {
      val m = Seq(Multimodal.MediaRow(9L, "video/avi", b)).toDF()
      Multimodal.aviFrameSample(spark, m).collect()(0).px_sum
    }
    assert(stats(good) >= 0L)
    // truncated mid-movi
    assert(stats(java.util.Arrays.copyOfRange(good, 0, good.length / 2))
      === -1L)
    // bad magic
    val bad = good.clone(); bad(9) = 'X'.toByte
    assert(stats(bad) === -1L)
    // frame-count lie in avih (offset: RIFF(12) + LIST hdr(8) +
    // 'hdrl'(4) + 'avih'+size(8) + dwTotalFrames at +16)
    val lied = good.clone()
    lied(12 + 8 + 4 + 8 + 16) = 99.toByte
    assert(stats(lied) === -1L)
    // junk entirely
    assert(stats(Array.fill[Byte](64)(7)) === -1L)
    // hostile chunk size 0x7FFFFFFF: body+sz wraps negative in Int
    // arithmetic — must reject, not crash the copy
    val overflow = good.clone()
    overflow(12 + 4) = -1; overflow(12 + 5) = -1
    overflow(12 + 6) = -1; overflow(12 + 7) = 0x7f.toByte
    assert(stats(overflow) === -1L)
  }

  test("audioStats is partition-mapped: no shuffle in the plan") {
    val plan = Multimodal
      .audioStats(spark, Multimodal.asWavMedia(docs))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
  }
}
