package graft

import org.apache.spark.sql.functions._
import graft.operators.Multimodal

class MultimodalSpec extends SparkTestBase {

  private val sfDir = "/root/testdata/sf0.001"

  test("media table: binary payloads with typed metadata") {
    val media = Multimodal.mediaFromDocuments(Tables.documents(spark, sfDir))
    assert(media.columns.toSeq == Seq("media_id", "kind", "content", "width", "height"))
    assert(media.schema("content").dataType.typeName == "binary")
    val kinds = media.select("kind").distinct().collect().map(_.getString(0)).toSet
    assert(kinds == Set("image", "audio", "video"))
  }

  test("per-partition feature extraction (mapInPandas analogue) is deterministic") {
    val media = Multimodal.mediaFromDocuments(Tables.documents(spark, sfDir))
    val feats = Multimodal.extractFeatures(spark, media)
    val rows = feats.collect()
    assert(rows.length == media.count())
    assert(rows.forall(f => f.n_bytes > 0 && f.checksum.length == 32))
    assert(rows.forall(f => f.brightness >= 0.0 && f.brightness <= 1.0))
    // checksum agrees with the SQL-side md5 (same bytes)
    val sqlSums = media.select(col("media_id"), md5(col("content")).as("m"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(rows.forall(f => sqlSums(f.media_id) == f.checksum))
    // repartitioned input produces identical features (partition-independent)
    val again = Multimodal.extractFeatures(spark, media.repartition(7))
      .collect().map(f => f.media_id -> f).toMap
    assert(rows.forall(f => again(f.media_id) == f))
  }

  test("grayscale PNG codec round-trips pixel-exactly (incl. 0 and 255)") {
    val pxs = Array.tabulate(64)(i => (i * 4) % 256) // hits 0..252
    assert(Multimodal.decodeGray(Multimodal.encodeGray(pxs, 8)).get.sameElements(pxs))
    val edge = Array.fill(64)(0); edge(0) = 255; edge(63) = 255
    assert(Multimodal.decodeGray(Multimodal.encodeGray(edge, 8)).get.sameElements(edge))
    // PNG bytes carry the real magic, not raw pixels
    val png = Multimodal.encodeGray(pxs, 8)
    assert((png(0) & 0xff) == 0x89 && png(1) == 'P' && png(2) == 'N' && png(3) == 'G')
  }

  test("TIFF payloads pass the container sniff and decode pixel-true (both byte orders' magics)") {
    // ImageIO bundles a TIFF writer since Java 9 — a payload decodeGray
    // must accept, so the sniff carries the II*\0 / MM\0* magics
    val pxs = Array.tabulate(64)(i => (i * 4) % 256)
    val img = new java.awt.image.BufferedImage(
      8, 8, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    pxs.zipWithIndex.foreach { case (v, i) =>
      img.getRaster.setSample(i % 8, i / 8, 0, v)
    }
    val out = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "TIFF", out), "JVM lacks a TIFF writer")
    val tiff = out.toByteArray
    assert((tiff(0) == 'I' && tiff(1) == 'I') || (tiff(0) == 'M' && tiff(1) == 'M'))
    assert(Multimodal.decodeGray(tiff).get.sameElements(pxs),
      "TIFF must decode through the sniff, not fall to None")
  }

  test("grayscale AVI codec round-trips frame-exactly, including non-word-aligned widths") {
    // 8x8 (stride == width) and 6x5 (DIB rows pad to 8 bytes): both must
    // round-trip bit-exactly through the RIFF container
    for ((w, h) <- Seq((8, 8), (6, 5))) {
      val frames = Array.tabulate(3)(f => Array.tabulate(w * h)(i => (f * 40 + i * 3) % 256))
      val avi = Multimodal.encodeAviGray(frames, w, h)
      assert(avi(0) == 'R' && avi(1) == 'I' && avi(2) == 'F' && avi(3) == 'F' &&
        avi(8) == 'A' && avi(9) == 'V' && avi(10) == 'I')
      val (got, gw, gh) = Multimodal.decodeAviGray(avi).getOrElse(
        fail(s"own AVI did not decode (${w}x$h)"))
      assert((gw, gh) == ((w, h)))
      assert(got.length == 3)
      got.zip(frames).foreach { case (g, e) =>
        assert(g.sameElements(e), s"frame drifted at ${w}x$h")
      }
    }
    // non-AVI payloads fail the sniff, never the parser
    assert(Multimodal.decodeAviGray("not a riff at all".getBytes("UTF-8")).isEmpty)
  }

  test("video rows with real AVI payloads decode to pixel-true brightness") {
    import spark.implicits._
    val frames = Array(Array.fill(64)(100), Array.fill(64)(200))
    val avi = Multimodal.encodeAviGray(frames, 8, 8)
    val media = Seq(
      Multimodal.MediaRow(3L, "video", avi, 8, 8),
      Multimodal.MediaRow(6L, "video", "not a video".getBytes("UTF-8"), 0, 0))
      .toDS().toDF()
    val feats = Multimodal.extractFeatures(spark, media)
      .collect().map(f => f.media_id -> f).toMap
    assert(math.abs(feats(3L).brightness - 150.0 / 255.0) < 1e-12,
      s"real AVI decode must average DECODED pixels: ${feats(3L).brightness}")
    val fake = Multimodal.FakeDecoder.features(
      Multimodal.MediaRow(6L, "video", "not a video".getBytes("UTF-8"), 0, 0))
    assert(feats(6L) == fake, "non-AVI video payload must fall back to FakeDecoder")
  }

  test("image rows with real PNG payloads decode to pixel-true brightness") {
    import spark.implicits._
    val pxs = Array.tabulate(64)(i => 40 + i) // mean = 71.5
    val png = Multimodal.encodeGray(pxs, 8)
    val media = Seq(
      Multimodal.MediaRow(1L, "image", png, 8, 8),
      // image-kind payload no reader accepts -> FakeDecoder byte fallback
      Multimodal.MediaRow(2L, "image", "not a png".getBytes("UTF-8"), 0, 0))
      .toDS().toDF()
    val feats = Multimodal.extractFeatures(spark, media)
      .collect().map(f => f.media_id -> f).toMap
    val expected = pxs.map(_.toLong).sum.toDouble / 64 / 255.0
    assert(math.abs(feats(1L).brightness - expected) < 1e-12,
      s"real decode must see source pixels: ${feats(1L).brightness} vs $expected")
    // and it must NOT equal the byte-mean of the compressed PNG stream
    val byteMean = png.map(b => (b & 0xff).toLong).sum.toDouble / png.length / 255.0
    assert(math.abs(feats(1L).brightness - byteMean) > 1e-6)
    val fake = Multimodal.FakeDecoder.features(
      Multimodal.MediaRow(2L, "image", "not a png".getBytes("UTF-8"), 0, 0))
    assert(feats(2L) == fake, "undecodable payload must fall back to FakeDecoder")
  }

  test("PCM WAV codec round-trips sample-exactly (incl. Short.Min/Max edges)") {
    val smp = Array.tabulate(500)(i => (i * 131 % 65536) - 32768) // spans the range
    val (dec, rate) = Multimodal.decodeWavPcm16(Multimodal.encodeWavPcm16(smp, 16000)).get
    assert(rate == 16000)
    assert(dec.sameElements(smp))
    val edge = Array(Short.MinValue.toInt, -1, 0, 1, Short.MaxValue.toInt)
    val (dec2, _) = Multimodal.decodeWavPcm16(Multimodal.encodeWavPcm16(edge, 8000)).get
    assert(dec2.sameElements(edge))
    // WAV bytes carry the real RIFF/WAVE container, not raw samples
    val wav = Multimodal.encodeWavPcm16(smp, 16000)
    assert(new String(wav.take(4), "US-ASCII") == "RIFF" &&
      new String(wav.slice(8, 12), "US-ASCII") == "WAVE")
    // non-audio bytes are rejected, not misparsed
    assert(Multimodal.decodeWavPcm16("not a wav".getBytes("UTF-8")).isEmpty)
  }

  test("audio rows with real WAV payloads decode to sample-true loudness") {
    import spark.implicits._
    val smp = Array.tabulate(200)(i => (i - 100) * 300) // mean |s| known
    val wav = Multimodal.encodeWavPcm16(smp, 16000)
    val media = Seq(
      Multimodal.MediaRow(1L, "audio", wav, 0, 0),
      Multimodal.MediaRow(2L, "audio", "not a wav".getBytes("UTF-8"), 0, 0))
      .toDS().toDF()
    val feats = Multimodal.extractFeatures(spark, media)
      .collect().map(f => f.media_id -> f).toMap
    val expected = smp.map(s => math.abs(s.toLong)).sum.toDouble / smp.length / 32768.0
    assert(math.abs(feats(1L).brightness - expected) < 1e-12,
      s"real decode must see source samples: ${feats(1L).brightness} vs $expected")
    // and it must NOT equal the byte-mean of the WAV container bytes
    val byteMean = wav.map(b => (b & 0xff).toLong).sum.toDouble / wav.length / 255.0
    assert(math.abs(feats(1L).brightness - byteMean) > 1e-6)
    val fake = Multimodal.FakeDecoder.features(
      Multimodal.MediaRow(2L, "audio", "not a wav".getBytes("UTF-8"), 0, 0))
    assert(feats(2L) == fake, "undecodable payload must fall back to FakeDecoder")
  }
}
