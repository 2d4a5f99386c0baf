package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media payloads as opaque `binary` columns
  * with typed metadata, processed per-partition in batches.
  *
  * Image AND audio payloads get REAL codecs: [[encodeGray]] /
  * [[decodeGray]] are lossless 8-bit grayscale PNG via `javax.imageio`,
  * and [[encodeWavPcm16]] / [[decodeWavPcm16]] are lossless 16-bit PCM
  * mono WAV via `javax.sound.sampled` — both ship with every JVM, no
  * external codec dependency, and both round-trip bit-exactly (the
  * property that keeps the DuckDB oracle exact: it recomputes features
  * from the SOURCE values while the engine decodes real stored bytes).
  * [[MediaDecoder]] runs the real decode per kind, falling back to
  * [[FakeDecoder]]'s deterministic byte-derived pseudo-features for
  * payloads no installed reader accepts. VIDEO gets a real CONTAINER
  * codec too: [[encodeAviGray]] / [[decodeAviGray]] are lossless
  * uncompressed-DIB grayscale AVI (a standard RIFF layout any player
  * accepts) implemented directly — the JVM ships no video codec, and
  * the raw-DIB form needs none; a compressed-codec decode (JNI/ffmpeg)
  * would plug into the same seam. Everything around the
  * decoder — the schema, the `Dataset[MediaRow]` encoder, the
  * per-partition batched iteration (the Scala analogue of `mapInPandas`:
  * one decoder instance per partition, streamed batches, never a
  * full-partition materialization) — is the real 100 TB design: media
  * blobs stay distributed, metadata travels in columns, and the codec
  * slot is exchangeable.
  */
object Multimodal {

  /** A media row: payload + typed metadata (the multimodal schema). */
  final case class MediaRow(
      media_id: Long,
      kind: String,          // "image" | "audio" | "video"
      content: Array[Byte],  // opaque payload
      width: Int,            // metadata the decoder would fill/verify
      height: Int)

  /** Extracted features per media row. */
  final case class MediaFeatures(
      media_id: Long,
      kind: String,
      n_bytes: Long,
      checksum: String,      // md5 of the payload
      brightness: Double)    // stubbed: mean byte value / 255

  /** STUB decoder — deterministic fake standing in for a real codec. */
  object FakeDecoder {
    def features(row: MediaRow): MediaFeatures = {
      val bytes = row.content
      val mean =
        if (bytes.isEmpty) 0.0
        else bytes.map(b => (b & 0xff).toLong).sum.toDouble / bytes.length / 255.0
      MediaFeatures(
        row.media_id, row.kind, bytes.length.toLong,
        java.security.MessageDigest.getInstance("MD5").digest(bytes)
          .map("%02x".format(_)).mkString,
        mean)
    }
  }

  /** Lossless 8-bit grayscale PNG encode of a square pixel array (row-
    * major, values 0-255). PNG grayscale is bit-exact under round-trip,
    * so `decodeGray(encodeGray(p)) == p` — the property that lets the
    * DuckDB oracle compute image features from the SOURCE pixel values
    * while the engine computes them from a real decode of real PNG bytes.
    */
  def encodeGray(pixels: Array[Int], side: Int): Array[Byte] = {
    require(pixels.length == side * side,
      s"need $side*$side pixels, got ${pixels.length}")
    val img = new java.awt.image.BufferedImage(
      side, side, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    var i = 0
    while (i < pixels.length) {
      img.getRaster.setSample(i % side, i / side, 0, pixels(i) & 0xff)
      i += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** Container sniff before decoder dispatch: the magic bytes of the
    * formats the JVM's decoders accept. A feature-extraction pass over a
    * mixed corpus meets MOSTLY payloads its decoder must reject (wrong
    * kind, corrupt, unknown container) — and `ImageIO.read` /
    * `AudioSystem.getAudioInputStream` reject by spinning up a stream +
    * scanning the reader registry (+ throwing, for audio) PER ROW. The
    * 4-12 byte prefix check answers the same question at memory-compare
    * cost; for PNG/JPEG/GIF/BMP/TIFF corpora a payload that fails it
    * would have decoded to None anyway, so outputs are bit-identical.
    * (The same check a production pipeline runs as `file`-style MIME
    * sniffing before routing blobs to codecs.) The one format ImageIO
    * bundles that the sniff intentionally excludes is WBMP — see the
    * note below the magics.
    */
  private def looksLikeImage(b: Array[Byte]): Boolean =
    (b.length >= 8 &&
      (b(0) & 0xff) == 0x89 && b(1) == 'P' && b(2) == 'N' && b(3) == 'G') || // PNG
    (b.length >= 3 && (b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8) ||     // JPEG
    (b.length >= 6 && b(0) == 'G' && b(1) == 'I' && b(2) == 'F') ||          // GIF
    (b.length >= 2 && b(0) == 'B' && b(1) == 'M') ||                         // BMP
    (b.length >= 4 && b(0) == 'I' && b(1) == 'I' && b(2) == 0x2a && b(3) == 0) || // TIFF LE
    (b.length >= 4 && b(0) == 'M' && b(1) == 'M' && b(2) == 0 && b(3) == 0x2a)    // TIFF BE
    // NOT sniffed: WBMP. Its "magic" is two zero bytes — a prefix shared
    // by arbitrary binary junk — so admitting it would route most of a
    // mixed corpus's rejects through the expensive ImageIO registry scan
    // and defeat the prefilter. decodeGray therefore returns None for
    // WBMP payloads, a documented narrowing vs raw ImageIO.read.

  private def looksLikeWav(b: Array[Byte]): Boolean =
    b.length >= 12 && b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
      b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E'

  /** Real image decode via `javax.imageio` (PNG/JPEG/GIF/BMP/TIFF on
    * every JVM): grayscale pixel values row-major, or None when no installed
    * reader accepts the bytes ([[looksLikeImage]] pre-filters at
    * memory-compare cost). `setUseCache(false)` keeps decode purely
    * in-memory — an executor must never page image batches through
    * temp files on local disk.
    */
  def decodeGray(bytes: Array[Byte]): Option[Array[Int]] = {
    if (!looksLikeImage(bytes)) return None
    javax.imageio.ImageIO.setUseCache(false)
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    if (img == null) None
    else {
      val r = img.getRaster
      val (w, h) = (r.getWidth, r.getHeight)
      // band 0 of a TYPE_BYTE_GRAY raster IS the gray sample; other image
      // types fall back to the luminance of the default color conversion
      if (img.getType == java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
        Some(Array.tabulate(w * h)(i => r.getSample(i % w, i / w, 0)))
      else {
        val gray = new java.awt.image.BufferedImage(
          w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
        val g = gray.createGraphics()
        g.drawImage(img, 0, 0, null)
        g.dispose()
        val gr = gray.getRaster
        Some(Array.tabulate(w * h)(i => gr.getSample(i % w, i / w, 0)))
      }
    }
  }

  /** Lossless 16-bit PCM mono WAV encode via `javax.sound.sampled` (on
    * every JVM). Samples are signed 16-bit values; PCM is a raw sample
    * container, so `decodeWavPcm16(encodeWavPcm16(s, r)) == (s, r)`
    * bit-exactly — the audio twin of [[encodeGray]]'s PNG property.
    */
  def encodeWavPcm16(samples: Array[Int], sampleRate: Int): Array[Byte] = {
    require(samples.nonEmpty, "PCM encode needs at least one sample")
    val pcm = new Array[Byte](samples.length * 2)
    var i = 0
    while (i < samples.length) {
      val s = samples(i)
      require(s >= Short.MinValue && s <= Short.MaxValue, s"sample out of 16-bit range: $s")
      pcm(2 * i) = (s & 0xff).toByte          // little-endian
      pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(
      sampleRate.toFloat, 16, 1, true, false) // 16-bit, mono, signed, little-endian
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, samples.length.toLong)
    val out = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  // ---- Video: uncompressed 8-bit grayscale DIB frames in a RIFF AVI ----
  //
  // The one media kind the JVM ships no codec for. Rather than leave the
  // slot stubbed, the container is implemented directly: AVI is a RIFF
  // file — LIST hdrl (avih + one strl with strh/strf) + LIST movi holding
  // one '00db' chunk per frame — and with biCompression=0 (raw DIB) the
  // frame payload is the pixel bytes themselves (bottom-up rows, 4-byte-
  // aligned stride), so encode/decode round-trips BIT-EXACTLY: the same
  // losslessness property the PNG and WAV codecs give images and audio,
  // which is what keeps the DuckDB oracle exact (it recomputes features
  // from source values; the engine decodes real stored containers).
  // Any player accepts the output (it is a standard uncompressed AVI);
  // a compressed-codec decode (H.264 etc.) would plug into the same
  // [[MediaDecoder]] seam via JNI/ffmpeg.

  private def looksLikeAvi(b: Array[Byte]): Boolean =
    b.length >= 12 && b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
      b(8) == 'A' && b(9) == 'V' && b(10) == 'I' && b(11) == ' '

  private def aviRowSize(w: Int): Int = ((w + 3) / 4) * 4 // DIB 4-byte stride

  /** Lossless grayscale AVI encode: `frames` are row-major pixel arrays
    * (values 0-255), all `w` x `h`. Standard chunk layout — avih, one
    * 'vids'/'DIB ' stream with an 8-bit BITMAPINFOHEADER + gray palette,
    * one '00db' raw-DIB chunk per frame (bottom-up rows, padded stride).
    */
  def encodeAviGray(frames: Array[Array[Int]], w: Int, h: Int,
      fps: Int = 25): Array[Byte] = {
    require(frames.nonEmpty && w > 0 && h > 0 && fps > 0, "empty video")
    frames.foreach(f => require(f.length == w * h, s"frame size ${f.length} != ${w * h}"))
    val stride = aviRowSize(w)
    val frameBytes = stride * h
    def le32(v: Int): Array[Byte] =
      Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
        ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    def le16(v: Int): Array[Byte] =
      Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
    def fcc(s: String): Array[Byte] = s.getBytes("US-ASCII")
    val out = new java.io.ByteArrayOutputStream()
    def chunk(id: String, body: Array[Byte]): Array[Byte] = {
      val pad = if (body.length % 2 == 1) Array(0.toByte) else Array.emptyByteArray
      fcc(id) ++ le32(body.length) ++ body ++ pad
    }
    def list(kind: String, body: Array[Byte]): Array[Byte] =
      chunk("LIST", fcc(kind) ++ body)
    // flags 0: no idx1 index is written (legal for AVIs this small; a
    // streaming writer would append one)
    val avih = le32(1000000 / fps) ++ le32(frameBytes * fps) ++ le32(0) ++
      le32(0) ++
      le32(frames.length) ++ le32(0) ++ le32(1) ++ le32(frameBytes) ++
      le32(w) ++ le32(h) ++ le32(0) ++ le32(0) ++ le32(0) ++ le32(0)
    val strh = fcc("vids") ++ fcc("DIB ") ++ le32(0) ++ le16(0) ++ le16(0) ++
      le32(0) ++ le32(1) ++ le32(fps) ++ le32(0) ++ le32(frames.length) ++
      le32(frameBytes) ++ le32(-1) ++ le32(0) ++
      le16(0) ++ le16(0) ++ le16(w) ++ le16(h)
    val palette = Array.tabulate(256 * 4) { i =>
      if (i % 4 == 3) 0.toByte else (i / 4).toByte // gray BGRA entries
    }
    val strf = le32(40) ++ le32(w) ++ le32(h) ++ le16(1) ++ le16(8) ++
      le32(0) ++ le32(frameBytes) ++ le32(0) ++ le32(0) ++ le32(256) ++ le32(256) ++
      palette
    val hdrl = list("hdrl",
      chunk("avih", avih) ++ list("strl", chunk("strh", strh) ++ chunk("strf", strf)))
    val movi = list("movi", frames.flatMap { f =>
      val dib = new Array[Byte](frameBytes)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val v = f(y * w + x)
          require(v >= 0 && v <= 255, s"pixel out of range: $v")
          dib((h - 1 - y) * stride + x) = v.toByte // bottom-up rows
          x += 1
        }
        y += 1
      }
      chunk("00db", dib)
    }.toArray)
    val riffBody = fcc("AVI ") ++ hdrl ++ movi
    out.write(fcc("RIFF")); out.write(le32(riffBody.length)); out.write(riffBody)
    out.toByteArray
  }

  /** Real video decode: walk the RIFF tree, read the stream format from
    * strf (must be 8-bit uncompressed DIB), collect every '00db'/'00dc'
    * movi chunk as one frame (rows un-flipped, stride stripped). Returns
    * (frames, w, h), or None for anything that is not an 8-bit raw-DIB
    * AVI ([[looksLikeAvi]] pre-filters at memcmp cost — same mixed-corpus
    * discipline as the image/audio sniffs).
    */
  def decodeAviGray(bytes: Array[Byte]): Option[(Array[Array[Int]], Int, Int)] =
    try {
      if (!looksLikeAvi(bytes)) return None
      def le32(o: Int): Int = (bytes(o) & 0xff) | ((bytes(o + 1) & 0xff) << 8) |
        ((bytes(o + 2) & 0xff) << 16) | ((bytes(o + 3) & 0xff) << 24)
      def fccAt(o: Int): String = new String(bytes, o, 4, "US-ASCII")
      var w = -1; var h = -1
      val frames = scala.collection.mutable.ArrayBuffer.empty[Array[Int]]
      // walk [from, until) as a chunk sequence; LIST bodies recurse
      def walk(from: Int, until: Int): Unit = {
        var o = from
        while (o + 8 <= until) {
          val id = fccAt(o); val n = le32(o + 4); val body = o + 8
          if (body + n > bytes.length) return
          id match {
            case "LIST" => walk(body + 4, body + n) // skip the list kind fcc
            case "strf" =>
              val bits = (bytes(body + 14) & 0xff) | ((bytes(body + 15) & 0xff) << 8)
              val comp = le32(body + 16)
              if (bits != 8 || comp != 0) return // not raw 8-bit DIB
              w = le32(body + 4); h = le32(body + 8)
            case "00db" | "00dc" if w > 0 && h > 0 =>
              val stride = aviRowSize(w)
              if (n >= stride * h) {
                val f = new Array[Int](w * h)
                var y = 0
                while (y < h) {
                  var x = 0
                  while (x < w) {
                    f(y * w + x) = bytes(body + (h - 1 - y) * stride + x) & 0xff
                    x += 1
                  }
                  y += 1
                }
                frames += f
              }
            case _ => ()
          }
          o = body + n + (n & 1) // chunks are word-aligned
        }
      }
      walk(12, math.min(bytes.length, 8 + le32(4)))
      if (w <= 0 || h <= 0 || frames.isEmpty) None
      else Some((frames.toArray, w, h))
    } catch { case _: Exception => None }

  /** Real audio decode via `javax.sound.sampled`: signed 16-bit mono PCM
    * samples plus the sample rate, or None when no installed reader
    * accepts the bytes (or the format is not the 16-bit mono PCM this
    * engine writes).
    */
  def decodeWavPcm16(bytes: Array[Byte]): Option[(Array[Int], Int)] =
    try {
      if (!looksLikeWav(bytes)) return None
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      val f = ais.getFormat
      if (f.getChannels != 1 || f.getSampleSizeInBits != 16 || f.isBigEndian ||
          f.getEncoding != javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED) None
      else {
        val pcm = ais.readAllBytes()
        val n = pcm.length / 2
        val samples = new Array[Int](n)
        var i = 0
        while (i < n) {
          samples(i) = ((pcm(2 * i + 1).toInt << 8) | (pcm(2 * i).toInt & 0xff))
          i += 1
        }
        Some((samples, f.getSampleRate.toInt))
      }
    } catch { case _: Exception => None }

  /** Real decoder: image rows go through [[decodeGray]] (brightness from
    * DECODED pixels), audio rows through [[decodeWavPcm16]] (brightness
    * slot carries mean |sample| / 32768 — the loudness analogue);
    * payloads no reader accepts — and the stubbed video kind — keep
    * [[FakeDecoder]]'s deterministic features.
    */
  object MediaDecoder {
    def features(row: MediaRow): MediaFeatures = row.kind match {
      case "image" => decodeGray(row.content) match {
        case Some(pxs) =>
          val fake = FakeDecoder.features(row)
          fake.copy(brightness =
            if (pxs.isEmpty) 0.0
            else pxs.map(_.toLong).sum.toDouble / pxs.length / 255.0)
        case None => FakeDecoder.features(row)
      }
      case "audio" => decodeWavPcm16(row.content) match {
        case Some((samples, _)) =>
          val fake = FakeDecoder.features(row)
          fake.copy(brightness =
            if (samples.isEmpty) 0.0
            else samples.map(s => math.abs(s.toLong)).sum.toDouble / samples.length / 32768.0)
        case None => FakeDecoder.features(row)
      }
      case "video" => decodeAviGray(row.content) match {
        case Some((frames, w, h)) =>
          val fake = FakeDecoder.features(row)
          val n = frames.length.toLong * w * h
          fake.copy(brightness =
            if (n == 0) 0.0
            else frames.map(_.map(_.toLong).sum).sum.toDouble / n / 255.0)
        case None => FakeDecoder.features(row)
      }
      case _ => FakeDecoder.features(row)
    }
  }

  /** Build a deterministic media table from `documents` (text bytes stand
    * in for media payloads; ids/kinds/dims derived from doc_id).
    */
  def mediaFromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (col("doc_id") % 3 + 1).cast("int")).as("kind"),
      encode(col("text"), "UTF-8").as("content"),
      (col("doc_id") % 640 + 1).cast("int").as("width"),
      (col("doc_id") % 480 + 1).cast("int").as("height"))

  /** Per-partition batched feature extraction (mapInPandas analogue):
    * one decoder per partition, rows streamed through it lazily.
    */
  def extractFeatures(spark: SparkSession, media: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions { rows =>
      // per-partition decoder init (further codec/JNI handles go here)
      javax.imageio.ImageIO.setUseCache(false)
      rows.map(MediaDecoder.features)
    }
  }
}
