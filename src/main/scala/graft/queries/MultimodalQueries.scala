package graft.queries

import org.apache.spark.sql.functions._
import graft.{Q, Tables}

/** Oracle-checked surface for the multimodal plumbing: binary payload
  * metadata derived purely with Column expressions (byte length, checksum,
  * head sample) — the columnar complement to
  * [[graft.operators.Multimodal.extractFeatures]] (whose mapPartitions
  * path is covered by scalatest, not the SQL oracle).
  */
object MultimodalQueries {

  /** mm04 stub-decode size: the leading bytes standing in for grayscale
    * pixels, and the aHash bit width.
    */
  val AHashPixels = 64

  /** mm06 audio clip shape: PCM sample count per clip (the leading
    * sanitized chars standing in for samples, mm04's pixel playbook) and
    * the sample rate stamped into the WAV header (certified through the
    * decode by the oracle's literal).
    */
  val AudioSamples = 256
  val AudioRate = 16000

  /** mm07 video clip shape: [[VideoFrames]] frames of [[VideoW]] x
    * [[VideoH]] grayscale pixels per clip (leading sanitized chars as
    * pixels — ascii value = pixel value, so frame bytes == source bytes
    * and both engines can md5 them). 8 x 8 x 4 = 256 chars keeps the
    * same corpus coverage as mm06's audio clips.
    */
  val VideoW = 8
  val VideoH = 8
  val VideoFrames = 4

  /** mm04 duplicate-injection id offset — ≡ 0 mod 3 so an injected copy
    * keeps the image kind routing, and far above any real doc_id (the
    * loud-failure guard below enforces that, same convention as the
    * d-family's BatchIdOffset guard). Note mm04's %3 kind routing does
    * NOT survive `ScaleData.scaleDocuments` replication (the replica id
    * step is a multiple of 100, and 100 % 3 != 0), so mm04 is excluded
    * from the documents equivariance contract by design.
    */
  val MmDupOffset = 300000L

  // one-time (per JVM, per dataset dir) max-id guard: a corpus whose real
  // doc_ids reach MmDupOffset must FAIL, not silently alias injected
  // copies with real documents. Shares DedupQueries' parameterized guard
  // (driver-side max, memoized — see its doc for why not in-plan
  // assert_true); mx < MmDupOffset also keeps the two injected ranges
  // disjoint (Off + mx < 2*Off ⟺ mx < Off).
  private def assertIdsBelowMmOffset(df: org.apache.spark.sql.DataFrame, what: String): Unit =
    DedupQueries.assertIdsBelow(df, "doc_id", what, MmDupOffset,
      "mm04's injected duplicate ids alias real documents")

  val entries: Seq[Q] = Seq(

    // Binary metadata per kind: payload byte sizes + per-kind counts.
    // UTF-8 text bytes stand in for media payloads (deterministic in both
    // engines); md5 and octet lengths operate on the bytes.
    Q("mm01_binary_meta",
      """SELECT CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
        |       COUNT(*) AS n,
        |       CAST(SUM(octet_length(encode(text))) AS BIGINT) AS total_bytes,
        |       MIN(md5(text)) AS min_checksum
        |FROM documents
        |GROUP BY kind ORDER BY kind""".stripMargin) { (s, d) =>
      Tables.documents(s, d)
        .select(
          element_at(array(lit("image"), lit("audio"), lit("video")),
            (col("doc_id") % 3 + 1).cast("int")).as("kind"),
          encode(col("text"), "UTF-8").as("content"),
          md5(col("text")).as("checksum"))
        .groupBy("kind")
        .agg(
          count(lit(1)).as("n"),
          sum(length(col("content")).cast("long")).as("total_bytes"),
          min(col("checksum")).as("min_checksum"))
        .orderBy("kind")
    },

    // Frame sampling over opaque binary payloads: "video" rows are framed
    // at a fixed 32-byte stride, every 2nd frame is sampled, and each
    // sampled frame is sliced out of the payload BYTES (binary substring
    // — the shape of keyframe extraction before a decode UDF sees it).
    // The frame index comes from sequence() per row (no driver loop), so
    // the whole thing is one map-side pass: explode-by-frame-count, slice,
    // checksum, per-doc rollup. Payloads are sanitized to printable ASCII
    // before encoding so the byte-level Spark path and the DuckDB
    // character-level twin are equal by construction (byte == char), while
    // the Spark plan exercises real BinaryType slicing end to end.
    Q("mm02_frame_sample",
      """WITH v AS (
        |  SELECT doc_id, regexp_replace(text, '[^ -~]', '', 'g') AS ct
        |  FROM documents WHERE doc_id % 3 = 2
        |),
        |f AS (
        |  SELECT doc_id, CAST(floor(length(ct) / 32.0) AS BIGINT) AS n_frames, ct FROM v
        |),
        |sampled AS (
        |  SELECT doc_id, n_frames, unnest(generate_series(0, n_frames - 1, 2)) AS frame_no, ct
        |  FROM f WHERE n_frames > 0
        |)
        |SELECT doc_id, MAX(n_frames) AS n_frames, CAST(COUNT(*) AS BIGINT) AS n_sampled,
        |       MIN(md5(substring(ct, CAST(frame_no*32+1 AS BIGINT), 32))) AS min_frame_md5
        |FROM sampled GROUP BY doc_id ORDER BY doc_id""".stripMargin) { (s, d) =>
      Tables.documents(s, d)
        .where(col("doc_id") % 3 === 2)
        .select(col("doc_id"),
          encode(regexp_replace(col("text"), "[^ -~]", ""), "UTF-8").as("content"))
        .withColumn("n_frames", floor(length(col("content")) / 32.0).cast("long"))
        .where(col("n_frames") > 0)
        .select(col("doc_id"), col("n_frames"),
          explode(sequence(lit(0L), col("n_frames") - 1, lit(2L))).as("frame_no"),
          col("content"))
        .withColumn("frame", expr("substring(content, cast(frame_no*32+1 as int), 32)"))
        .groupBy("doc_id")
        .agg(max("n_frames").as("n_frames"),
          count(lit(1)).as("n_sampled"),
          min(md5(col("frame"))).as("min_frame_md5"))
        .orderBy("doc_id")
    },

    // mm03 puts the BATCHED DECODE PATH itself under the oracle gate:
    // [[graft.operators.Multimodal.extractFeatures]] — the typed
    // `Dataset[MediaRow].mapPartitions` analogue of `mapInPandas` (one
    // decoder instance per partition, rows streamed, media bytes never
    // leave the executor) — runs the stub decoder over every payload and
    // the oracle recomputes the decoder-independent outputs (byte count,
    // md5 checksum, kind routing) in SQL. The stub-only `brightness`
    // feature (not SQL-expressible over blobs) stays spec-certified in
    // MultimodalSpec; swapping the stub for a real codec changes neither
    // the plumbing nor this query's checked columns.
    Q("mm03_media_features",
      """SELECT doc_id AS media_id,
        |       CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
        |       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        |       md5(text) AS checksum
        |FROM documents
        |ORDER BY media_id""".stripMargin) { (s, d) =>
      graft.operators.Multimodal.extractFeatures(
          s, graft.operators.Multimodal.mediaFromDocuments(Tables.documents(s, d)))
        .toDF()
        .select(col("media_id"), col("kind"), col("n_bytes"), col("checksum"))
        .orderBy("media_id")
    },

    // Image near-dup via perceptual hash — the multimodal twin of d03's
    // banded SimHash search, composing the two families: build REAL 8x8
    // grayscale PNGs (pixels = ascii codes of the first [[AHashPixels]]
    // sanitized chars, so the oracle can recompute them), store them as a
    // binary media stage, DECODE the stored bytes with javax.imageio, and
    // compute a 64-bit average-hash from the decoded pixels (bit i =
    // pixel i above the image's own floor-mean); band the hash into
    // 4 x 16-bit keys, self-join on (band, key), and verify candidates
    // by exact Hamming distance — the
    // banding bounds every bucket, so image dedup at corpus scale never
    // goes all-pairs, exactly like the text detectors. Every 30th image
    // is injected as an exact duplicate (id + [[MmDupOffset]], which is
    // ≡ 0 mod 3 so the copy routes as an image too) to keep the check
    // non-vacuous; integer arithmetic end to end.
    Q("mm04_image_neardup", {
      val bandRows = (0 until DedupQueries.SimhashBands).map(b =>
        s"  SELECT doc_id, $b AS band, substring(sig, ${b * DedupQueries.SimhashBandBits + 1}, ${DedupQueries.SimhashBandBits}) AS key FROM s")
        .mkString(" UNION ALL\n")
      val ham = (a: String, b: String) =>
        s"CAST(list_sum(list_transform(generate_series(1, $AHashPixels), i -> CASE WHEN substring($a, i, 1) <> substring($b, i, 1) THEN 1 ELSE 0 END)) AS BIGINT)"
      s"""WITH cleaned AS (
         |  SELECT doc_id, regexp_replace(text, '[^ -~]', '', 'g') AS ct
         |  FROM documents WHERE doc_id % 3 = 0
         |),
         |imgs AS (
         |  SELECT doc_id, ct FROM cleaned
         |  UNION ALL
         |  SELECT doc_id + $MmDupOffset AS doc_id, ct FROM cleaned WHERE doc_id % 30 = 0
         |  UNION ALL
         |  SELECT doc_id + ${2 * MmDupOffset} AS doc_id, 'Z' || substring(ct, 2) AS ct
         |  FROM cleaned WHERE doc_id % 60 = 0
         |),
         |px AS (
         |  SELECT doc_id,
         |         list_transform(generate_series(1, $AHashPixels),
         |                        i -> ascii(substring(ct, CAST(i AS INTEGER), 1))) AS pxs
         |  FROM imgs WHERE len(ct) >= $AHashPixels
         |),
         |m AS (SELECT doc_id, pxs, CAST(list_sum(pxs) AS BIGINT) // $AHashPixels AS mu FROM px),
         |s AS (
         |  SELECT doc_id,
         |         array_to_string(list_transform(pxs, p -> CASE WHEN p > mu THEN '1' ELSE '0' END), '') AS sig
         |  FROM m
         |),
         |bands AS (
         |$bandRows
         |),
         |cand AS (
         |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         |  FROM bands a JOIN bands b ON a.band = b.band AND a.key = b.key
         |                           AND a.doc_id < b.doc_id
         |)
         |SELECT c.doc_a, c.doc_b, ${ham("x.sig", "y.sig")} AS hamming
         |FROM cand c JOIN s x ON c.doc_a = x.doc_id JOIN s y ON c.doc_b = y.doc_id
         |WHERE ${ham("x.sig", "y.sig")} <= ${DedupQueries.HammingMax}
         |ORDER BY doc_a, doc_b""".stripMargin
    }) { (s, d) =>
      graft.GraftNative.ensure(s)
      val docs = Tables.documents(s, d)
      assertIdsBelowMmOffset(docs, s"documents@$d")
      val cleaned = docs
        .where(col("doc_id") % 3 === 0)
        .select(col("doc_id"),
          regexp_replace(col("text"), "[^ -~]", "").as("ct"))
      val imgs = cleaned
        .unionByName(cleaned.where(col("doc_id") % 30 === 0)
          .select((col("doc_id") + MmDupOffset).as("doc_id"), col("ct")))
        // a TRUE near-dup per 60th image: first pixel perturbed, so its
        // aHash differs in a few bits — the hamming-verify path is
        // exercised at nonzero distance, not just on exact copies
        .unionByName(cleaned.where(col("doc_id") % 60 === 0)
          .select((col("doc_id") + 2 * MmDupOffset).as("doc_id"),
            concat(lit("Z"), expr("substring(ct, 2, length(ct))")).as("ct")))
      // REAL image path: the pixel source (ascii codes of the first 64
      // sanitized chars — what the oracle can also compute) is encoded as
      // an 8x8 grayscale PNG per image, WRITTEN as a binary media stage,
      // and the aHash is computed from a real javax.imageio DECODE of
      // those stored PNG bytes (per-partition decoder, same contract as
      // extractFeatures). PNG grayscale round-trips losslessly, so the
      // decoded pixels equal the source values and the oracle stays an
      // exact twin while the engine exercises encode -> binary storage ->
      // decode -> perceptual hash end to end.
      import s.implicits._
      val side = math.sqrt(AHashPixels.toDouble).toInt
      val pngs = graft.operators.Stage.table(
        imgs.where(length(col("ct")) >= AHashPixels)
          .withColumn("pxs",
            expr(s"transform(sequence(1, $AHashPixels), i -> ascii(substring(ct, i, 1)))"))
          .select(col("doc_id"), col("pxs"))
          .as[(Long, Array[Int])]
          .mapPartitions(_.map { case (id, pxs) =>
            (id, graft.operators.Multimodal.encodeGray(pxs, side))
          })
          .toDF("doc_id", "png"),
        "mm04_png")
      val sig = graft.operators.Stage.table(
        pngs.as[(Long, Array[Byte])]
          .mapPartitions { rows =>
            javax.imageio.ImageIO.setUseCache(false)
            rows.map { case (id, png) =>
              val pxs = graft.operators.Multimodal.decodeGray(png).getOrElse(
                throw new IllegalStateException(s"undecodable stored PNG for image $id"))
              val mu = pxs.map(_.toLong).sum / AHashPixels
              (id, pxs.map(p => if (p > mu) '1' else '0').mkString)
            }
          }
          .toDF("doc_id", "sig"),
        "mm04_sig")
      val bands = sig.select(col("doc_id"), posexplode(
          array((0 until DedupQueries.SimhashBands).map(b =>
            substring(col("sig"), b * DedupQueries.SimhashBandBits + 1,
              DedupQueries.SimhashBandBits)): _*))
          .as(Seq("band", "key")))
      val cand = bands.as("a").join(bands.as("b"),
          col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
            col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
        .distinct()
      cand
        .join(sig.select(col("doc_id").as("doc_a"), col("sig").as("sig_a")), Seq("doc_a"))
        .join(sig.select(col("doc_id").as("doc_b"), col("sig").as("sig_b")), Seq("doc_b"))
        .withColumn("hamming", graft.GraftNative.hamming(col("sig_a"), col("sig_b")))
        .where(col("hamming") <= DedupQueries.HammingMax)
        .select("doc_a", "doc_b", "hamming")
        .orderBy("doc_a", "doc_b")
    },

    // REAL audio path (mm06) — mm04's PNG playbook transplanted to sound:
    // the sample source (centered ascii codes of the first [[AudioSamples]]
    // sanitized chars x 256, so the oracle can recompute them) is encoded
    // as a REAL 16-bit PCM mono WAV per audio-kind doc
    // ([[graft.operators.Multimodal.encodeWavPcm16]]), WRITTEN as a binary
    // media stage, and every checked feature — sample count, sample RATE
    // (read from the decoded header, certifying the container round-trip),
    // integer amplitude sum, peak, zero crossings — is computed from a
    // real javax.sound.sampled DECODE of those stored bytes (per-partition
    // decoder, the extractFeatures contract). PCM round-trips bit-exactly,
    // so the decoded samples equal the source values and the oracle stays
    // an exact twin while the engine exercises encode -> binary storage ->
    // decode -> feature extraction end to end. Video remains the one
    // stubbed kind (the JVM ships no video codec).
    Q("mm06_audio_features", {
      val n = AudioSamples
      s"""WITH cleaned AS (
         |  SELECT doc_id, regexp_replace(text, '[^ -~]', '', 'g') AS ct
         |  FROM documents WHERE doc_id % 3 = 1
         |),
         |smp AS (
         |  SELECT doc_id,
         |         list_transform(generate_series(1, $n),
         |                        i -> (ascii(substring(ct, CAST(i AS INTEGER), 1)) - 79) * 256) AS s
         |  FROM cleaned WHERE len(ct) >= $n
         |)
         |SELECT doc_id, CAST($n AS BIGINT) AS n_samples,
         |       CAST($AudioRate AS BIGINT) AS sample_rate,
         |       CAST(list_sum(list_transform(s, x -> abs(x))) AS BIGINT) AS amp_sum,
         |       CAST(list_max(list_transform(s, x -> abs(x))) AS BIGINT) AS peak,
         |       CAST(len(list_filter(generate_series(2, $n), i -> s[i] * s[i-1] < 0)) AS BIGINT) AS zero_cross
         |FROM smp ORDER BY doc_id""".stripMargin
    }) { (s, d) =>
      import s.implicits._
      import graft.operators.Multimodal
      val n = AudioSamples
      val wavs = graft.operators.Stage.table(
        Tables.documents(s, d)
          .where(col("doc_id") % 3 === 1)
          .select(col("doc_id"),
            regexp_replace(col("text"), "[^ -~]", "").as("ct"))
          .where(length(col("ct")) >= n)
          .withColumn("smp",
            expr(s"transform(sequence(1, $n), i -> (ascii(substring(ct, i, 1)) - 79) * 256)"))
          .select(col("doc_id"), col("smp"))
          .as[(Long, Array[Int])]
          .mapPartitions(_.map { case (id, smp) =>
            (id, Multimodal.encodeWavPcm16(smp, AudioRate))
          })
          .toDF("doc_id", "wav"),
        "mm06_wav")
      wavs.as[(Long, Array[Byte])]
        .mapPartitions { rows =>
          rows.map { case (id, wav) =>
            val (smp, rate) = Multimodal.decodeWavPcm16(wav).getOrElse(
              throw new IllegalStateException(s"undecodable stored WAV for doc $id"))
            var amp = 0L; var peak = 0L; var zc = 0L
            var i = 0
            while (i < smp.length) {
              val a = math.abs(smp(i).toLong)
              amp += a
              if (a > peak) peak = a
              if (i > 0 && smp(i).toLong * smp(i - 1) < 0) zc += 1
              i += 1
            }
            (id, smp.length.toLong, rate.toLong, amp, peak, zc)
          }
        }
        .toDF("doc_id", "n_samples", "sample_rate", "amp_sum", "peak", "zero_cross")
        .orderBy("doc_id")
    },

    // Cross-modal retrieval: text queries against image media through a
    // shared embedding space — the composition the ANN and multimodal
    // families were built for. Docs embed via the hashing trick (64-dim
    // token-count vector, dim = 28-bit md5 of the token mod 64 — the
    // deterministic stand-in for a text encoder); the media side is the
    // SAME memoized quantized-vector stage the v-family searches,
    // restricted to image-kind ids (vec_id % 3 = 0, the mm routing), and
    // both sides hash into the SAME random-hyperplane LSH buckets as
    // v04/v06 — so retrieval is the bucket-pruned probe join + the
    // shared bounded top-k reduce (WindowGroupLimit partial limit before
    // the shuffle), never all-pairs. At 100 TB the probe side is a query
    // batch (tiny, broadcast) and the media index is the written stage.
    Q("mm05_crossmodal", {
      val dim = SimilarityQueries.EmbDim
      val k = SimilarityQueries.K
      val np = SimilarityQueries.NumProbes
      s"""WITH ${SimilarityQueries.qvSql},
         |imgs AS (
         |  SELECT vec_id, q, n2, ${SimilarityQueries.lshBucketSql("q")} AS bucket
         |  FROM n WHERE vec_id % 3 = 0 AND n2 > 0
         |),
         |pb AS (
         |  SELECT doc_id,
         |         list_transform(string_split_regex(trim(lower(text)), '\\s+'),
         |                        t -> CAST('0x' || substring(md5(t), 1, 7) AS BIGINT) % $dim) AS bks
         |  FROM documents WHERE doc_id < $np
         |),
         |pv AS (
         |  SELECT doc_id,
         |         list_transform(generate_series(0, ${dim - 1}),
         |                        j -> CAST(len(list_filter(bks, b -> b = j)) AS BIGINT)) AS q
         |  FROM pb
         |),
         |pn AS (
         |  SELECT doc_id, q,
         |         CAST(list_sum(list_transform(q, x -> x * x)) AS BIGINT) AS n2,
         |         ${SimilarityQueries.lshBucketSql("q")} AS bucket
         |  FROM pv
         |),
         |scored AS (
         |  SELECT p.doc_id, c.vec_id AS media_id,
         |         CAST(CAST(list_sum(list_transform(list_zip(p.q, c.q), s -> s[1] * s[2])) AS BIGINT) AS DOUBLE)
         |           / sqrt(CAST(p.n2 * c.n2 AS DOUBLE)) AS cosine
         |  FROM pn p JOIN imgs c ON c.bucket = p.bucket
         |  WHERE p.n2 > 0
         |),
         |ranked AS (
         |  SELECT doc_id, media_id, cosine,
         |         ROW_NUMBER() OVER (PARTITION BY doc_id
         |                            ORDER BY cosine DESC, media_id) AS rnk
         |  FROM scored
         |)
         |SELECT doc_id, media_id, rnk, cosine FROM ranked
         |WHERE rnk <= $k ORDER BY doc_id, rnk""".stripMargin
    }) { (s, d) =>
      graft.GraftNative.ensure(s)
      val dim = SimilarityQueries.EmbDim
      val imgs = SimilarityQueries.quantized(s, d)
        .where(col("vec_id") % 3 === 0 && col("n2") > 0)
        .withColumn("bucket", SimilarityQueries.lshBucket(col("q")))
      // the probe embeddings are a WRITTEN stage, not a lazy plan: the
      // hashing-trick tree (64 dims x an interpreted filter over md5'd
      // tokens) must evaluate once per probe — left lazy, scoreAndRank's
      // p_n2 filter makes CollapseProject inline TWO copies of it into a
      // per-joined-row predicate (interpreted, no CSE), which measured
      // 14.8 s vs ~1 s at sf0.1 for five probes
      val probes = graft.operators.Stage.table(
        Tables.documents(s, d)
          .where(col("doc_id") < SimilarityQueries.NumProbes)
          .select(col("doc_id").as("probe_id"),
            transform(split(lower(trim(col("text"))), "\\s+"),
              t => conv(substring(md5(t), 1, 7), 16, 10).cast("long") % dim).as("bks"))
          .select(col("probe_id"),
            transform(sequence(lit(0L), lit(dim - 1L)),
              j => size(filter(col("bks"), b => b === j)).cast("long")).as("p_q"))
          .withColumn("p_n2", graft.GraftNative.longDot(col("p_q"), col("p_q")))
          .withColumn("p_bucket", SimilarityQueries.lshBucket(col("p_q"))),
        "mm05_probes")
      SimilarityQueries.scoreAndRank(
          imgs.join(broadcast(probes), col("bucket") === col("p_bucket")))
        .select(col("probe_id").as("doc_id"), col("neighbor_id").as("media_id"),
          col("rnk"), col("cosine"))
    },

    // Real video decode (mm07): per video-kind doc, the sanitized chars
    // become NFrames frames of FrameW x FrameH grayscale pixels (pixel =
    // the char's ascii value — so a frame's pixel bytes ARE the source
    // substring's bytes), encoded into a REAL uncompressed-DIB AVI
    // container ([[graft.operators.Multimodal.encodeAviGray]] — standard
    // RIFF any player accepts), written as a stage, then DECODED back
    // ([[decodeAviGray]]) for the features: total pixel sum, motion
    // energy (sum of |frame_i - frame_{i-1}| over pixels — the real
    // inter-frame feature a sampler keys on), and the min per-frame md5
    // (computable on both sides because raw DIB is lossless and pixel
    // bytes == source bytes). The oracle recomputes every number from
    // the SOURCE characters — it never sees the container — so the hash
    // certifies the full encode -> container -> decode loop, exactly
    // mm06's WAV discipline. Same mapPartitions batch contract as every
    // media decode (one decoder per partition, streamed rows).
    Q("mm07_video_features", {
      val (w, h, nf) = (VideoW, VideoH, VideoFrames)
      val fpx = w * h
      val need = fpx * nf
      s"""WITH cleaned AS (
         |  SELECT doc_id, regexp_replace(text, '[^ -~]', '', 'g') AS ct
         |  FROM documents WHERE doc_id % 3 = 2
         |),
         |v AS (SELECT doc_id, ct FROM cleaned WHERE len(ct) >= $need),
         |px AS (
         |  SELECT doc_id,
         |         list_transform(generate_series(1, $need),
         |                        i -> ascii(substring(ct, CAST(i AS INTEGER), 1))) AS p,
         |         ct
         |  FROM v
         |)
         |SELECT doc_id,
         |       CAST($nf AS BIGINT) AS n_frames,
         |       CAST($w AS BIGINT) AS width, CAST($h AS BIGINT) AS height,
         |       CAST(list_sum(p) AS BIGINT) AS px_sum,
         |       CAST(list_sum(list_transform(generate_series($fpx + 1, $need),
         |                                    i -> abs(p[i] - p[i - $fpx]))) AS BIGINT) AS motion_sum,
         |       (SELECT MIN(md5(substring(ct, (f - 1) * $fpx + 1, $fpx)))
         |        FROM generate_series(1, $nf) AS g(f)) AS min_frame_md5
         |FROM px ORDER BY doc_id""".stripMargin
    }) { (s, d) =>
      import s.implicits._
      import graft.operators.Multimodal
      val (w, h, nf) = (VideoW, VideoH, VideoFrames)
      val fpx = w * h
      val need = fpx * nf
      val avis = graft.operators.Stage.table(
        Tables.documents(s, d)
          .where(col("doc_id") % 3 === 2)
          .select(col("doc_id"),
            regexp_replace(col("text"), "[^ -~]", "").as("ct"))
          .where(length(col("ct")) >= need)
          .withColumn("px",
            expr(s"transform(sequence(1, $need), i -> ascii(substring(ct, i, 1)))"))
          .select(col("doc_id"), col("px"))
          .as[(Long, Array[Int])]
          .mapPartitions(_.map { case (id, px) =>
            (id, Multimodal.encodeAviGray(px.grouped(fpx).toArray, w, h))
          })
          .toDF("doc_id", "avi"),
        "mm07_avi")
      avis.as[(Long, Array[Byte])]
        .mapPartitions { rows =>
          val md = java.security.MessageDigest.getInstance("MD5")
          rows.map { case (id, avi) =>
            val (frames, fw, fh) = Multimodal.decodeAviGray(avi).getOrElse(
              throw new IllegalStateException(s"undecodable stored AVI for doc $id"))
            var px = 0L; var motion = 0L
            var minMd5 = "￿"
            var f = 0
            while (f < frames.length) {
              val cur = frames(f)
              var j = 0
              while (j < cur.length) {
                px += cur(j)
                if (f > 0) motion += math.abs(cur(j) - frames(f - 1)(j))
                j += 1
              }
              md.reset()
              val hex = md.digest(cur.map(_.toByte)).map("%02x".format(_)).mkString
              if (hex < minMd5) minMd5 = hex
              f += 1
            }
            (id, frames.length.toLong, fw.toLong, fh.toLong, px, motion, minMd5)
          }
        }
        .toDF("doc_id", "n_frames", "width", "height", "px_sum", "motion_sum",
          "min_frame_md5")
        .orderBy("doc_id")
    }
  )
}
