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
    }
  )
}
