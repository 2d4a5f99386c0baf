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
    }
  )
}
