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
}
