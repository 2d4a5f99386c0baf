package graft

import java.nio.file.Files

/** Schema evolution on a long-lived parquet table: files written before a
  * column existed must still read alongside newer files (mergeSchema),
  * with the missing column surfacing as null — the contract an
  * append-only 100 TB corpus depends on when its pipeline adds features.
  */
class SchemaEvolutionSpec extends SparkTestBase {

  test("mergeSchema unions old and new file schemas; old rows null-fill new columns") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_schema").toString + "/docs"
    // v1 files: (doc_id, text)
    Seq((1L, "alpha"), (2L, "beta")).toDF("doc_id", "text")
      .write.parquet(dir)
    // v2 files appended later with a new quality column
    Seq((3L, "gamma", 7), (4L, "delta", 9)).toDF("doc_id", "text", "quality")
      .write.mode("append").parquet(dir)

    val merged = spark.read.option("mergeSchema", "true").parquet(dir)
    assert(merged.columns.sorted.toSeq == Seq("doc_id", "quality", "text"))
    val byId = merged.collect()
      .map(r => r.getLong(0) -> Option(r.getAs[Any]("quality"))).toMap
    assert(byId == Map(1L -> None, 2L -> None, 3L -> Some(7), 4L -> Some(9)))
    // and filters on the evolved column still prune correctly
    assert(merged.where($"quality" >= 8).count() == 1)
  }
}
