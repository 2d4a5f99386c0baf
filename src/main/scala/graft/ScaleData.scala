package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale-smoke data builder: replicates a driver-generated `documents`
  * table N-fold so the dedup family can be exercised above the largest
  * generated scale factor (the quadratic guards — df caps, band indexes —
  * are argued in the plans but need a recorded run at 10x rows).
  *
  * The replication is duplication-neutral: replica 0 is the original
  * table byte-for-byte; every replica r > 0 suffixes each whitespace
  * token with `~r`, which [[graft.functions.DedupFns.normText]] preserves
  * (it only lowercases and collapses whitespace). So within a replica the
  * shingle-set relationships — and therefore the near-dup pair structure —
  * are EXACTLY the original's, while across replicas shingles are
  * disjoint (no token survives with two different suffixes). Pair counts,
  * band-bucket sizes and df caps should all scale ~linearly with N; any
  * super-linear growth in the smoke is an engine defect, not a data
  * artifact. Doc ids re-key to `doc_id + r * (max_id + 1)`, keeping them
  * dense and (at N=10 over sf0.1) below the d14 `BatchIdOffset` guard.
  *
  * Usage: `runMain graft.ScaleData <srcSfDir> <outDir> <factor>`
  */
object ScaleData {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: ScaleData <srcSfDir> <outDir> <factor>")
    val Array(srcDir, outDir, factorStr) = args.take(3)
    val factor = factorStr.toInt
    require(factor >= 1, s"factor must be >= 1, got $factor")

    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_GRAFT_MASTER", "local[32]"))
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = spark.read.parquet(s"$srcDir/documents.parquet")
    val step = docs.agg(max("doc_id")).head().getLong(0) + 1
    val reps = spark.range(0, factor).select(col("id").as("rep"))
    val scaledText = when(col("rep") === 0, col("text")).otherwise(
      regexp_replace(col("text"), lit("(\\S+)"),
        concat(lit("$1~"), col("rep").cast("string"))))
    val scaled = docs.crossJoin(reps).select(
      (col("doc_id") + col("rep") * lit(step)).as("doc_id"),
      scaledText.as("text"),
      col("lang"), col("source"),
      length(scaledText).cast("long").as("n_chars"))

    scaled.repartition(32).write.mode("overwrite")
      .parquet(s"$outDir/documents.parquet")
    val n = spark.read.parquet(s"$outDir/documents.parquet").count()
    println(s"[scaledata] wrote $n docs ($factor x $step) to $outDir")
    spark.stop()
  }
}
