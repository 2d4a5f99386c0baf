package graft

import org.apache.spark.sql.functions._
import graft.operators.KMeansIvf

/** Lloyd k-means over quantized vectors: three well-separated synthetic
  * blobs must be recovered exactly, deterministically.
  */
class KMeansIvfSpec extends SparkTestBase {

  // 3 blobs in 4-d quantized space, 20 points each, tight around distant
  // centers; ids interleave blobs so init picks one seed per region only
  // after iterating
  private def blobs() = {
    import spark.implicits._
    val centers = Seq(Seq(0L, 0L, 0L, 0L), Seq(1000L, 1000L, 0L, 0L),
      Seq(0L, 0L, 1000L, 1000L))
    val rows = for {
      i <- 0 until 60
      c = centers(i % 3)
    } yield (i.toLong, c.zipWithIndex.map { case (x, j) => x + (i / 3 + j) % 7 })
    rows.toDF("vec_id", "q")
      .withColumn("n2", graft.GraftNative.longDot(col("q"), col("q")))
  }

  test("recovers three separated blobs; assignment is deterministic") {
    GraftNative.ensure(spark)
    val qv = blobs()
    val centroids = KMeansIvf.fit(qv, k = 3, iters = 5)
    assert(centroids.count() == 3)
    val cells = KMeansIvf.cells(qv, centroids).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    // every member of a blob lands in the same cell, blobs in different cells
    val byBlob = (0 until 3).map(b => (0 until 60).filter(_ % 3 == b).map(i => cells(i.toLong)))
    byBlob.foreach(cs => assert(cs.distinct.size == 1, s"blob split across cells: $cs"))
    assert(byBlob.map(_.head).distinct.size == 3, "blobs merged")
    // deterministic on re-run
    val again = KMeansIvf.cells(qv, KMeansIvf.fit(qv, 3, 5)).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(again == cells)
  }

  test("centroid numerators are exact integer sums of their members") {
    GraftNative.ensure(spark)
    val qv = blobs()
    val centroids = KMeansIvf.fit(qv, k = 3, iters = 5)
    val cells = KMeansIvf.cells(qv, centroids)
    val recomputed = qv.join(cells, "vec_id").groupBy("cell")
      .agg(graft.functions.VecSumAgg.vecSum(col("q")).as("sq2"), count(lit(1)).as("cnt2"))
    val joined = centroids.join(recomputed, "cell").collect()
    assert(joined.length == 3)
    joined.foreach { r =>
      assert(r.getSeq[Long](r.fieldIndex("sq")) == r.getSeq[Long](r.fieldIndex("sq2")))
      assert(r.getLong(r.fieldIndex("cnt")) == r.getLong(r.fieldIndex("cnt2")))
    }
  }
}
