package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Per-vertex triangle statistics over a simple undirected graph given as
  * an (a < b)-oriented edge list — the closure half of the dup-graph
  * diagnostics ([[PageRank]] is the centrality half).
  *
  * Ordered enumeration: a triangle a<b<c is found exactly once by
  * joining the oriented edge list twice (e1=(a,b), e2=(b,c), e3=(a,c)),
  * so no triangle is double-counted and no symmetrized blow-up is
  * needed. Cost is Σ_edges deg — linear in edges for bounded-degree
  * graphs, which the LSH-banded dup graph is by construction. All three
  * joins key on vertex ids (equi-joins, hash-partitionable); the local
  * clustering coefficient 2T/deg(deg−1) is emitted as exact integer ppm
  * (one floor DIV) so cross-engine hashes match.
  */
object GraphOps {

  /** Columns: (id, degree, n_triangles, clustering_ppm), one row per
    * vertex that appears in the edge list. Requires a < b on every edge
    * and no duplicate edges (the verified-pair stages guarantee both).
    */
  def triangleStats(edges: DataFrame, aCol: String, bCol: String,
      idName: String = "doc_id"): DataFrame = {
    val e = edges.select(col(aCol).as("a"), col(bCol).as("b"))
    val tri = e.as("e1")
      .join(e.as("e2"), col("e2.a") === col("e1.b"))
      .join(e.as("e3"), col("e3.a") === col("e1.a") && col("e3.b") === col("e2.b"))
      .select(col("e1.a").as("x"), col("e1.b").as("y"), col("e2.b").as("z"))
    val tcnt = tri.select(col("x").as(idName))
      .unionByName(tri.select(col("y").as(idName)))
      .unionByName(tri.select(col("z").as(idName)))
      .groupBy(idName).agg(count(lit(1)).as("n_triangles"))
    val degs = e.select(col("a").as(idName))
      .unionByName(e.select(col("b").as(idName)))
      .groupBy(idName).agg(count(lit(1)).as("degree"))
    degs.join(tcnt, Seq(idName), "left")
      .withColumn("n_triangles", coalesce(col("n_triangles"), lit(0L)))
      .select(col(idName), col("degree"), col("n_triangles"),
        when(col("degree") >= 2,
          expr("n_triangles * 2000000 DIV (degree * (degree - 1))"))
          .otherwise(lit(0L)).as("clustering_ppm"))
  }
}
