package graft

import org.apache.spark.sql.functions._
import graft.functions.VectorFns._

class VectorFnsSpec extends SparkTestBase {

  private def one(c: org.apache.spark.sql.Column): Any = sel(c).get(0)
  private def arr(xs: Double*) = array(xs.map(x => lit(x.toFloat)): _*)

  test("dot / norm / cosine on known vectors") {
    assert(one(dot(arr(1, 2, 3), arr(4, 5, 6))) == 32.0)
    assert(one(norm(arr(3, 4))) == 5.0)
    assert(one(cosine(arr(1, 0), arr(1, 0))) == 1.0)
    assert(one(cosine(arr(1, 0), arr(0, 1))) == 0.0)
    assert(one(cosine(arr(0, 0), arr(1, 1))) == 0.0) // zero-vector guard
  }

  test("quantize floors at 3 decimals") {
    assert(one(quantize(arr(0.0549, -0.2525))).asInstanceOf[scala.collection.Seq[Long]]
      == Seq(54L, -253L)) // floor, not round
  }

  test("qdot / qnorm2 / qcosine are exact integer math") {
    val qa = array(lit(3L), lit(4L))
    val qb = array(lit(4L), lit(3L))
    assert(one(qdot(qa, qb)) == 24L)
    assert(one(qnorm2(qa)) == 25L)
    assert(one(qcosine(qa, qa)) == 1.0)
    val z = array(lit(0L), lit(0L))
    assert(one(qcosine(z, qa)) == 0.0)
  }
}
