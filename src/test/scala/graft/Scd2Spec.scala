package graft

/** m10 SCD2 interval semantics beyond the oracle hash: chained intervals,
  * exactly one open (current) row per key, multi-version keys covered.
  */
class Scd2Spec extends SparkTestBase {

  private val sfDir = "/root/testdata/sf0.001"

  private lazy val hist: Map[Long, Seq[(Long, Option[Long], String, Boolean)]] =
    SparkEntry.queries("m10_scd2_history")(spark, sfDir).collect()
      .map(r => (r.getLong(0), (r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)),
        r.getString(3), r.getBoolean(4))))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSeq.sortBy(_._1)).toMap

  test("every key has exactly one current row and it is the last interval") {
    hist.foreach { case (id, rows) =>
      assert(rows.count(_._4) == 1, s"id $id: expected one current row, got $rows")
      assert(rows.last._4 && rows.last._2.isEmpty,
        s"id $id: current row must be the open-ended last interval")
    }
  }

  test("intervals chain: each valid_to equals the next valid_from") {
    hist.foreach { case (id, rows) =>
      rows.sliding(2).foreach {
        case Seq(a, b) =>
          assert(a._2.contains(b._1), s"id $id: gap or overlap between $a and $b")
        case _ =>
      }
    }
  }

  test("a %105 key carries the full 4-version history in order") {
    val full = hist.filter { case (id, _) => id % 105 == 0 }
    assert(full.nonEmpty, "no id divisible by 3*5*7 at this sf — fixture vacuous")
    full.foreach { case (id, rows) =>
      assert(rows.map(_._1) == Seq(0L, 1L, 2L, 3L), s"id $id: versions ${rows.map(_._1)}")
      assert(rows.map(_._3) == Seq(s"/old/$id", s"/v1/$id", s"/v2/$id", s"/v3/$id"))
    }
  }
}
