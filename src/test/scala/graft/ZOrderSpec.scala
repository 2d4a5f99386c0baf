package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.operators.ZOrder

/** Z-order layout: per-file min/max must be narrow in BOTH clustered
  * dimensions (that is the whole point — a file-skipping index for two
  * columns at once), where a single-column sort leaves the trailing
  * dimension's per-file range spanning the full domain.
  */
class ZOrderSpec extends SparkTestBase {

  private val sfDir = "/root/testdata/sf0.001"
  private val NumFiles = 8

  test("zvalue interleaves bits (known points) and is codegen-composable") {
    // (a=0b11, b=0b00) -> even positions set: 0b0101; (a=0, b=0b11) -> odd: 0b1010
    val r = sel(
      ZOrder.zvalue(lit(3L), lit(0L), 2),
      ZOrder.zvalue(lit(0L), lit(3L), 2),
      ZOrder.zvalue(lit(3L), lit(3L), 2))
    assert(r.getLong(0) == 5L && r.getLong(1) == 10L && r.getLong(2) == 15L)
    // locality: adjacent (a,b) cells share high bits => close z-values
    val z1 = sel(ZOrder.zvalue(lit(10L), lit(20L))).getLong(0)
    val z2 = sel(ZOrder.zvalue(lit(11L), lit(20L))).getLong(0)
    assert(math.abs(z1 - z2) < 4)
  }

  test("z-clustered files have narrow min/max in both dims; sorted layout only in one") {
    val li = Tables.lineitem(spark, sfDir).select("l_partkey", "l_suppkey")
    val zDir = Files.createTempDirectory("graft_zorder").toString + "/z"
    val sDir = Files.createTempDirectory("graft_zorder").toString + "/s"
    ZOrder.writeClustered(li, "l_partkey", "l_suppkey", NumFiles, zDir)
    li.repartitionByRange(NumFiles, col("l_partkey"))
      .sortWithinPartitions("l_partkey")
      .write.mode("overwrite").parquet(sDir)

    def fileRanges(dir: String): Seq[(Long, Long, Long, Long)] =
      spark.read.parquet(dir)
        .groupBy(input_file_name())
        .agg(min("l_partkey"), max("l_partkey"), min("l_suppkey"), max("l_suppkey"))
        .collect()
        .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
        .toSeq

    val (pLo, pHi, sLo, sHi) = {
      val r = li.agg(min("l_partkey"), max("l_partkey"),
        min("l_suppkey"), max("l_suppkey")).head()
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    }
    val pSpan = (pHi - pLo).toDouble
    val sSpan = (sHi - sLo).toDouble

    def avgFrac(rs: Seq[(Long, Long, Long, Long)], suppkey: Boolean): Double =
      rs.map { case (pa, pb, sa, sb) =>
        if (suppkey) (sb - sa) / sSpan else (pb - pa) / pSpan
      }.sum / rs.size

    val z = fileRanges(zDir)
    val s = fileRanges(sDir)
    assert(z.size == NumFiles && s.size == NumFiles)

    // single-column layout: partkey ranges are tight but suppkey spans
    // ~the full domain in every file (no skipping possible on suppkey)
    assert(avgFrac(s, suppkey = false) < 0.2,
      s"sorted layout partkey frac ${avgFrac(s, suppkey = false)}")
    assert(avgFrac(s, suppkey = true) > 0.8,
      s"sorted layout suppkey frac ${avgFrac(s, suppkey = true)}")
    // z-order: BOTH dims materially narrower than the full span per file
    assert(avgFrac(z, suppkey = false) < 0.7,
      s"z layout partkey frac ${avgFrac(z, suppkey = false)}")
    assert(avgFrac(z, suppkey = true) < 0.7,
      s"z layout suppkey frac ${avgFrac(z, suppkey = true)}")

    // skipping: a narrow suppkey predicate must intersect fewer z files
    val probeLo = sLo + (sHi - sLo) / 2
    val probeHi = probeLo // single-point probe
    def touched(rs: Seq[(Long, Long, Long, Long)]): Int =
      rs.count { case (_, _, sa, sb) => sa <= probeHi && sb >= probeLo }
    assert(touched(z) < touched(s),
      s"z files touched ${touched(z)} !< sorted ${touched(s)}")

    // layout changes bytes, not rows: same multiset of (partkey, suppkey)
    assert(spark.read.parquet(zDir).count() == li.count())
  }
}
