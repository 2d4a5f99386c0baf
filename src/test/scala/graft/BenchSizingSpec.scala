package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite

/** Pins [[Bench.autoShufflePartitions]]'s smooth data-driven sizing:
  * the count scales with bytes in whole `cpus` waves and has NO cliff
  * at the old power-of-two boundaries (a 191 vs 198 MiB sf1 dir landed
  * on 32 vs 64 partitions under the old rounding and cost d06 ~2x).
  */
class BenchSizingSpec extends AnyFunSuite {

  private def dirOfBytes(n: Long): String = {
    val d = Files.createTempDirectory("bench-sizing-").toFile
    d.deleteOnExit()
    val f = new java.io.File(d, "blob")
    f.deleteOnExit()
    val out = new java.io.RandomAccessFile(f, "rw")
    try out.setLength(n) finally out.close()
    d.toString
  }

  test("floors at the cpu count for small inputs") {
    assert(Bench.autoShufflePartitions(dirOfBytes(17L << 20), 32) === 32)
    assert(Bench.autoShufflePartitions(dirOfBytes(0L), 32) === 32)
  }

  test("no halving cliff around the 64-slab boundary") {
    // old rounding: 191 MiB (63 slabs) -> 32, 198 MiB (66 slabs) -> 64 —
    // a 2x parallelism swing on a 4% byte difference. New rounding: one
    // wave step at most (64 -> 96), and never BELOW the slab count.
    val at191 = Bench.autoShufflePartitions(dirOfBytes(191L << 20), 32)
    val at198 = Bench.autoShufflePartitions(dirOfBytes(198L << 20), 32)
    assert(at191 === 64)
    assert(at198 === 96)
    assert(at198 <= at191 * 3 / 2) // steps stay proportional, not 2x
  }

  test("rounds up to whole waves and keeps scaling with bytes") {
    // 597 MiB = 199 slabs -> 7 waves of 32
    assert(Bench.autoShufflePartitions(dirOfBytes(597L << 20), 32) === 224)
    // monotone in bytes
    val a = Bench.autoShufflePartitions(dirOfBytes(300L << 20), 32)
    val b = Bench.autoShufflePartitions(dirOfBytes(900L << 20), 32)
    assert(a <= b)
  }

  test("caps at 16384 slabs") {
    // cap applies to slab count before wave rounding; with cpus=32 the
    // result never exceeds ceil(16384/32)*32 = 16384
    assert(Bench.autoShufflePartitions(dirOfBytes(1L << 40), 32) === 16384)
  }
}
