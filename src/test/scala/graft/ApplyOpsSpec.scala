package graft

import java.nio.file.Files
import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.queries.DedupQueries

/** d21 substring-apply and e12 attribution semantics beyond the oracle
  * hash: ownership keeps exactly one copy, coverage conserves tokens,
  * and attribution weights land on the U-shape exactly.
  */
class ApplyOpsSpec extends SparkTestBase {

  private val sfDir = "/root/testdata/sf0.001"
  private val L = DedupQueries.SubstrMinTokens

  private lazy val apply21: Map[Long, (Long, Long, Long)] =
    SparkEntry.queries("d21_substring_apply")(spark, sfDir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap

  test("d21: tokens conserve and drops never exceed the doc") {
    assert(apply21.nonEmpty)
    apply21.foreach { case (id, (n, dropped, retained)) =>
      assert(dropped + retained == n, s"doc $id: $dropped + $retained != $n")
      assert(dropped >= 0 && retained >= 0, s"doc $id: negative ledger")
    }
  }

  test("d21: copies drop fully, their originals keep everything") {
    val copies = apply21.keys.filter(id =>
      id >= DedupQueries.BatchIdOffset && id < DedupQueries.SubstrIdOffset)
    val checked = copies.filter(id => apply21(id)._1 >= L)
    assert(checked.nonEmpty, "no full-copy fixture doc with >= L tokens — vacuous")
    checked.foreach { id =>
      val (n, dropped, retained) = apply21(id)
      assert(dropped == n && retained == 0,
        s"copy $id must drop entirely (its owner has a lower id): ${apply21(id)}")
    }
    // originals keep everything UNLESS the base corpus itself injected a
    // lower-id twin (the driver's %50-style dup fixtures), so assert the
    // common case exists rather than universally
    val cleanOwners = checked.map(_ - DedupQueries.BatchIdOffset)
      .filter(orig => apply21(orig)._2 == 0)
    assert(cleanOwners.nonEmpty,
      "no original kept all tokens — ownership looks inverted")
  }

  test("d21: chimeras drop fully — foreign windows COVER the junction") {
    // d17 reports the junction as a span BREAK (no duplicated window
    // STARTS there), but token-level coverage is a different statement:
    // the last foreign window of part A and the first of part B overlap
    // every junction token, so a two-sourced chimera has no uncovered
    // token — the union semantics d21 implements (and the distinction
    // between "duplicated-run starts" and "covered tokens" this pair of
    // queries exists to make)
    val chimeras = apply21.keys.filter(_ >= DedupQueries.SubstrIdOffset)
      .filter { c =>
        val a = c - DedupQueries.SubstrIdOffset
        Seq(a, a + 10).forall(d => apply21.get(d).exists(t =>
          math.min(t._1, DedupQueries.SubstrPrefixTokens) >= L))
      }
    assert(chimeras.nonEmpty, "no chimera with two >= L parts — vacuous")
    chimeras.foreach { c =>
      val (n, dropped, retained) = apply21(c)
      assert(dropped == n && retained == 0,
        s"chimera $c: every token sits under an owned window: ${apply21(c)}")
    }
  }

  test("d21: partially-overlapping docs drop partially (union, not all-or-nothing)") {
    // sf0.001's corpus-injected near-dups differ in a suffix, so some doc
    // must drop a strict, nonzero prefix of its tokens
    val partial = apply21.values.filter(t => t._2 > 0 && t._2 < t._1)
    assert(partial.nonEmpty,
      s"no partial drop found — coverage union never exercised below doc level")
  }

  test("e12: exact U-shape weights on a synthetic touch sequence") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-attrib").toString
    def ts(m: Int) = Timestamp.valueOf(f"2024-01-10 10:$m%02d:00")
    // user 1: click,view,click -> purchase (k=3: 40/20/40)
    // user 2: view -> purchase (solo: 100)
    // user 3: click,view -> purchase (k=2: 50/50)
    // user 4: purchase with no prior touch (no pair rows at all)
    val rows = Seq(
      (1L, ts(1), 1L, "click"), (2L, ts(2), 1L, "view"), (3L, ts(3), 1L, "click"),
      (4L, ts(4), 1L, "purchase"),
      (5L, ts(1), 2L, "view"), (6L, ts(2), 2L, "purchase"),
      (7L, ts(1), 3L, "click"), (8L, ts(2), 3L, "view"), (9L, ts(3), 3L, "purchase"),
      (10L, ts(5), 4L, "purchase"))
    rows.toDF("event_id", "ts", "user_id", "event_type")
      .withColumn("value", lit(1.0)).withColumn("props", lit("{}"))
      .write.parquet(s"$dir/events.parquet")
    val got = SparkEntry.queries("e12_attribution")(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1)) -> ((r.getLong(2), r.getLong(3)))).toMap
    val expected = Map(
      ("click", "first") -> ((2L, 900000L)), // u1 first 400k + u3 k=2 first 500k
      ("click", "last") -> ((1L, 400000L)),  // u1 last
      ("view", "middle") -> ((1L, 200000L)), // u1 middle
      ("view", "last") -> ((1L, 500000L)),   // u3 k=2 last
      ("view", "solo") -> ((1L, 1000000L)))  // u2
    assert(got == expected, s"got $got")
  }

  test("e12: sf0.001 credit conserves per class structure") {
    val rows = SparkEntry.queries("e12_attribution")(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty, "no attributions at sf0.001 — fixture vacuous")
    rows.foreach { case (tt, pc, n, credit) =>
      assert(Set("first", "middle", "last", "solo")(pc), s"bad class $pc")
      val (lo, hi) = pc match {
        case "solo"   => (1000000L, 1000000L)
        case "middle" => (1L, 200000L) // floor-divided middle share
        case _        => (400000L, 500000L) // first/last: 400k, or 500k when k=2
      }
      assert(credit >= n * lo && credit <= n * hi,
        s"($tt,$pc): credit $credit outside [$n*$lo, $n*$hi]")
    }
  }

  test("e13: z-score catches a low-variance drift the 2x mean-ratio misses") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-zscore").toString
    def hts(h: Int) = Timestamp.valueOf(
      java.time.LocalDateTime.of(2024, 1, 10, 0, 30).plusHours(h.toLong))
    // 24 hours alternating 40/41 events (mean 40.5, sigma 0.5), then a
    // 25th hour of 50: z = 19 >> 2, but 50 < 2 * 40.5 so e11's
    // mean-ratio rule would NOT flag it
    var id = 0L
    val rows = (0 until 25).flatMap { h =>
      val n = if (h == 24) 50 else 40 + (h % 2)
      (0 until n).map { _ => id += 1; (id, hts(h), id % 7, "view") }
    }
    rows.toDF("event_id", "ts", "user_id", "event_type")
      .withColumn("value", lit(1.0)).withColumn("props", lit("{}"))
      .write.parquet(s"$dir/events.parquet")
    val got = SparkEntry.queries("e13_zscore_anomaly")(spark, dir).collect()
      .map(r => (r.getTimestamp(0), r.getLong(2), r.getBoolean(5)))
    assert(got.length == 25)
    val driftHour = Timestamp.valueOf(
      java.time.LocalDateTime.of(2024, 1, 10, 0, 0).plusHours(24L))
    val (flagged, rest) = got.partition(_._3)
    assert(flagged.map(t => (t._1, t._2)).toSeq == Seq((driftHour, 50L)),
      s"exactly the drift hour must flag: got ${flagged.toSeq}")
    // and the drift is invisible to the mean-ratio rule
    val prevSum = (0 until 24).map(h => 40L + (h % 2)).sum
    assert(50L * 24 <= 2 * prevSum, "fixture broken: mean-ratio would also fire")
    assert(rest.forall(!_._3))
  }

  test("e13: both outcomes occur on the corpus and no-history never flags") {
    val rows = SparkEntry.queries("e13_zscore_anomaly")(spark, sfDir).collect()
      .map(r => (r.getTimestamp(0), r.getLong(3), r.getBoolean(5)))
    assert(rows.exists(_._3) && rows.exists(!_._3), "anomaly rule vacuous at sf0.001")
    val firstHours = rows.map(_._1).distinct.sorted((a: Timestamp, b: Timestamp) =>
      a.compareTo(b)).take(24).toSet
    assert(rows.filter(r => firstHours(r._1)).forall(!_._3),
      "a cell without 24h of history flagged")
  }

  test("e14: exact 30-min gap still merges (touching windows overlap), 30:01 splits") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-sesswin").toString
    def us(sec: Long) = new Timestamp(1704880800000L + sec * 1000)
    // user 1: gap of exactly 30 min -> the windows TOUCH and the native
    // operator merges them (same `diff > gap` split rule as e03);
    // user 2: 30 min plus 1 s -> splits into two sessions
    val rows = Seq(
      (1L, us(0), 1L, "view"), (2L, us(1800), 1L, "view"),
      (3L, us(0), 2L, "view"), (4L, us(1801), 2L, "view"))
    rows.toDF("event_id", "ts", "user_id", "event_type")
      .withColumn("value", lit(1.0)).withColumn("props", lit("{}"))
      .write.parquet(s"$dir/events.parquet")
    val got = SparkEntry.queries("e14_session_window")(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(3))
    assert(got.filter(_._1 == 1L).toSeq == Seq(1L -> 2L),
      s"exact gap must merge: ${got.toSeq}")
    assert(got.count(_._1 == 2L) == 2, s"gap past 30 min must split: ${got.toSeq}")
  }

  test("e14 agrees with e03's composition on the corpus") {
    val byWindow = SparkEntry.queries("e14_session_window")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(3)))
    val byComposition = SparkEntry.queries("e03_sessionize")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(2)))
    // same multiset of (user, session event-count): both paths implement
    // the same diff > gap split rule (incl. the exact-gap merge)
    assert(byWindow.groupBy(identity).view.mapValues(_.length).toMap ==
      byComposition.groupBy(identity).view.mapValues(_.length).toMap,
      "native session_window and the lag/flag composition disagree")
  }

  test("e15: trailing-24h range frame slides, inclusive at the exact bound") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-range").toString
    def hts(h: Int) = new Timestamp(1704880800000L + h * 3600000L)
    // user 1: 0h, 12h, 23h, 25h -> trailing counts 1,2,3,3 (0h falls out
    // of the 25h frame); user 2: 0h and exactly 24h -> the RANGE lower
    // bound is INCLUSIVE, so the 24h event still sees both
    val rows = Seq(
      (1L, hts(0), 1L), (2L, hts(12), 1L), (3L, hts(23), 1L), (4L, hts(25), 1L),
      (5L, hts(0), 2L), (6L, hts(24), 2L))
    rows.toDF("event_id", "ts", "user_id")
      .withColumn("event_type", lit("view"))
      .withColumn("value", lit(2.0)).withColumn("props", lit("{}"))
      .write.parquet(s"$dir/events.parquet")
    val got = SparkEntry.queries("e15_trailing_range")(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(3), r.getDouble(4)))).toMap
    assert(got(1L) == ((1L, 2.0)) && got(2L) == ((2L, 4.0)) &&
      got(3L) == ((3L, 6.0)), s"ramp wrong: $got")
    assert(got(4L) == ((3L, 6.0)), s"0h event must fall out of the 25h frame: $got")
    assert(got(6L) == ((2L, 4.0)), s"exact-24h bound must be inclusive: $got")
  }

  test("d27: copies and their originals zero out, unique content scores") {
    val nov = SparkEntry.queries("d27_shingle_novelty")(spark, sfDir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(nov.nonEmpty)
    val copies = nov.keys.filter(_ >= DedupQueries.BatchIdOffset)
    assert(copies.nonEmpty, "no injected copies in the fixture")
    copies.foreach { id =>
      assert(nov(id)._3 == 0L, s"copy $id has novelty ${nov(id)} — df counting broken")
      val orig = id - DedupQueries.BatchIdOffset
      assert(nov(orig)._3 == 0L,
        s"original $orig of copy $id has novelty ${nov(orig)} — its shingles have df >= 2")
      assert(nov(orig)._1 == nov(id)._1, s"copy $id shingle count differs from original")
    }
    assert(nov.exists(_._2._3 > 500000L),
      "no doc above 50% novelty — the metric never separates unique content")
    nov.values.foreach { case (n, u, ppm) =>
      assert(u <= n && ppm == u * 1000000L / n, s"ledger arithmetic broken: ($n,$u,$ppm)")
    }
  }

  // d25: the quality-retention keeper choice. Output rows are
  // (component, keeper, keeper_q, n_members).
  private lazy val d25: Seq[(Long, Long, Long, Long)] =
    SparkEntry.queries("d25_quality_retention")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq

  test("d25: quality beats min-id somewhere — the decision is non-vacuous") {
    assert(d25.nonEmpty, "no near-dup components at sf0.001")
    val flipped = d25.filter { case (comp, keeper, _, _) => keeper != comp }
    assert(flipped.nonEmpty,
      "every keeper is the min-id member — quality never changed a decision " +
        "and d25 degenerates to d09")
    assert(flipped.exists(_._2 >= DedupQueries.QualityDupOffset),
      "no improved variant ever won its component — fixture vacuous")
  }

  test("d25: an improved keeper strictly outranks its stop-free original") {
    import org.apache.spark.sql.functions._
    GraftNative.ensure(spark)
    val q10 = graft.functions.TextFns.qualityScore10From(
      GraftNative.textStats(col("text")), col("text"))
    val baseQ = Tables.documents(spark, sfDir)
      .select(col("doc_id"), q10.as("q")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val improvedKeepers = d25.filter(_._2 >= DedupQueries.QualityDupOffset)
    assert(improvedKeepers.nonEmpty)
    improvedKeepers.foreach { case (comp, keeper, kq, _) =>
      val orig = keeper - DedupQueries.QualityDupOffset
      assert(kq > baseQ(orig),
        s"component $comp: improved keeper $keeper q=$kq does not beat " +
          s"its original $orig q=${baseQ(orig)} — argmax tie-break would " +
          "have picked the lower id")
    }
  }
}
