package graft

/** Results must be a pure function of the DATA, never of its physical
  * partitioning — the property that separates "works on local[4]" from
  * "works on 1000 executors", where partition counts, input splits and
  * shuffle layouts all differ. One representative query per family runs
  * under two very different shuffle-partition settings; the canonical
  * (sorted) results must be identical. Violations here are the classic
  * cluster-only bugs: first()/any_value() picks, partition-order
  * dependent ids, float accumulation order.
  */
class PartitionInvarianceSpec extends SparkTestBase {

  private val sfDir = "/root/testdata/sf0.001"

  // one per family, favoring queries with floats, windows, iterative
  // stages, and partial top-k reductions
  private val sample = Seq(
    "q01_pricing_summary",    // decimal-summed floats
    "q17_band_join",          // exploded bucket equi-join
    "m02_route_audit",        // shared staged pipeline + audit formatting
    "d02_minhash_lsh",        // staged self-join + native signatures
    "d12_ensemble_clusters",  // iterative min-label propagation
    "v01_knn_brute",          // partial top-k heaps + ranking window
    "t06_repetition",         // per-doc token aggregates
    "e03_sessionize",         // gap windows + running session ids
    "e04_funnel",             // ordered step matching over event times
    "e05_asof_join",          // as-of backward join on event time
    "d13_chunk_dedup",        // staged chunk hash + df join-back
    "t11_skipgram_pairs",     // tie-broken top-k limit over pair counts
    "e10_event_paths",        // ordered collect_list (the nondeterminism trap)
    "d16_semantic_prune",     // components + centroid agg + keep window
    "t12_lm_quality",         // staged bigram table + broadcast LM join
    "mm04_image_neardup")     // aHash banding self-join + hamming verify

  private def canonical(name: String): Seq[String] = {
    val df = SparkEntry.queries(name)(spark, sfDir)
    df.collect().map(_.toString).sorted.toSeq
  }

  sample.foreach { name =>
    test(s"$name is invariant to shuffle-partition count") {
      val conf = spark.conf
      val before = conf.get("spark.sql.shuffle.partitions")
      try {
        conf.set("spark.sql.shuffle.partitions", "2")
        graft.operators.Stage.resetShared() // stages rebuilt at 2 partitions
        val narrow = canonical(name)
        conf.set("spark.sql.shuffle.partitions", "17")
        graft.operators.Stage.resetShared()
        val wide = canonical(name)
        assert(narrow == wide,
          s"$name differs between 2 and 17 shuffle partitions " +
            s"(${narrow.size} vs ${wide.size} rows)")
        assert(narrow.nonEmpty, s"$name returned no rows — vacuous invariance")
      } finally {
        conf.set("spark.sql.shuffle.partitions", before)
        graft.operators.Stage.resetShared()
      }
    }
  }
}
