package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.CurationStreams
import graft.streaming.CurationStreams.SrcDoc
import graft.queries.DedupQueries

/** Streaming curation parity: the copy-injected corpus replayed in two
  * micro-batches (originals, then copies) yields exactly batch p01's
  * per-source survivor ledger — and the late-arriving copies are dropped
  * by state, not by luck of the batch boundary.
  */
class CurationStreamsSpec extends SparkTestBase {

  private val sfDir = "/root/testdata/sf0.001"

  test("two-batch replay reproduces p01's survivor ledger per source") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val raw = Tables.documents(spark, sfDir)
      .select("doc_id", "source", "text").as[SrcDoc].collect().toSeq
    val copies = raw.filter(_.doc_id % 10 == 0)
      .map(d => d.copy(doc_id = d.doc_id + DedupQueries.BatchIdOffset))
    assert(copies.nonEmpty)

    val got = scala.collection.mutable.ArrayBuffer.empty[(Long, String, Long)]
    // transformWithState needs the RocksDB state store provider
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val ms = MemoryStream[SrcDoc]
      val q = CurationStreams.curationSurvivors(spark, ms.toDS())
        .writeStream.outputMode("append")
        .foreachBatch { (df: org.apache.spark.sql.Dataset[CurationStreams.Kept], _: Long) =>
          got ++= df.collect().map(k => (k.doc_id, k.source, k.ws_tokens))
          ()
        }.start()
      try {
        ms.addData(raw); q.processAllAvailable()
        val afterOriginals = got.size
        ms.addData(copies); q.processAllAvailable()
        // every copy's fingerprint is already owned by its original: the
        // second batch must add NOTHING
        assert(got.size == afterOriginals,
          s"late copies leaked through the dedup state: ${got.size} vs $afterOriginals")
      } finally q.stop()
    } finally {
      prev.fold(spark.conf.unset(providerKey))(spark.conf.set(providerKey, _))
    }

    val streamed = got.groupBy(_._2).view
      .mapValues(ks => (ks.size.toLong, ks.map(_._3).sum)).toMap
    val p01 = SparkEntry.queries("p01_curation_pipeline")(spark, sfDir).collect()
      .map(r => r.getString(0) -> ((r.getLong(3), r.getLong(5)))).toMap
    p01.foreach { case (src, (nUnique, sumToks)) =>
      assert(streamed.getOrElse(src, (0L, 0L)) == ((nUnique, sumToks)),
        s"$src: streamed ${streamed.get(src)} != batch ($nUnique, $sumToks)")
    }
  }

  test("streaming admission reproduces batch p02's admitted ledger") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val off = DedupQueries.BatchIdOffset

    val raw = Tables.documents(spark, sfDir)
      .select("doc_id", "source", "text").as[SrcDoc].collect().toSeq
    // p02's ingest arms: exact copies of every 10th doc, plus two copies
    // of a 'fresh snapshot v2' variant of every 15th doc
    val corpusCopies = raw.filter(_.doc_id % 10 == 0)
      .map(d => d.copy(doc_id = d.doc_id + off))
    val v2a = raw.filter(_.doc_id % 15 == 0)
      .map(d => d.copy(doc_id = d.doc_id + 2 * off, text = d.text + " fresh snapshot v2"))
    val v2b = raw.filter(_.doc_id % 15 == 0)
      .map(d => d.copy(doc_id = d.doc_id + 3 * off, text = d.text + " fresh snapshot v2"))
    assert(corpusCopies.nonEmpty && v2a.nonEmpty)

    // the already-curated corpus's fingerprint index, built ONCE with the
    // batch pipeline's own stages (gate on raw text, scrub, fingerprint)
    val corpusFp = CurationStreams
      .gateAndScrub(spark, Tables.documents(spark, sfDir)
        .select("doc_id", "source", "text").as[SrcDoc])
      .select(graft.functions.TextFns.fingerprint(col("rtext")).as("fp"))
      .distinct().cache()

    val got = scala.collection.mutable.ArrayBuffer.empty[(Long, String, Long)]
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val ms = MemoryStream[SrcDoc]
      val q = CurationStreams.admittedDocs(spark, ms.toDS(), corpusFp)
        .writeStream.outputMode("append")
        .foreachBatch { (df: org.apache.spark.sql.Dataset[CurationStreams.Kept], _: Long) =>
          got ++= df.collect().map(k => (k.doc_id, k.source, k.ws_tokens))
          ()
        }.start()
      try {
        // batch 1: corpus copies + first v2 copies. Corpus copies must
        // ALL bounce off the static index; gated v2 variants admit.
        ms.addData(corpusCopies ++ v2a); q.processAllAvailable()
        val afterB1 = got.size
        assert(got.forall(_._1 >= 2 * off),
          s"a corpus exact-copy slipped past the static anti-join: " +
            got.filter(_._1 < 2 * off).take(3).mkString(","))
        assert(afterB1 > 0, "no v2 variant admitted — fixture vacuous")
        // batch 2: the later v2 twins — every fingerprint is now owned
        // by its batch-1 twin, so state must add NOTHING.
        ms.addData(v2b); q.processAllAvailable()
        assert(got.size == afterB1,
          s"late v2 twins leaked through the dedup state: ${got.size} vs $afterB1")
      } finally q.stop()
    } finally {
      prev.fold(spark.conf.unset(providerKey))(spark.conf.set(providerKey, _))
    }

    // ledger parity: per-source (n_admitted, sum ws_tokens) must equal
    // batch p02's columns exactly
    val streamed = got.groupBy(_._2).view
      .mapValues(ks => (ks.size.toLong, ks.map(_._3).sum)).toMap
    val p02 = SparkEntry.queries("p02_incremental_curation")(spark, sfDir).collect()
      .map(r => r.getString(0) -> ((r.getLong(5), r.getLong(7)))).toMap
    p02.foreach { case (src, (nAdmitted, sumToks)) =>
      assert(streamed.getOrElse(src, (0L, 0L)) == ((nAdmitted, sumToks)),
        s"$src: streamed ${streamed.get(src)} != batch p02 ($nAdmitted, $sumToks)")
    }
  }
}
