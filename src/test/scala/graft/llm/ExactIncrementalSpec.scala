package graft.llm

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** Exact-hash incremental dedup ([[IncrementalDedup.exactProbe]]):
  * decision algebra on a hand-built fixture, and the load-bearing
  * invariant that the bloom prefilter is a PLAN optimization only —
  * an undersized bloom (near-100% false positives) must yield
  * byte-identical decisions, because every might-contain row is
  * confirmed against the real index. */
class ExactIncrementalSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  private def fixture() = {
    import spark.implicits._
    // corpus: doc 1 and 5 share content "dup text" (canonical = 1)
    val corpus = Seq(
      (1L, "dup text"), (2L, "alpha beta"), (3L, "gamma delta"), (5L, "DUP TEXT"))
      .toDF("doc_id", "text")
    // batch: 10 = corpus dup (of 1), 11 = new but submitted twice
    // (12 is its in-batch dup), 13 = genuinely new once
    val batch = Seq(
      (10L, "dup text"), (11L, "brand new"), (12L, "Brand New"), (13L, "solo new"))
      .toDF("new_id", "t")
    (corpus, batch)
  }

  private def decisions(expectedItems: Long): Map[Long, (Option[Long], Boolean)] = {
    val (corpus, batch) = fixture()
    val idx = IncrementalDedup.exactHashIndex(corpus)
    IncrementalDedup.exactProbe(batch, idx,
        IncrementalDedup.hashBloom(idx, expectedItems))
      .collect()
      .map(r => r.getLong(0) ->
        ((if (r.isNullAt(1)) None else Some(r.getLong(1))), r.getBoolean(2)))
      .toMap
  }

  test("decision algebra: corpus dup, in-batch dup, survivors") {
    val d = decisions(10000L)
    assert(d(10L) === (Some(1L), false), "corpus dup points at canonical min id")
    assert(d(11L) === (None, true), "first in-batch occurrence survives")
    assert(d(12L) === (None, false), "second in-batch occurrence dropped")
    assert(d(13L) === (None, true), "genuinely new survives")
  }

  test("an undersized bloom (high FP rate) changes nothing — the confirm join is exact") {
    // expectedItems=1 over a 4-doc corpus saturates the filter; every
    // batch row takes the confirm-join path and the answer must match
    assert(decisions(1L) === decisions(100000L))
  }

  test("the gated query agrees with independent set algebra at sf0.001") {
    val sf = "/root/testdata/sf0.001"
    val got = IncrementalDedup.qDedupIncrementalExact(spark, sf).collect()
    // resubmits must all be corpus dups, pointing at the canonical
    // (minimum) id of their content — at most their own original
    val resubmits = got.filter(r => r.getLong(0) >= IncrementalDedup.ExactResubmitOffset &&
      r.getLong(0) < IncrementalDedup.ExactModifiedOffset)
    assert(resubmits.nonEmpty)
    resubmits.foreach { r =>
      assert(!r.isNullAt(1) && !r.getBoolean(2), s"resubmit ${r.getLong(0)} must be a dup")
      assert(r.getLong(1) <= r.getLong(0) - IncrementalDedup.ExactResubmitOffset)
    }
    // modified docs are exact-new vs the corpus (dup_of NULL); the
    // FIRST batch occurrence of each modified text survives (later
    // ones only lose to an in-batch twin, never to the corpus)
    val modified = got.filter(r => r.getLong(0) >= IncrementalDedup.ExactModifiedOffset &&
      r.getLong(0) < IncrementalDedup.ExactFreshOffset)
    assert(modified.nonEmpty)
    modified.foreach(r => assert(r.isNullAt(1),
      s"modified ${r.getLong(0)} must not match the corpus"))
    assert(modified.exists(_.getBoolean(2)))
    // fresh: 30 rows over 15 distinct texts — exactly 15 keepers
    val freshRows = got.filter(_.getLong(0) >= IncrementalDedup.ExactFreshOffset)
    assert(freshRows.length === 30)
    assert(freshRows.count(_.getBoolean(2)) === 15)
    // keeper of each fresh pair is the lower id
    assert(freshRows.filter(_.getBoolean(2)).forall(r =>
      r.getLong(0) - IncrementalDedup.ExactFreshOffset < 15))
  }

  test("bad bloom conf fails loudly with the conf name") {
    val key = IncrementalDedup.BloomExpectedItemsConf
    spark.conf.set(key, "not-a-number")
    try {
      val e = intercept[IllegalArgumentException](
        IncrementalDedup.qDedupIncrementalExact(spark, "/root/testdata/sf0.001"))
      assert(e.getMessage.contains(key))
    } finally spark.conf.unset(key)
  }
}
