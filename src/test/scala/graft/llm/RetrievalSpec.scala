package graft.llm

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** Retrieval-ranking invariants (the DuckDB oracle pins exact values;
  * these pin the properties that hold at any scale). */
class RetrievalSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("bm25: dense ranks per query, non-increasing scores, self excluded, lexical grounding") {
    val rows = Retrieval.qBm25TopK(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    val byQ = rows.groupBy(_._1)
    byQ.foreach { case (q, rs) =>
      val sorted = rs.sortBy(_._2)
      assert(sorted.map(_._2).toSeq === (1 to rs.length).toSeq, s"query $q ranks not dense")
      assert(rs.forall(_._3 != q), s"query $q retrieved itself")
      // scores non-increasing down the ranking; ties broken by doc_id asc
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a._4 > b._4 || (a._4 == b._4 && a._3 < b._3),
            s"query $q: rank ${a._2} ($a) does not dominate ($b)")
        case _ =>
      }
    }
    // lexical grounding: every retrieved doc shares at least one token
    // with its query doc (an inner postings join can return nothing else)
    val toks = spark.read.parquet(s"$sf/documents.parquet")
      .selectExpr("doc_id", "filter(split(text, ' '), t -> length(t) > 0) as ta")
      .selectExpr("doc_id", "explode(ta) as t").collect()
      .groupBy(_.getLong(0)).map { case (d, rs) => d -> rs.map(_.getString(1)).toSet }
    rows.foreach { case (q, _, d, _) =>
      assert((toks(q) & toks(d)).nonEmpty, s"doc $d shares no token with query $q")
    }
  }

  test("bm25 incremental: batch queries only, frozen corpus only, dense grounded ranks") {
    val rows = Retrieval.qBm25Incremental(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    rows.foreach { case (q, _, d, _) =>
      assert(q % 10 === 7, s"non-batch doc $q used as a query")
      assert(d % 10 !== 7, s"batch doc $d retrieved from the frozen index")
    }
    rows.groupBy(_._1).foreach { case (q, rs) =>
      val sorted = rs.sortBy(_._2)
      assert(sorted.map(_._2).toSeq === (1 to rs.length).toSeq, s"query $q ranks not dense")
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a._4 > b._4 || (a._4 == b._4 && a._3 < b._3),
            s"query $q: rank ${a._2} ($a) does not dominate ($b)")
        case _ =>
      }
    }
    // grounding: every hit shares a token with its batch query doc
    val toks = spark.read.parquet(s"$sf/documents.parquet")
      .selectExpr("doc_id", "filter(split(text, ' '), t -> length(t) > 0) as ta")
      .selectExpr("doc_id", "explode(ta) as t").collect()
      .groupBy(_.getLong(0)).map { case (d, rs) => d -> rs.map(_.getString(1)).toSet }
    rows.foreach { case (q, _, d, _) =>
      assert((toks(q) & toks(d)).nonEmpty, s"doc $d shares no token with batch query $q")
    }
  }

  test("n-gram term space is a parameter: unigram terms + stopword cap rank a real corpus shape") {
    import spark.implicits._
    // n = 1: dl is the token count, tokens are the words themselves
    val docs = Seq((1L, "alpha beta  alpha"), (2L, "beta gamma")).toDF("doc_id", "text")
    val uni = Retrieval.ngramToksOf(docs, 1).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSeq
    assert(uni.sorted === Seq((1L, 3, "alpha"), (1L, 3, "alpha"), (1L, 3, "beta"),
      (2L, 2, "beta"), (2L, 2, "gamma")))
    // n = 3 generalizes the same derivation (dl = tokens − 2)
    val tri = Retrieval.ngramToksOf(docs, 3).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSeq
    assert(tri === Seq((1L, 1, "alpha beta alpha")))
    // end-to-end on unigram terms: a 12-doc corpus where 'needle' is
    // rare (df = 2 ≤ n_docs/10 is false at 12... use df=1) and 'the' is
    // universal; the stopword cap must keep 'needle' and drop 'the',
    // so the query retrieves exactly the needle doc
    val corpus = ((1L to 11L).map(i => (i, s"the common filler word$i")) :+
      (12L, "the needle document exact")).toDF("doc_id", "text")
    val hits = Retrieval.bm25Against(
      Retrieval.postingsOf(Retrieval.ngramToksOf(corpus, 1)),
      Seq((100L, "needle"), (100L, "the")).toDF("query_id", "token"))
      .collect().map(r => (r.getLong(0), r.getLong(2)))
    assert(hits.toSeq === Seq((100L, 12L)))
  }

  test("hybrid rrf: fused score is exactly the two integer rank contributions") {
    val rows = Retrieval.qHybridRrf(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getInt(3)),
        if (r.isNullAt(4)) None else Some(r.getInt(4)),
        r.getLong(5)))
    assert(rows.nonEmpty)
    rows.foreach { case (q, _, d, bm, dn, rrf) =>
      assert(bm.nonEmpty || dn.nonEmpty, s"($q,$d) in neither pool")
      val expect = bm.map(r => 1000000L / (60 + r)).getOrElse(0L) +
        dn.map(r => 1000000L / (60 + r)).getOrElse(0L)
      assert(rrf === expect, s"($q,$d): rrf1e6 $rrf != $expect from ranks ($bm,$dn)")
    }
    rows.groupBy(_._1).foreach { case (q, rs) =>
      assert(rs.map(_._2).sorted.toSeq === (1 to rs.length).toSeq, s"query $q ranks not dense")
      // fusion is genuinely hybrid on this corpus: at least one fused
      // top-10 doc came from each single modality's pool alone
      val only = rs.map(r => (r._4.nonEmpty, r._5.nonEmpty))
      assert(only.exists(p => p._1 && !p._2) || only.exists(p => !p._1 && p._2) ||
        only.forall(p => p._1 && p._2),
        s"query $q: pool membership degenerate: ${only.toSeq}")
    }
    // a doc present in BOTH pools at equal rank outranks one in a single
    // pool at that rank — the monotonicity RRF exists to provide (checked
    // structurally: scores of two-pool rows exceed every one-pool row
    // with both its ranks no better)
    val twoPool = rows.filter(r => r._4.nonEmpty && r._5.nonEmpty)
    val onePool = rows.filter(r => r._4.isEmpty != r._5.isEmpty)
    for {
      t <- twoPool
      o <- onePool.filter(_._1 == t._1)
      oRank = o._4.orElse(o._5).get
      if t._4.get <= oRank && t._5.get <= oRank
    } assert(t._6 > o._6, s"two-pool $t not above one-pool $o")
  }
}
