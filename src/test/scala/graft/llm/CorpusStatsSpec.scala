package graft.llm

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** Corpus-statistics invariants (the DuckDB oracle pins exact values;
  * these pin the properties that hold at any scale). */
class CorpusStatsSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("vocab top-k: descending counts, deterministic tie order") {
    val rows = CorpusStats.qVocabTopk(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(rows.nonEmpty && rows.length <= 50)
    rows.sliding(2).foreach {
      case Array((ta, na), (tb, nb)) =>
        assert(na > nb || (na == nb && ta < tb),
          s"order violated at ($ta,$na) -> ($tb,$nb)")
      case _ =>
    }
  }

  test("tfidf keywords: <=3 per doc, rank order respects (tf desc, df asc)") {
    val rows = CorpusStats.qTfidfKeywords(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getLong(3), r.getLong(4)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (doc, ks) =>
      assert(ks.length <= 3, s"doc $doc has ${ks.length} keywords")
      assert(ks.map(_._2).sorted.toSeq === (1 to ks.length).toSeq)
      ks.sortBy(_._2).sliding(2).foreach {
        case Array(a, b) =>
          // rank 1 dominates rank 2 in the integer (tf, -df, term) order
          val ok = a._4 > b._4 ||
            (a._4 == b._4 && (a._5 < b._5 || (a._5 == b._5 && a._3 < b._3)))
          assert(ok, s"doc $doc: rank ${a._2} $a does not dominate $b")
        case _ =>
      }
    }
  }

  test("source overlap: every unordered pair once, exact set algebra") {
    val rows = CorpusStats.qSourceOverlap(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
    assert(rows.nonEmpty)
    rows.foreach { case (a, b, inter, uni, jac) =>
      assert(a < b, s"pair ($a,$b) not canonical")
      assert(inter >= 1 && uni >= inter, s"($a,$b): inter=$inter uni=$uni")
      assert(math.abs(jac - inter.toDouble / uni) < 1e-15)
    }
    assert(rows.map(p => (p._1, p._2)).distinct.length === rows.length)
  }

  test("embedding centroids: every (label, dim) cell, consistent counts") {
    val rows = CorpusStats.qEmbCentroids(spark, sf).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getLong(3)))
    val dims = rows.map(_._2).distinct.sorted
    assert(dims.toSeq === (0 until 64), s"dims = ${dims.take(5).toSeq}...")
    // within a label, every dim aggregates the same number of vectors
    rows.groupBy(_._1).foreach { case (label, cells) =>
      assert(cells.map(_._4).distinct.length === 1,
        s"label $label has inconsistent counts across dims")
      assert(cells.length === 64)
    }
    // micro-unit quantization bound: |component| < 2 => |sum_q| < 2e6 * n
    rows.foreach { case (label, dim, sumQ, n) =>
      assert(math.abs(sumQ) <= 2000000L * n, s"($label,$dim) sum_q=$sumQ n=$n")
    }
  }
}
