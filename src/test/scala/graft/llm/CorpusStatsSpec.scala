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

  test("minhash source overlap: canonical pairs, k/8 estimates coherent with exact") {
    val est = CorpusStats.qSourceOverlapMinhash(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getDouble(2)))
    assert(est.nonEmpty)
    est.foreach { case (a, b, e) =>
      assert(a < b, s"pair ($a,$b) not canonical")
      val k = e * Dedup.NumHashes
      assert(k == math.rint(k) && e >= 0.0 && e <= 1.0,
        s"estimate $e is not a k/${Dedup.NumHashes} signature fraction")
    }
    assert(est.map(p => (p._1, p._2)).distinct.length === est.length)
    // coherence with the exact operator: strongly-overlapping source
    // pairs (exact jaccard >= 0.9) must estimate high — the banded
    // signature path agrees with the inverted-index path on the
    // pairs that matter (loose floor: deterministic, never tuned)
    val exact = CorpusStats.qSourceOverlap(spark, sf).collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getDouble(4))).toMap
    val estMap = est.map(p => ((p._1, p._2), p._3)).toMap
    val strong = exact.filter(_._2 >= 0.9).keySet
    strong.foreach { pair =>
      assert(estMap.get(pair).exists(_ >= 0.5),
        s"$pair exact=${exact(pair)} but est=${estMap.get(pair)}")
    }
  }

  test("source overlap refuses to plan the quadratic above the source bound") {
    // scope guardrail: with the ceiling set below the corpus's actual
    // source count, the operator must FAIL FAST (before any join is
    // planned) and point at the MinHash path — a 10⁵-domain misuse can
    // never reach the O(sources²) fan-out
    spark.conf.set(CorpusStats.OverlapMaxSourcesConf, "1")
    try {
      val ex = intercept[IllegalStateException](
        CorpusStats.qSourceOverlap(spark, sf).collect())
      assert(ex.getMessage.contains("bounded strata"))
      assert(ex.getMessage.contains("MinHash"))
    } finally spark.conf.unset(CorpusStats.OverlapMaxSourcesConf)
    // defaults unaffected (the driver gate also pins this end-to-end)
    assert(CorpusStats.qSourceOverlap(spark, sf).count() > 0)
  }

  test("KMV source overlap carries the same quadratic guard as the exact twin") {
    // the sketches are k longs, but the PAIR algebra is |sources|² —
    // refuse open-ended domain sets exactly like q_source_overlap,
    // pointing at the linear MinHash path
    spark.conf.set(CorpusStats.OverlapMaxSourcesConf, "1")
    try {
      val ex = intercept[IllegalStateException](
        CorpusStats.qKmvSourceOverlap(spark, sf).collect())
      assert(ex.getMessage.contains("bounded strata"))
      assert(ex.getMessage.contains("q_source_overlap_minhash"))
    } finally spark.conf.unset(CorpusStats.OverlapMaxSourcesConf)
    assert(CorpusStats.qKmvSourceOverlap(spark, sf).count() > 0)
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

  test("token rarity: skew-split join, bit-identical to the single join") {
    val df = CorpusStats.qTokenRarity(spark, sf)
    val got = df.collect()
    assert(got.nonEmpty)

    // the plan must carry BOTH halves of the skew split BY
    // CONSTRUCTION. At test scale the planner (rightly) broadcasts the
    // tiny df table everywhere, so simulate corpus scale by disabling
    // size-based broadcasts: the head join must STILL broadcast (the
    // explicit hint carries it at any scale) while the tail falls to a
    // keyed join — the shape that executes when the df table exceeds
    // any broadcast threshold.
    val threshold = "spark.sql.autoBroadcastJoinThreshold"
    val saved = spark.conf.get(threshold)
    val plan =
      try {
        spark.conf.set(threshold, "-1")
        CorpusStats.qTokenRarity(spark, sf).queryExecution.sparkPlan.toString
      } finally spark.conf.set(threshold, saved)
    assert(plan.contains("BroadcastHashJoin"),
      s"expected the hinted broadcast head join:\n$plan")
    assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"),
      s"expected the keyed tail join with broadcasts disabled:\n$plan")

    // values: identical to the naive single-join form
    import org.apache.spark.sql.functions._
    val toks = graft.Tables.load(spark, sf, "documents")
      .select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
      .where(length(col("token")) > 0)
    val dfTab = toks.dropDuplicates("token", "doc_id")
      .groupBy("token").agg(count(lit(1)).as("df"))
    val naive = toks.join(dfTab, "token")
      .selectExpr("doc_id", "length(bin(df)) - 1 as bucket")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_toks"), avg(col("bucket")).as("rarity"))
      .orderBy("doc_id")
    assert(got.toSeq === naive.collect().toSeq)

    // rarity sanity: buckets are non-negative and bounded by log2(docs)
    val nDocs = graft.Tables.load(spark, sf, "documents").count()
    val maxBucket = 64 - java.lang.Long.numberOfLeadingZeros(nDocs)
    got.foreach { r =>
      val rarity = r.getDouble(2)
      assert(rarity >= 0.0 && rarity <= maxBucket.toDouble,
        s"doc ${r.getLong(0)} rarity $rarity out of [0, $maxBucket]")
    }
  }

  test("ppl bands: per-source terciles, balanced, ordered by surprisal") {
    val rows = CorpusStats.qLmPplBand(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getInt(3)))
    assert(rows.nonEmpty)
    assert(rows.forall(r => r._4 >= 1 && r._4 <= 3))
    // exactly the scoreable docs (>= 2 tokens) are banded
    val scored = CorpusStats.qLmBigramSurprisal(spark, sf).collect()
      .map(r => (r.getLong(0), r.getDouble(2))).toMap
    assert(rows.map(_._1).toSet === scored.keySet)
    // surprisal column carries the same per-doc score
    rows.foreach { case (id, _, s, _) => assert(s === scored(id), s"doc $id") }
    rows.groupBy(_._2).foreach { case (src, rs) =>
      // balanced: tercile sizes differ by at most 1 within a source
      val sizes = rs.groupBy(_._4).view.mapValues(_.length).values
      assert(sizes.max - sizes.min <= 1, s"source $src bands unbalanced")
      // monotone: walking a source by (surprisal, doc_id), the band
      // never decreases — the banding IS the order statistic
      val walked = rs.sortBy(r => (r._3, r._1)).map(_._4)
      assert(walked.zip(walked.drop(1)).forall { case (a, b) => a <= b },
        s"source $src bands out of order")
    }
  }

  test("DSIR importance: target-language docs outrank the rest; model stays bounded") {
    val rows = CorpusStats.qDsirImportance(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(rows.nonEmpty)
    // every scoreable doc appears exactly once
    assert(rows.map(_._1).distinct.length === rows.length)
    // the signal works: docs FROM the target distribution (lang=en)
    // must average a higher importance than docs outside it — that is
    // the whole premise of importance resampling
    val (en, rest) = rows.partition(_._2 == "en")
    assert(en.nonEmpty && rest.nonEmpty, "fixture must carry both slices")
    val enAvg = en.map(_._4).sum / en.length
    val restAvg = rest.map(_._4).sum / rest.length
    assert(enAvg > restAvg,
      s"target slice scored $enAvg, rest $restAvg — importance signal inverted")
    // deterministic: same inputs, same scores
    val again = CorpusStats.qDsirImportance(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(rows.toSeq === again.toSeq)
  }

  test("kmv source overlap: canonical pairs, k-bounded union, inclusion rule tracks exact jaccard") {
    val rows = CorpusStats.qKmvSourceOverlap(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5), r.getDouble(6), r.getDouble(7), r.getDouble(8)))
    assert(rows.nonEmpty)
    rows.foreach { case (a, b, nMerged, nBoth, jac, estUnion, estInter, cAB, cBA) =>
      assert(a < b, s"pair ($a,$b) not canonical")
      // the union sketch is itself a KMV sketch: never more than k kept
      assert(nMerged >= 1 && nMerged <= CorpusStats.KmvK,
        s"($a,$b): merged sketch kept $nMerged > k")
      assert(nBoth >= 0 && nBoth <= nMerged, s"($a,$b): n_both=$nBoth of $nMerged")
      assert(math.abs(jac - nBoth.toDouble / nMerged) < 1e-15)
      assert(estUnion > 0.0 && estInter >= 0.0 &&
        estInter <= estUnion * (1 + 1e-12),
        s"($a,$b): est_intersect $estInter vs est_union $estUnion")
      // containment dominates jaccard (each side's estimate ≤ the
      // union's) and estimation noise stays within a loose roof
      assert(cAB >= jac - 1e-12 && cBA >= jac - 1e-12,
        s"($a,$b): containment ($cAB,$cBA) below jaccard $jac")
      assert(cAB >= 0.0 && cAB <= 2.0 && cBA >= 0.0 && cBA <= 2.0,
        s"($a,$b): containment out of sane range ($cAB,$cBA)")
    }
    assert(rows.map(p => (p._1, p._2)).distinct.length === rows.length)
    // the inclusion-rule estimate against the EXACT distinct-bigram
    // jaccard, recomputed here from the raw table: the k smallest union
    // hashes are a uniform sample of the union, so the fraction present
    // in both sketches has std error ~1/sqrt(k) ≈ 0.125 at k=64; the
    // hashes are deterministic so this is a fixed number per pair — the
    // 3.2-sigma bound just has to hold once
    val sets = spark.read.parquet(s"$sf/documents.parquet")
      .selectExpr("source", "filter(split(text, ' '), t -> length(t) > 0) as ta")
      .where("size(ta) >= 2")
      .selectExpr("source",
        """explode(transform(sequence(2, size(ta)),
          |  i -> concat(element_at(ta, i - 1), ' ', element_at(ta, i)))) as bigram""".stripMargin)
      .distinct().collect()
      .groupBy(_.getString(0)).map { case (s, rs) => s -> rs.map(_.getString(1)).toSet }
    rows.foreach { case (a, b, _, _, jac, _, _, _, _) =>
      val (sa, sb) = (sets(a), sets(b))
      val exact = (sa & sb).size.toDouble / (sa | sb).size
      assert(math.abs(jac - exact) <= 0.40,
        s"($a,$b): kmv jaccard $jac vs exact $exact")
    }
  }
}
