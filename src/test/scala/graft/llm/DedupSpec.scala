package graft.llm

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** LSH structural invariants (the DuckDB oracle pins the VALUES; these
  * pin the properties that make the algorithm correct at scale). */
class DedupSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("exact duplicates share the band key in ALL bands") {
    import spark.implicits._
    val texts = Seq(
      1L -> "the quick brown fox jumps over the lazy dog today",
      2L -> "the quick brown fox jumps over the lazy dog today", // exact dup of 1
      3L -> "an entirely different document about spark catalyst internals and shuffles",
      4L -> "the quick brown fox jumps over the lazy dog yesterday") // near-dup of 1
    val docs = texts.toDF("id", "text")
      .selectExpr("id", "split(lower(text), ' ') as toks")
    val bands = Dedup.bandsOf(docs)

    val shared = bands.as("x").join(bands.as("y"),
      $"x.b" === $"y.b" && $"x.k" === $"y.k" && $"x.id" < $"y.id")
      .groupBy($"x.id".as("a"), $"y.id".as("b"))
      .count()
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap

    // exact dup pair (1,2): all bands agree — NEVER missed by LSH
    assert(shared((1L, 2L)) === Dedup.NumBands.toLong)
    // unrelated docs share no band
    assert(!shared.contains((1L, 3L)) && !shared.contains((2L, 3L)))
  }

  test("connected components label every member with the component minimum") {
    import spark.implicits._
    // chain (diameter 2), a triangle, and an isolated pair
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L), (6L, 7L), (5L, 7L), (10L, 11L))
      .toDF("id_a", "id_b")
    val labels = Dedup.connectedComponents(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels === Map(
      1L -> 1L, 2L -> 1L, 3L -> 1L,
      5L -> 5L, 6L -> 5L, 7L -> 5L,
      10L -> 10L, 11L -> 10L))
  }

  test("pointer jumping converges a 1000-node chain in O(log n) rounds") {
    import spark.implicits._
    // worst case for pure propagation: a path graph (diameter 999 —
    // min-label propagation alone would need 999 rounds and trip the
    // 64-round cap); the per-round pointer jump halves label chains,
    // so convergence is logarithmic
    val pairs = (0L until 999L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val labels = Dedup.connectedComponents(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels.size === 1000)
    assert(labels.values.forall(_ == 0L), "every chain member labels to the minimum")
    assert(Dedup.lastCcRounds <= 12,
      s"chain took ${Dedup.lastCcRounds} rounds — jumping regressed to O(diameter)")
  }

  test("hot-bucket cap bounds pair explosion from boilerplate text") {
    import spark.implicits._
    // 300 identical boilerplate docs (one mega-bucket in every band)
    // plus one small near-dup cluster in cold buckets
    val boiler = (1L to 300L).map(i =>
      i -> "subscribe to our newsletter for updates terms of service apply always")
    val cluster = Seq(
      9001L -> "catalyst optimizes logical plans into efficient physical plans with codegen",
      9002L -> "catalyst optimizes logical plans into efficient physical plans with codegen")
    val docs = (boiler ++ cluster).toDF("id", "text")
      .selectExpr("id", "split(lower(text), ' ') as toks")
    // uncapped: the mega-bucket explodes quadratically (300·299/2 pairs)
    val uncapped = Dedup.candidatePairs(docs, maxBucket = Int.MaxValue).count()
    assert(uncapped === (300L * 299 / 2) + 1)

    // capped: boilerplate bucket dropped, the true pair in cold buckets
    // is untouched
    val capped = Dedup.candidatePairs(docs, maxBucket = 100).collect()
    assert(capped.length === 1)
    assert((capped.head.getLong(0), capped.head.getLong(1)) === (9001L, 9002L))
    assert(capped.head.getLong(2) === Dedup.NumBands.toLong)
  }

  test("block dedup: aligned blocks pair, shifted copies don't, df cap kills boilerplate") {
    import spark.implicits._
    val span = (1 to 20).map(i => s"tok$i").mkString(" ")
    val tail = (1 to 19).map(i => s"x$i").mkString(" ")
    val tail2 = (1 to 19).map(i => s"y$i").mkString(" ")
    val boiler = (1 to 20).map(i => s"b$i").mkString(" ")
    val docs = (Seq(
      1L -> s"$span $tail",                         // block 0 = span
      2L -> s"$span $tail2",                        // block 0 = span → pairs with 1
      3L -> (Seq.fill(10)("pad").mkString(" ") + s" $span " + // span straddles the
        (1 to 10).map(i => s"z$i").mkString(" ")))  // grid → NOT paired (alignment)
      ++ (100L to 124L).map(i => i -> boiler)       // 25 docs share one block
    ).toDF("doc_id", "text")

    // uncapped: the boilerplate block alone contributes C(25,2) pairs
    assert(Dedup.blockPairs(docs, blockDf = Int.MaxValue).count() === (25L * 24 / 2) + 1)

    // capped (default 20): boilerplate dropped, only the true aligned pair
    val out = Dedup.blockPairs(docs).collect()
    assert(out.length === 1)
    assert((out.head.getLong(0), out.head.getLong(1)) === (1L, 2L))
    assert(out.head.getLong(2) === 1L) // n_shared
  }

  test("near-dup pairs from the corpus derivation survive the verify join") {
    // the sf0.001 corpus derives near-copies of every 7th doc: those
    // pairs must be found with jaccard >= 0.5 and id_b = id_a + 2000000
    val out = Dedup.qDedupMinhashLsh(spark, sf).collect()
    assert(out.nonEmpty)
    val derived = out.filter(r => r.getLong(1) == r.getLong(0) + 2000000L)
    assert(derived.nonEmpty)
    // every reported pair passed the exact-Jaccard threshold
    assert(out.forall(_.getDouble(3) >= 0.5))
    // band counts never exceed the number of bands
    assert(out.forall(r => r.getLong(2) >= 1 && r.getLong(2) <= Dedup.NumBands))
  }

  test("connected components match a union-find oracle on random graphs") {
    import spark.implicits._
    // deterministic pseudo-random graphs (fixed seeds) spanning the
    // regimes the iterative algorithm must handle: sparse forests,
    // dense near-cliques, and mixtures with isolated pairs — each
    // compared against a driver-side union-find ground truth
    for ((seed, pEdge) <- Seq((1, 0.01), (7, 0.05), (42, 0.3))) {
      val rnd = new scala.util.Random(seed)
      val n = 120 + rnd.nextInt(80)
      val pairs = (for {
        a <- 0 until n; b <- (a + 1) until n
        if rnd.nextDouble() < pEdge
      } yield (a.toLong, b.toLong)).toSeq
      if (pairs.nonEmpty) {
        // oracle: path-compressed union-find, then min id per root
        val parent = Array.tabulate(n)(identity)
        def find(x: Int): Int = {
          var r = x
          while (parent(r) != r) r = parent(r)
          var c = x
          while (parent(c) != r) { val nx = parent(c); parent(c) = r; c = nx }
          r
        }
        pairs.foreach { case (a, b) =>
          val (ra, rb) = (find(a.toInt), find(b.toInt))
          if (ra != rb) parent(ra) = rb
        }
        val minOfRoot = (0 until n).filter(v => pairs.exists(p =>
            p._1 == v || p._2 == v))
          .groupBy(find).map { case (r, vs) => r -> vs.min.toLong }
        val expected = (0 until n).flatMap(v =>
          if (pairs.exists(p => p._1 == v || p._2 == v))
            Some(v.toLong -> minOfRoot(find(v))) else None).toMap

        val got = Dedup.connectedComponents(pairs.toDF("id_a", "id_b"))
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        assert(got === expected, s"seed=$seed n=$n p=$pEdge edges=${pairs.size}")
      }
    }
  }

  test("n-gram Jaccard inverted index recovers the derived near-copies") {
    // every 11th doc gets a truncated near-copy (id + 3000000): the
    // df-capped inverted index must surface those pairs and the exact
    // Jaccard verify must score them >= 0.6
    val out = Dedup.qDedupNgramJaccard(spark, sf).collect()
    assert(out.nonEmpty)
    val derived = out.filter(r => r.getLong(1) == r.getLong(0) + 3000000L)
    assert(derived.nonEmpty)
    assert(derived.forall(r => r.getLong(0) % 11 == 0))
    assert(out.forall(_.getDouble(2) >= 0.6))
  }

  test("prefix-containment: bucketed join finds exactly the true-prefix pairs") {
    import spark.implicits._
    // hand corpus (every doc >= 32 chars, matching the operator's
    // documented minimum): 1 is a prefix of 2 and 3; 4 shares the
    // 32-char bucket with 1/2/3 but diverges afterward (candidate that
    // must FAIL the exact check); 5 is unrelated.
    val head = "the quick brown fox jumps over " // 31 chars
    val docs = Seq(
      (1L, head + "the lazy dog"),
      (2L, head + "the lazy dog and then some more text"),
      (3L, head + "the lazy dog and then some more text plus an even longer tail"),
      (4L, head + "the sleeping cat instead"),
      (5L, "a completely different document body here")
    ).toDF("doc_id", "text")

    // run the same shape as qPrefixDedup against the hand corpus
    val d = docs.select($"doc_id", $"text",
      org.apache.spark.sql.functions.substring($"text", 1, 32).as("k32"))
    val a = d.select($"doc_id".as("contained"), $"text".as("text_a"), $"k32")
    val b = d.select($"doc_id".as("container"), $"text".as("text_b"), $"k32")
    val pairs = a.join(b, "k32")
      .where($"contained" =!= $"container" && $"text_b".startsWith($"text_a"))
      .select($"contained", $"container")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // 1<2, 1<3, 2<3; 4 and 5 in no pair
    assert(pairs === Set((1L, 2L), (1L, 3L), (2L, 3L)))
  }

  test("prefix-containment corpus run is bucket-joined, not all-pairs") {
    val df = Dedup.qPrefixDedup(spark, sf)
    val out = df.collect()
    // sanity on the live corpus output: a doc never contains itself
    assert(out.forall(r => r.getLong(0) != r.getLong(1)))
    // plan: the join must carry an equi-key (the 32-char bucket) — no
    // cartesian / nested-loop fallback
    import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    def bad(p: org.apache.spark.sql.execution.SparkPlan): Seq[String] = p.collect {
      case _: CartesianProductExec => Seq("cartesian")
      case _: BroadcastNestedLoopJoinExec => Seq("bnlj")
      case ad: AdaptiveSparkPlanExec => bad(ad.executedPlan)
      case q: QueryStageExec => bad(q.plan)
    }.flatten
    assert(bad(df.queryExecution.executedPlan).isEmpty)
  }

  test("keep-best refuses a corpus whose ids cross the reserved variant range") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-keepbest-guard").toString
    Seq((Dedup.VariantIdOffset + 500000L, "some text here", "src0"))
      .toDF("doc_id", "text", "source")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    // the guard runs INSIDE the job (no eager plan-build scan), so the
    // raise_error surfaces at execution wrapped by Spark — walk the
    // cause chain for the remap message
    val ex = intercept[Exception](Dedup.qDedupKeepBest(spark, dir).collect())
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil
      else String.valueOf(t.getMessage) +: messages(t.getCause)
    assert(messages(ex).exists(_.contains("reserves doc ids")),
      s"expected the reserved-id guard, got: ${messages(ex).mkString(" | ")}")
  }

  test("keep-best survivor: one per cluster, maximal quality, deterministic ties") {
    val best = Dedup.qDedupKeepBest(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(best.nonEmpty)
    assert(best.map(_._1).distinct.length === best.length, "one survivor per cluster")

    // cross-check against the min-id cluster assignment: same clusters,
    // same membership counts, and the survivor really is the argmax of
    // the members' underlying quality (ties to the lowest member id)
    val members = Dedup.qDedupClusters(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))) // (cluster, doc_id)
    val quality = graft.llm.TextAnalysis.qualityScored(spark, sf).collect()
      .map(r => (r.getLong(0), r.getDecimal(2).doubleValue())).toMap
    val byCluster = members.groupBy(_._1)
    assert(best.map(_._1).toSet === byCluster.keySet)
    best.foreach { case (cl, n, bestId, q) =>
      val ms = byCluster(cl).map(_._2)
      assert(n === ms.length.toLong, s"cluster $cl member count")
      val expected = ms.map(id => (id, quality(
        if (id >= Dedup.VariantIdOffset) id - Dedup.VariantIdOffset else id)))
        .minBy { case (id, mq) => (-mq, id) }
      assert((bestId, q) === expected, s"cluster $cl survivor")
    }
  }

  test("capHotBuckets: agg+explode equals the exact-occupancy filter, any payload") {
    import spark.implicits._
    // (b, k, id): bucket (b,k) has occupancy k; cap 5 keeps k <= 5 intact
    val rows = for { b <- 0 until 3; k <- 1 to 12; i <- 1 to k }
      yield (b, k.toString, (b * 100000 + k * 100 + i).toLong)
    val df = rows.toDF("b", "k", "id").repartition(9)
    val got = Dedup.capHotBuckets(df, 5)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSet
    val expected = rows.filter { case (_, k, _) => k.toInt <= 5 }.toSet
    assert(got === expected)
  }
}
