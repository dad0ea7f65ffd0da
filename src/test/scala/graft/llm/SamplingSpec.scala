package graft.llm

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** Sampling / packing structural invariants (the DuckDB oracle pins
  * the exact VALUES; these pin the properties that make the operators
  * usable at scale). */
class SamplingSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("stratified sample is deterministic and respects per-stratum rates") {
    val a = Sampling.qSampleStratified(spark, sf).collect()
    val b = Sampling.qSampleStratified(spark, sf).collect()
    // determinism: rerunning selects the SAME sample (hash, not rand)
    assert(a.map(r => (r.getString(0), r.getLong(1))).toSeq ===
      b.map(r => (r.getString(0), r.getLong(1))).toSeq)
    assert(a.nonEmpty)

    // observed per-stratum rate stays in a loose band around the
    // configured permille (50/200/500) — the hash spreads uniformly
    val docs = graft.Tables.load(spark, sf, "documents")
      .selectExpr(
        """case when n_chars < 500 then 'short'
          |     when n_chars < 2000 then 'medium'
          |     else 'long' end as stratum""".stripMargin)
      .groupBy("stratum").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val sampled = a.groupBy(_.getString(0)).view.mapValues(_.length.toLong).toMap
    val rates = Map("short" -> 0.05, "medium" -> 0.20, "long" -> 0.50)
    rates.foreach { case (stratum, rate) =>
      val total = docs.getOrElse(stratum, 0L)
      if (total >= 50) {
        val got = sampled.getOrElse(stratum, 0L).toDouble / total
        assert(math.abs(got - rate) < 0.15,
          s"$stratum: sampled $got of $total, configured $rate")
      }
    }
  }

  test("split assignment is exhaustive, disjoint-by-construction, ~98/1/1") {
    val out = Sampling.qSplitAssign(spark, sf).collect()
    assert(out.nonEmpty)
    // exhaustive: per-source split counts sum to the corpus
    val total = graft.Tables.load(spark, sf, "documents").count()
    assert(out.map(_.getLong(2)).sum === total)
    // every (source, split) appears at most once (grouped output)
    val keys = out.map(r => (r.getString(0), r.getString(1)))
    assert(keys.distinct.length === keys.length)
    // global ratio: train ~98% within a loose band (hash uniformity)
    val byPct = out.groupBy(_.getString(1)).view
      .mapValues(_.map(_.getLong(2)).sum.toDouble / total).toMap
    assert(math.abs(byPct.getOrElse("train", 0.0) - 0.98) < 0.02)
    assert(byPct.getOrElse("val", 0.0) < 0.05)
    assert(byPct.getOrElse("test", 0.0) < 0.05)
    // rerun identical (hash-gated, not rand)
    assert(Sampling.qSplitAssign(spark, sf).collect().map(_.toString).toSeq ===
      out.map(_.toString).toSeq)
  }

  test("shard packing covers every document once, budget bounds respected") {
    val shards = Sampling.qShardPack(spark, sf).collect()
    assert(shards.nonEmpty)
    val totalDocs = graft.Tables.load(spark, sf, "documents").count()
    assert(shards.map(_.getLong(1)).sum === totalDocs) // partition of corpus

    // shard ids are contiguous from 0 and id ranges never overlap
    assert(shards.map(_.getInt(0)).toSeq === shards.indices)
    shards.sliding(2).foreach {
      case Array(prev, next) =>
        assert(prev.getLong(4) < next.getLong(3), "overlapping doc ranges")
      case _ =>
    }
    // every shard except possibly the last crosses its budget boundary
    // only via its final document: tokens ≥ budget - max doc size is
    // too strong for synthetic data; assert the robust invariant —
    // a shard STARTS because the running total crossed the boundary,
    // so cumulative tokens through shard k exceed k * budget
    var cum = 0L
    shards.dropRight(1).zipWithIndex.foreach { case (r, k) =>
      cum += r.getLong(2)
      assert(cum >= (k + 1) * 10000L,
        s"shard $k ended at $cum tokens, below its boundary")
    }
  }

  test("shard packing never plans a global (single-partition) window") {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.ReusedExchangeExec
    import org.apache.spark.sql.execution.window.WindowExec
    val df = Sampling.qShardPack(spark, sf)
    df.collect() // force execution so AQE finalizes the plan
    // AQE wraps finalized stages in leaf nodes — descend through them
    def windowsIn(p: SparkPlan): Seq[WindowExec] = p.collect {
      case w: WindowExec => Seq(w)
      case a: AdaptiveSparkPlanExec => windowsIn(a.executedPlan)
      case q: QueryStageExec => windowsIn(q.plan)
      case r: ReusedExchangeExec => windowsIn(r.child)
    }.flatten
    val windows = windowsIn(df.queryExecution.executedPlan)
    assert(windows.nonEmpty, "expected the running-sum window in the plan")
    windows.foreach(w => assert(w.partitionSpec.nonEmpty,
      s"global window (no PARTITION BY) would serialize the corpus " +
        s"through one task at 100 TB: $w"))

    // the distributed prefix sum must actually SPAN ranges at test
    // scale, or the partition-spec assertion proves nothing — the
    // query's own sampled cuts must split the corpus into >1 occupied
    // range (cuts are quantiles, so every cut separates real rows)
    assert(Sampling.lastPackCuts.size > 1,
      s"test data too small to exercise multiple ranges: ${Sampling.lastPackCuts}")

    // bit-identical to the single-window semantics (the oracle's form)
    val single = graft.Tables.load(spark, sf, "documents")
      .selectExpr("doc_id", "size(split(lower(text), ' ')) as n_toks")
      .selectExpr("doc_id", "n_toks",
        "sum(n_toks) over (order by doc_id rows between unbounded preceding and current row) - n_toks as prior_toks")
      .selectExpr("cast(floor(prior_toks / 10000) as int) as shard",
        "doc_id", "n_toks")
      .groupBy("shard")
      .agg(
        org.apache.spark.sql.functions.expr("count(*) as n_docs"),
        org.apache.spark.sql.functions.expr("sum(n_toks) as shard_tokens"),
        org.apache.spark.sql.functions.expr("min(doc_id) as first_doc"),
        org.apache.spark.sql.functions.expr("max(doc_id) as last_doc"))
      .orderBy("shard")
    assert(df.collect().toSeq === single.collect().toSeq)
  }

  test("pathologically clustered ids still split across ranges (sampled cuts)") {
    import org.apache.spark.sql.functions.expr
    // the equal-width failure mode: a dense band [0, 2000) plus one
    // outlier 10^9 away — width cuts put the WHOLE band in range 0;
    // quantile cuts must land inside the band instead
    val docs = spark.range(0, 2000)
      .selectExpr("id as doc_id", "cast(id % 37 + 3 as int) as n_toks")
      .union(spark.range(1, 2)
        .selectExpr("1000000000 as doc_id", "11 as n_toks"))
    val packed = Sampling.packShards(docs).collect()

    val cuts = Sampling.lastPackCuts
    assert(cuts.size > 1, s"sampled cuts did not split the dense band: $cuts")
    assert(cuts.count(_ <= 2000L) > 1,
      s"cuts must fall INSIDE the clustered band, got $cuts")
    // >1 OCCUPIED range: every quantile cut separates real rows by
    // construction; prove it against the data rather than trust it
    val bucketExpr = cuts.map(c => s"(case when doc_id >= ${c}L then 1 else 0 end)")
      .mkString(" + ")
    val occupied = docs.selectExpr(s"$bucketExpr as bucket")
      .distinct().count()
    assert(occupied > 1, s"only $occupied occupied range(s) under cuts $cuts")

    // bit-identity to the single-window oracle form on the same input
    val single = docs
      .selectExpr("doc_id", "n_toks",
        "sum(n_toks) over (order by doc_id rows between unbounded preceding and current row) - n_toks as prior_toks")
      .selectExpr("cast(floor(prior_toks / 10000) as int) as shard",
        "doc_id", "n_toks")
      .groupBy("shard")
      .agg(
        expr("count(*) as n_docs"),
        expr("sum(n_toks) as shard_tokens"),
        expr("min(doc_id) as first_doc"),
        expr("max(doc_id) as last_doc"))
      .orderBy("shard")
    assert(packed.toSeq === single.collect().toSeq)
  }

  test("corpus mixing: deterministic epochs, observed rates track weights") {
    val a = Sampling.qMixEpochs(spark, sf).collect()
    val b = Sampling.qMixEpochs(spark, sf).collect()
    assert(a.map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq ===
      b.map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq)
    assert(a.nonEmpty)

    // per-doc epochs are contiguous from 0 (a doc with k copies emits
    // exactly epochs 0..k-1)
    a.groupBy(r => (r.getString(0), r.getLong(1))).values.foreach { rows =>
      assert(rows.map(_.getLong(2)).sorted.toSeq === (0L until rows.length).toSeq)
    }

    // observed copies/doc per weight class ≈ the configured weight
    val srcCounts = graft.Tables.load(spark, sf, "documents")
      .groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val weights = Map(0 -> 2.5, 1 -> 1.0, 2 -> 0.4, 3 -> 1.5)
    val byClass = a.groupBy(r => r.getString(0).drop(3).toInt % 4)
    weights.foreach { case (cls, w) =>
      val emitted = byClass.getOrElse(cls, Array.empty).length.toLong
      val base = srcCounts.collect {
        case (s, n) if s.drop(3).toInt % 4 == cls => n
      }.sum
      if (base >= 20) {
        val rate = emitted.toDouble / base
        assert(math.abs(rate - w) < 0.35,
          s"class $cls: emitted $emitted over $base docs = $rate, want ≈ $w")
      }
    }
  }

  test("packShards on an empty corpus returns zero shards, no failure") {
    val empty = spark.range(0, 0).selectExpr("id as doc_id", "cast(1 as int) as n_toks")
    assert(Sampling.packShards(empty).collect().isEmpty)
    assert(Sampling.lastPackCuts.isEmpty)
  }

  test("per-source cap: at most K per source, deterministic, hash-ordered") {
    val df = Sampling.qSamplePerSource(spark, sf)
    val a = df.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2)))
    // windowless: the uniform draw is the TopK aggregate too
    assert(!df.queryExecution.executedPlan.toString.contains("Window"),
      "per-source cap must not plan a ranking window")
    // bit-identical to the ranking-window semantics
    val window = graft.Tables.load(spark, sf, "documents")
      .selectExpr("source", "doc_id",
        "pmod(pmod(doc_id, 1000000007) * 2654435769, 4294967296) as h")
      .selectExpr("source", "doc_id",
        "row_number() over (partition by source order by h, doc_id) as rk")
      .where("rk <= 10").orderBy("source", "rk").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2)))
    assert(a.toSeq === window.toSeq)
    val b = Sampling.qSamplePerSource(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2)))
    assert(a.toSeq === b.toSeq) // hash-deterministic, not rand()
    assert(a.nonEmpty)
    a.groupBy(_._1).foreach { case (src, rows) =>
      assert(rows.length <= 10, s"source $src over cap: ${rows.length}")
      // ranks are contiguous from 1 — a true quota, not a filtered sample
      assert(rows.map(_._3).sorted.toSeq === (1 to rows.length).toSeq)
    }
    // the cap binds for sources with >10 docs: selection is a strict
    // subset chosen by hash, so reruns pick the SAME subset (checked
    // above) and every over-quota source is cut to exactly 10
    val perSource = graft.Tables.load(spark, sf, "documents")
      .groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    perSource.filter(_._2 > 10).keys.foreach { src =>
      assert(a.count(_._1 == src) === 10, s"source $src not cut to quota")
    }
  }

  test("source cap: quality quota via TopK aggregate — no window at all") {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.ReusedExchangeExec
    import org.apache.spark.sql.execution.window.WindowExec
    val df = Sampling.qSourceCap(spark, sf)
    val got = df.collect()
    // the whole point vs qSamplePerSource: a hot source must NOT rank
    // through one task — the plan must carry zero WindowExec anywhere
    def windowsIn(p: SparkPlan): Seq[WindowExec] = p.collect {
      case w: WindowExec => Seq(w)
      case a: AdaptiveSparkPlanExec => windowsIn(a.executedPlan)
      case q: QueryStageExec => windowsIn(q.plan)
      case r: ReusedExchangeExec => windowsIn(r.child)
    }.flatten
    assert(windowsIn(df.queryExecution.executedPlan).isEmpty,
      "quota cap must be the bounded TopK aggregate, not a ranking window")

    // bit-identical to the ranking-window semantics (the oracle's form)
    val window = graft.llm.TextAnalysis.qualityScored(spark, sf)
      .selectExpr("source", "doc_id", "cast(quality as double) as quality",
        "row_number() over (partition by source " +
          "order by quality desc, doc_id) as rank")
      .where(s"rank <= ${Sampling.SourceCapK}")
      .selectExpr("source", "doc_id", "quality", "cast(rank as bigint) as rank")
      .orderBy("source", "rank")
    assert(got.toSeq === window.collect().toSeq)

    got.groupBy(_.getString(0)).foreach { case (src, rows) =>
      assert(rows.length <= Sampling.SourceCapK, s"source $src over cap")
      assert(rows.map(_.getLong(3)).sorted.toSeq
        === (1L to rows.length.toLong).toSeq, s"ranks not contiguous: $src")
    }
  }

  test("leakage-free split: no near-dup cluster ever spans two splits") {
    // Recompute the per-DOC assignment the aggregate query collapses:
    // split of every corpus member via its group key, then assert each
    // CC cluster lands in exactly one split.
    val labels = Dedup.clusterLabels(spark, sf)
      .selectExpr("id", "cluster").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels.nonEmpty, "fixture must produce near-dup clusters")
    def permille(k: Long): Long = ((k % 1000000007L) * 3267000013L) % 4294967296L % 1000L
    def splitOf(k: Long): String =
      if (permille(k) < 980) "train" else if (permille(k) < 990) "val" else "test"
    val clusterSplits = labels.groupBy(_._2).view.mapValues { members =>
      members.map { case (_, cl) => splitOf(cl) }.toSet
    }
    clusterSplits.foreach { case (cl, splits) =>
      assert(splits.size == 1, s"cluster $cl spans splits $splits")
    }

    // and the aggregate output is consistent: docs total = corpus size,
    // groups never exceed docs, split set is exactly the three names
    val got = Sampling.qSplitLeakfree(spark, sf).collect()
    val docs = graft.Tables.load(spark, sf, "documents").count()
    val variants = graft.Tables.load(spark, sf, "documents")
      .where("doc_id % 7 = 0").count()
    assert(got.map(_.getLong(1)).sum === docs + variants)
    got.foreach(r => assert(r.getLong(2) <= r.getLong(1),
      s"${r.getString(0)}: more groups than docs"))
    assert(got.map(_.getString(0)).toSet.subsetOf(Set("train", "val", "test")))

    // a cluster's members all sit in the split of their ROOT: spot-pin
    // via the per-doc recomputation against the aggregate's counts
    val perSplit = labels.keys.map(id => splitOf(labels(id))).toSeq
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    perSplit.foreach { case (split, n) =>
      val row = got.find(_.getString(0) == split)
      assert(row.nonEmpty && row.get.getLong(1) >= n,
        s"$split: aggregate counts fewer docs than clustered members alone")
    }
  }

  test("temperature mixing: derived rates smooth toward small sources, exact determinism") {
    val a = Sampling.qMixTemperature(spark, sf).collect()
    val b = Sampling.qMixTemperature(spark, sf).collect()
    assert(a.map(_.toSeq).toSeq === b.map(_.toSeq).toSeq, "must be hash-deterministic")
    assert(a.nonEmpty)
    a.foreach { r =>
      val (n, t, kept) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(t >= 0L && t <= 1000000L, s"t_ppm out of range: $t")
      assert(kept <= n, "kept more than the source holds")
    }
    // temperature property: keep-RATE is non-increasing in source size
    // (α = 0.5 < 1 means larger sources get proportionally less) —
    // compare the derived thresholds of the largest vs smallest source
    val bySize = a.sortBy(_.getLong(1))
    if (bySize.length >= 2) {
      val smallest = bySize.head
      val largest = bySize.last
      if (largest.getLong(1) > smallest.getLong(1))
        assert(smallest.getLong(2) >= largest.getLong(2),
          "smaller source must get at least the larger source's keep rate")
    }
  }

  test("sequence packing partitions the token stream into fixed-length sequences") {
    val seqs = Sampling.qSeqPack(spark, sf).collect()
    assert(seqs.nonEmpty)
    val totalToks = graft.Tables.load(spark, sf, "documents")
      .selectExpr("size(split(lower(text), ' ')) as n")
      .agg(org.apache.spark.sql.functions.sum("n")).head.getLong(0)
    // token partition: every token lands in exactly one sequence
    assert(seqs.map(_.getLong(2)).sum === totalToks)
    // contiguous ids from 0; every sequence but the tail holds exactly SeqLen
    assert(seqs.map(_.getLong(0)).toSeq === seqs.indices.map(_.toLong))
    seqs.dropRight(1).foreach(r => assert(r.getLong(2) === 2048L,
      s"interior sequence ${r.getLong(0)} holds ${r.getLong(2)} tokens"))
    assert(seqs.last.getLong(2) <= 2048L)
    // the first sequence cannot carry anything over; carried docs bound
    assert(seqs.head.getLong(3) === 0L)
    seqs.foreach(r => assert(r.getLong(3) <= 1L || r.getLong(1) >= r.getLong(3),
      "carried docs exceed contributing docs"))
  }

  test("sequence packing: a long document straddles boundaries with exact token splits") {
    // 3 docs: 100 toks, 5000 toks (spans seqs 0..2), 1000 toks
    val docs = spark.range(0, 3).selectExpr("id as doc_id",
      "cast(case id when 0 then 100 when 1 then 5000 else 1000 end as int) as n_toks")
    val got = Sampling.packSequences(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
    // stream: doc0 [0,100), doc1 [100,5100), doc2 [5100,6100)
    // seq0 [0,2048): doc0(100) + doc1(1948); seq1 [2048,4096): doc1(2048)
    // seq2 [4096,6100): doc1(1004) + doc2(1000) -> 2004 tokens, doc1 carried
    assert(got.toSeq === Seq(
      (0L, 2L, 2048L, 0L, 0L, 1L),
      (1L, 1L, 2048L, 1L, 1L, 1L),
      (2L, 2L, 2004L, 1L, 1L, 2L)))
  }

  test("sequence packing matches the single-window oracle semantics bit-for-bit") {
    val df = Sampling.qSeqPack(spark, sf)
    val single = graft.Tables.load(spark, sf, "documents")
      .selectExpr("doc_id", "size(split(lower(text), ' ')) as n_toks")
      .selectExpr("doc_id", "n_toks",
        "sum(n_toks) over (order by doc_id rows between unbounded preceding and current row) - n_toks as prior_toks")
      .where("n_toks > 0")
      .selectExpr("doc_id", "n_toks", "prior_toks",
        "explode(sequence(prior_toks div 2048, (prior_toks + n_toks - 1) div 2048)) as seq")
      .selectExpr("seq", "doc_id", "prior_toks",
        "least((seq + 1) * 2048, prior_toks + n_toks) - greatest(seq * 2048, prior_toks) as seq_toks")
      .groupBy("seq")
      .agg(
        org.apache.spark.sql.functions.expr("count(*) as n_docs"),
        org.apache.spark.sql.functions.expr("sum(seq_toks) as seq_tokens"),
        org.apache.spark.sql.functions.expr("sum(case when prior_toks < seq * 2048 then 1 else 0 end) as n_carried"),
        org.apache.spark.sql.functions.expr("min(doc_id) as first_doc"),
        org.apache.spark.sql.functions.expr("max(doc_id) as last_doc"))
      .orderBy("seq")
    assert(df.collect().toSeq === single.collect().toSeq)
  }
}
