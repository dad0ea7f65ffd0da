package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates the query registry from each module. Every entry in
  * `queries` that is SQL-expressible has a DuckDB oracle in `oracleSql`
  * with IDENTICAL output column names (the driver sorts columns by name
  * and hash-compares values).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    graft.queries.Relational.q01PricingSummary(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2.
    *
    * Builders are LAZY (constructing the DataFrame runs no job) with
    * three documented exceptions: `q_source_overlap` runs a bounded
    * single-column job at construction to refuse planning its
    * quadratic above the conf'd source bound
    * ([[graft.llm.CorpusStats.qSourceOverlap]]); the
    * connected-components family (`q_dedup_clusters`,
    * `q_dedup_keep_best*`, `q_split_leakfree`, `q_dedup_report`) runs
    * its iterative label rounds at construction — the result frame
    * consumes the converged final round;
    * and the BPE family (`q_bpe_*`) runs its merge rounds at
    * construction (each round's 1-row rule must be known to plan the
    * next round's pair count). The IVF/PQ quantizer seeds are a lazy
    * broadcast subtree since r20 (no construction-time collect).
    *
    * DEPLOYMENT CONF: several pipelines have byte-tiny but
    * expansion-heavy exchanges (capped LSH/shingle posting lists that
    * expand to ~C(df,2) pairs, BPE pair-count tails, ADC code joins).
    * AQE's byte-targeted partition coalescing funnels those exchanges
    * into 1-4 tasks at its default 1 MB floor; sessions embedding
    * these queries should set
    * `spark.sql.adaptive.coalescePartitions.minPartitionSize=256k`
    * (what graft.Bench/Prof/Sweep run with; measured full-suite A/B in
    * OPTIMIZATION_r19.md). The hottest site (the n-gram pair
    * expansion) is additionally width-pinned in code
    * ([[graft.llm.Dedup]] verifiedPairSets). */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.Relational.queries ++
      graft.queries.Temporal.queries ++
      graft.llm.CorpusStats.queries ++
      graft.llm.Dedup.queries ++
      graft.llm.DedupPipeline.queries ++
      graft.llm.IncrementalDedup.queries ++
      graft.llm.Similarity.queries ++
      graft.llm.Retrieval.queries ++
      graft.llm.TextAnalysis.queries ++
      graft.llm.Tokenizer.queries ++
      graft.llm.Sampling.queries ++
      graft.llm.Curate.queries ++
      graft.llm.Decontaminate.queries ++
      graft.llm.Features.queries ++
      graft.llm.Multimodal.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    graft.queries.Relational.oracleSql ++
      graft.queries.Temporal.oracleSql ++
      graft.llm.CorpusStats.oracleSql ++
      graft.llm.Dedup.oracleSql ++
      graft.llm.DedupPipeline.oracleSql ++
      graft.llm.IncrementalDedup.oracleSql ++
      graft.llm.Similarity.oracleSql ++
      graft.llm.Retrieval.oracleSql ++
      graft.llm.TextAnalysis.oracleSql ++
      graft.llm.Tokenizer.oracleSql ++
      graft.llm.Sampling.oracleSql ++
      graft.llm.Curate.oracleSql ++
      graft.llm.Decontaminate.oracleSql ++
      graft.llm.Features.oracleSql ++
      graft.llm.Multimodal.oracleSql
}
