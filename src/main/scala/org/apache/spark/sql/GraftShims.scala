package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Minimal bridge into `private[sql]` surface: Column ⇄ Expression for
  * libraries defining native Catalyst expressions (the conventional
  * extension-library shim; Spark 4 keeps these behind
  * classic.ExpressionUtils). */
object GraftShims {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** A read-capable V2 Table over an explicit parquet file list — the
    * planning surface our snapshot scans hand to Spark SQL (full
    * pushdown/pruning via the builtin parquet source). */
  def parquetTable(
      name: String,
      spark: SparkSession,
      paths: Seq[String],
      schema: org.apache.spark.sql.types.StructType)
      : org.apache.spark.sql.connector.catalog.Table =
    execution.datasources.v2.parquet.ParquetTable(
      name,
      spark.asInstanceOf[classic.SparkSession],
      new org.apache.spark.sql.util.CaseInsensitiveStringMap(
        java.util.Collections.emptyMap()),
      paths,
      Some(schema),
      classOf[execution.datasources.parquet.ParquetFileFormat])

  /** Like [[parquetTable]], but with file enumeration AND plan-time
    * file skipping served from manifest metadata: sizes ride in from
    * the commit (no driver filesystem listing) and pushed data filters
    * prune the listing through `prune` before the parquet source sees
    * it. The scan itself stays the stock V2 parquet path. */
  def prunedParquetTable(
      name: String,
      spark: SparkSession,
      files: Seq[(String, Long)],
      schema: org.apache.spark.sql.types.StructType,
      prune: Seq[org.apache.spark.sql.sources.Filter] => (String => Boolean),
      /** manifest-stats aggregation resolver ([[graft.engine
        * .MetadataAggregates]]): Some = answer count/min/max locally
        * with zero file reads; None = run the scan */
      metaAgg: org.apache.spark.sql.connector.expressions.aggregate.Aggregation =>
        Option[(org.apache.spark.sql.types.StructType,
          Array[org.apache.spark.sql.catalyst.InternalRow], Seq[String])] =
        _ => None)
      : org.apache.spark.sql.connector.catalog.Table = {
    val cs = spark.asInstanceOf[classic.SparkSession]
    new execution.datasources.GraftParquetTable(name, cs, files.map(_._1), schema,
      new execution.datasources.GraftFileIndex(cs, name, files, prune),
      files, prune, metaAgg)
  }

  /** Spark's own executor-side parquet write machinery for custom V2
    * `BatchWrite`s: `ParquetFileFormat.prepareWrite` configures the job
    * (write support, compression, field ids honored per session conf)
    * and returns the serializable per-task writer factory, exactly as
    * `FileFormatWriter` ships it to executors. */
  def parquetWriteSpec(
      spark: SparkSession,
      schema: org.apache.spark.sql.types.StructType,
      options: Map[String, String])
      : (execution.datasources.OutputWriterFactory,
         org.apache.spark.util.SerializableConfiguration) = {
    val cs = spark.asInstanceOf[classic.SparkSession]
    val job = org.apache.hadoop.mapreduce.Job.getInstance(cs.sessionState.newHadoopConf())
    val factory = new execution.datasources.parquet.ParquetFileFormat()
      .prepareWrite(cs, job, options, schema)
    // Iceberg conformance, not preference: the spec stores timestamps
    // as INT64 microseconds, but Spark's session default
    // (spark.sql.parquet.outputTimestampType=INT96) writes the
    // deprecated INT96 — which a spec-conformant foreign reader may
    // refuse, and whose parquet stats are dropped (so manifest bounds
    // for timestamp columns vanish and no scan can file-prune on
    // time). Force micros on the write job regardless of session conf;
    // ParquetWriteSupport reads the key from this hadoop conf.
    job.getConfiguration.set(
      org.apache.spark.sql.internal.SQLConf.PARQUET_OUTPUT_TIMESTAMP_TYPE.key,
      "TIMESTAMP_MICROS")
    (factory, new org.apache.spark.util.SerializableConfiguration(job.getConfiguration))
  }

  /** Spark's own executor-side parquet READ machinery for custom V2
    * `Batch` scans: `ParquetFileFormat.buildReaderWithPartitionValues`
    * returns the serializable per-task open function `FileScanRDD`
    * itself ships to executors (vectorized decode, field-id column
    * resolution per session conf, row-index generation). Batches are
    * declined (`OPTION_RETURNING_BATCH=false`), so the iterator yields
    * genuine per-row `InternalRow`s — the shape a delete-applying
    * reader filters row-by-row. `filters` land in the parquet reader
    * for row-group/page skipping; pass Nil when the caller re-evaluates
    * predicates itself. */
  def parquetReadFunc(
      spark: SparkSession,
      dataSchema: org.apache.spark.sql.types.StructType,
      requiredSchema: org.apache.spark.sql.types.StructType,
      filters: Seq[org.apache.spark.sql.sources.Filter])
      : execution.datasources.PartitionedFile => Iterator[catalyst.InternalRow] = {
    val cs = spark.asInstanceOf[classic.SparkSession]
    new execution.datasources.parquet.ParquetFileFormat().buildReaderWithPartitionValues(
      cs, dataSchema, new org.apache.spark.sql.types.StructType(), requiredSchema,
      filters,
      Map(execution.datasources.FileFormat.OPTION_RETURNING_BATCH -> "false"),
      cs.sessionState.newHadoopConf())
  }

  /** A split of one data file for [[parquetReadFunc]] (no partition
    * values, no locality hints — the manifest is the file inventory). */
  def partitionedFile(
      path: String, start: Long, length: Long, fileSize: Long)
      : execution.datasources.PartitionedFile =
    execution.datasources.PartitionedFile(
      catalyst.InternalRow.empty,
      org.apache.spark.paths.SparkPath.fromPathString(path),
      start, length, Array.empty, 0L, fileSize, Map.empty)

  /** The temporary column name the parquet reader populates with each
    * row's ordinal position within its file (the machinery behind
    * `_metadata.row_index`) — exact even under splits and row-group
    * skipping. */
  def rowIndexColumnName: String =
    execution.datasources.parquet.ParquetFileFormat.ROW_INDEX_TEMPORARY_COLUMN_NAME

  /** The session's effective shuffle-partition count — via SQLConf's
    * typed accessor, so a platform that sets
    * `spark.sql.shuffle.partitions` to a non-numeric vendor value
    * (e.g. "auto") resolves the same way Spark's own planner does
    * instead of NumberFormatException-ing a raw-string parse. */
  def numShufflePartitions(spark: SparkSession): Int =
    spark.asInstanceOf[classic.SparkSession].sessionState.conf.numShufflePartitions

  /** Session split sizing for custom file-batch planning:
    * (maxPartitionBytes, openCostInBytes). */
  def fileSplitConf(spark: SparkSession): (Long, Long) = {
    val conf = spark.asInstanceOf[classic.SparkSession].sessionState.conf
    (conf.filesMaxPartitionBytes, conf.filesOpenCostInBytes)
  }

  /** Codegen'd (interpreted-fallback) projection / predicate over bound
    * expressions — executor-side row shaping for custom readers. */
  def unsafeProjection(exprs: Seq[Expression]): catalyst.expressions.UnsafeProjection =
    catalyst.expressions.UnsafeProjection.create(exprs)
  def basePredicate(e: Expression): catalyst.expressions.BasePredicate =
    catalyst.expressions.Predicate.create(e)

  /** The underlying catalog table of an analyzer-wrapped row-level
    * operation target (`RowLevelOperationTable` is private[sql]) —
    * how optimizer rules recognize their own MERGE/UPDATE/DELETE
    * targets. */
  def rowLevelTargetOf(table: connector.catalog.Table)
      : Option[connector.catalog.Table] = table match {
    case t: connector.write.RowLevelOperationTable => Some(t.table)
    case _ => None
  }

  /** Analyze `cols` against `schema` and bind them to row ordinals:
    * returns executor-evaluable expressions (the analyzer inserts any
    * casts/coercions a manual binding would miss). Used to derive
    * partition tuples per row inside custom V2 writers. */
  def boundExpressions(
      spark: SparkSession,
      schema: org.apache.spark.sql.types.StructType,
      cols: Seq[Column]): Seq[Expression] = {
    val cs = spark.asInstanceOf[classic.SparkSession]
    val df = cs.createDataFrame(new java.util.ArrayList[Row](), schema)
    val analyzed = df.select(cols: _*).queryExecution.analyzed
    val project = analyzed.asInstanceOf[catalyst.plans.logical.Project]
    val input = project.child.output
    project.projectList.map(e =>
      catalyst.expressions.BindReferences.bindReference(
        e, catalyst.expressions.AttributeSeq(input)))
  }

  /** The analyzed query as an `InternalRow` RDD — the input side of
    * custom distributed write jobs (each task consumes its partition's
    * rows directly, no Row conversion). */
  def internalRdd(df: Dataset[Row])
      : org.apache.spark.rdd.RDD[catalyst.InternalRow] =
    df.asInstanceOf[classic.Dataset[Row]].queryExecution.toRdd

  /** Persisted logical-plan lineage cut WITHOUT a Row round trip: the
    * plan's `InternalRow` output becomes a persisted RDD wrapped in a
    * LEAF (`LogicalRDD`) DataFrame. Two distinct costs disappear for
    * iterative algorithms:
    *  - plans that reference the frame more than once (a pointer-jump
    *    self-join) stop doubling the LOGICAL plan per round, and
    *  - downstream plans embed a leaf instead of the frame's full
    *    upstream plan — `df.persist()` alone leaves every consumer
    *    carrying (and the CacheManager structurally re-comparing) the
    *    whole upstream tree at EVERY planning pass, which measured
    *    ~0.5-0.9 s/round against a cached LSH pair pipeline.
    * Rows are copied because the unsafe rows backing `toRdd` are
    * reused per partition. The returned RDD handle is the cache
    * owner, with TWO legitimate ownership modes:
    *  - ITERATION-SCOPED (connectedComponents): the caller unpersists
    *    the handle explicitly the moment the round supersedes it —
    *    GC/ContextCleaner reclaim would be too lazy for per-round
    *    corpus-sized intermediates that a single call accumulates;
    *  - QUERY-SCOPED (the ngram/keep-best-indexed signature leafs):
    *    the RETURNED FRAME owns the blocks for its whole (unknown)
    *    consumer lifetime, so there is no point at which the builder
    *    may unpersist; the ContextCleaner reclaims after the consumer
    *    drops the frame. Callers in this mode accept that repeated
    *    invocations hold storage until driver GC — fine for
    *    query-sized leafs, NOT for per-round loops. */
  def cachedLeaf(df: Dataset[Row])
      : (Dataset[Row], org.apache.spark.rdd.RDD[catalyst.InternalRow]) = {
    val ds = df.asInstanceOf[classic.Dataset[Row]]
    val rdd = ds.queryExecution.toRdd.map(_.copy())
    rdd.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    (ds.sparkSession.internalCreateDataFrame(rdd, ds.schema, isStreaming = false),
      rdd)
  }

  /** LogicalPlan → DataFrame on a live session (classic Dataset.ofRows
    * is private[sql]) — the hook custom commands use to execute a
    * stored/constructed plan. */
  def ofRows(spark: SparkSession, plan: catalyst.plans.logical.LogicalPlan)
      : Dataset[Row] =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** Resolve a configured V2 catalog plugin by name (None → the
    * session's current catalog) — the hook custom SQL commands use to
    * reach their owning catalog instance. */
  def catalogPlugin(spark: SparkSession, name: Option[String])
      : org.apache.spark.sql.connector.catalog.CatalogPlugin = {
    val mgr = spark.asInstanceOf[classic.SparkSession].sessionState.catalogManager
    name.map(mgr.catalog).getOrElse(mgr.currentCatalog)
  }

  /** True when `name` resolves to a configured catalog. */
  def isCatalogName(spark: SparkSession, name: String): Boolean =
    try { catalogPlugin(spark, Some(name)); true }
    catch { case _: Exception => false }

  /** Run `f` with catalyst's analyzer transform guard lifted — the
    * hook a resolution rule needs when it hand-recurses over the plan
    * (cycle-aware view expansion) instead of using `resolveOperators*`. */
  def allowTransformsInAnalyzer[T](f: => T): T =
    catalyst.plans.logical.AnalysisHelper.allowInvokingTransformsInAnalyzer(f)

  /** Register a SQL function on a LIVE session (the extensions route,
    * `spark.sql.extensions`, only applies at session construction). */
  def registerFunction(
      spark: SparkSession, name: String,
      builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[classic.SparkSession].sessionState.functionRegistry
      .registerFunction(
        org.apache.spark.sql.catalyst.FunctionIdentifier(name),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
          "graft.functions.GraftFunctions", name),
        builder)
}
