package graft.engine

import graft.catalog.{CatalogError, TableIdent}
import graft.core._
import org.apache.spark.sql.{Column, DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._

import java.util.UUID

/** Spark-side table operations through the catalog: the Surface-B
  * capabilities the reference certifies via iceberg-spark
  * (tests/python/tests/test_spark.py — INSERT, SELECT round-trip, MERGE,
  * branches/tags + time travel, compaction), re-expressed on our own
  * engine. Data files move directly between Spark and storage; only
  * metadata transits the catalog. Every write is an optimistic commit:
  * build against a base snapshot, assert the branch still points there,
  * retry on 409 with a refreshed base — the loop that makes concurrent
  * writers converge (SURVEY §7.5 #1).
  */
final class GraftTable(
    client: RestCatalogClient,
    prefix: String,
    ident: TableIdent,
    clock: () => Long = () => System.currentTimeMillis()) {

  private val MaxRetries = 20

  def metadata: TableMetadata = client.loadTable(prefix, ident).metadata

  // -------------------------------------------------------------- reads
  sealed trait Selector
  case object CurrentMain extends Selector
  final case class AtRef(name: String) extends Selector
  final case class AtSnapshot(id: Long) extends Selector

  /** Snapshot scan. Empty tables (and empty branches) read as an empty
    * DataFrame with the table schema — reference test_spark.py:96-123
    * requires empty scans to work. */
  def scan(spark: SparkSession, selector: Selector = CurrentMain): DataFrame = {
    val m = metadata
    resolveSnapshot(m, selector) match {
      case None => emptyDf(spark, m.currentSchema)
      case Some(s) =>
        // current reads use the CURRENT schema (old files resolve by
        // field id); time travel pins the snapshot's schema
        val schema = selector match {
          case CurrentMain => m.currentSchema
          case _ => s.schemaId.flatMap(m.schemas.get).getOrElse(m.currentSchema)
        }
        readFiles(spark, schema, Manifests.read(s.manifestList))
    }
  }

  private def readFiles(
      spark: SparkSession, schema: Schema,
      all: Seq[Manifests.DataFile]): DataFrame =
    GraftTable.readFiles(spark, schema, all)

  private def emptyDf(spark: SparkSession, schema: Schema): DataFrame =
    GraftTable.emptyDf(spark, schema)

  private def resolveSnapshot(m: TableMetadata, selector: Selector): Option[Snapshot] =
    selector match {
      case CurrentMain => m.currentSnapshot
      case AtRef(name) => Some(m.snapshotFor(name).getOrElse(
        throw CatalogError.notFound("RefNotFound", s"ref $name not found")))
      case AtSnapshot(id) => Some(m.snapshots.getOrElse(id,
        throw CatalogError.notFound("SnapshotNotFound", s"snapshot $id not found")))
    }

  /** Plan-time file listing for a snapshot (what a distributed scan
    * would hand to the scheduler). */
  def planFiles(selector: Selector = CurrentMain): Seq[Manifests.DataFile] =
    resolveSnapshot(metadata, selector)
      .map(s => Manifests.read(s.manifestList)).getOrElse(Nil)

  /** Snapshot scan with PLAN-TIME file pruning: only files whose
    * manifest stats / partition tuples might match `filters` are read
    * — the same [[StatsPruning.keeper]] the SQL read path and MERGE
    * runtime pruning use, exposed for programmatic consumers (the MV
    * refresh ticks). The programmatic [[scan]] is a multi-path v1
    * parquet read whose file list is fixed at construction, so a
    * row-level `.filter` on it never skips files; this variant prunes
    * the LISTING, which is what keeps a churn-localized tick's read at
    * O(candidate files) instead of the materialization's file count.
    * NARROWING only: a kept file can hold non-matching rows — callers
    * still apply their row-level predicate / exactness join. */
  def scanStatsPruned(
      spark: SparkSession,
      filters: Seq[org.apache.spark.sql.sources.Filter],
      selector: Selector = CurrentMain): DataFrame = {
    val m = metadata
    resolveSnapshot(m, selector) match {
      case None => emptyDf(spark, m.currentSchema)
      case Some(s) =>
        val schema = selector match {
          case CurrentMain => m.currentSchema
          case _ => s.schemaId.flatMap(m.schemas.get).getOrElse(m.currentSchema)
        }
        val parts = StatsPruning.partFields(m.partitionSpecs.values)
        val kept = Manifests.read(s.manifestList)
          .filter(StatsPruning.keeper(schema, parts, filters))
        readFiles(spark, schema, kept)
    }
  }

  /** Incremental append scan (CDC-style read): the rows ADDED by
    * snapshots after `fromSnapshotId` (exclusive) up to `toSnapshotId`
    * (inclusive; default = current). The consumer pattern: checkpoint
    * the snapshot id you processed, read forward from it next run —
    * at 100 TB this plans O(new shards), never a full-table diff.
    *
    * Semantics (same line Iceberg's incremental append scan draws):
    *  - `append` snapshots contribute exactly the manifest SHARDS they
    *    added — computed by diffing consecutive manifest LISTS
    *    (O(shards) driver work; appends carry the parent's shard paths
    *    unchanged, see [[Manifests]]), so only added shards pay
    *    content I/O;
    *  - `replace` (compaction) snapshots contribute nothing: they
    *    rewrite existing rows without logical change;
    *  - `delete`/`overwrite` snapshots in range throw — "what was
    *    appended" is undefined across row-level change;
    *  - `fromSnapshotId` must be an ancestor of the end snapshot
    *    (expired or cross-branch ids throw rather than silently
    *    over- or under-reading).
    */
  def scanIncremental(
      spark: SparkSession,
      fromSnapshotId: Long,
      toSnapshotId: Option[Long] = None): DataFrame = {
    val m = metadata
    val files = planFilesIncremental(fromSnapshotId, toSnapshotId)
    if (files.isEmpty) emptyDf(spark, m.currentSchema)
    else readFiles(spark, m.currentSchema, files)
  }

  /** Plan-time file listing for [[scanIncremental]] (public so tests
    * and schedulers can count what an incremental read would touch).
    *
    * `skipRowLevelChanges` relaxes the delete/overwrite throw: those
    * snapshots contribute NOTHING (the same line Iceberg's
    * `streaming-skip-delete-snapshots` / `-overwrite-snapshots` draw) —
    * an explicit opt-in for consumers that use the stream as a SIGNAL
    * (MV maintenance reads the changelog itself) or accept missing the
    * rows an overwrite added. */
  def planFilesIncremental(
      fromSnapshotId: Long,
      toSnapshotId: Option[Long] = None,
      skipRowLevelChanges: Boolean = false): Seq[Manifests.DataFile] = {
    val m = metadata
    val to = toSnapshotId match {
      case Some(id) => m.snapshots.getOrElse(id,
        throw CatalogError.notFound("SnapshotNotFound", s"snapshot $id not found"))
      case None => m.currentSnapshot.getOrElse(
        throw CatalogError.notFound("SnapshotNotFound", "table has no snapshots"))
    }
    if (!m.snapshots.contains(fromSnapshotId))
      throw CatalogError.notFound(
        "SnapshotNotFound", s"snapshot $fromSnapshotId not found")
    if (to.snapshotId == fromSnapshotId) return Nil

    // walk to -> from, reading each snapshot's manifest LIST once
    var chain = List.empty[Snapshot] // from-exclusive .. to, oldest first
    var cur = to
    while (cur.snapshotId != fromSnapshotId) {
      chain ::= cur
      cur = cur.parentSnapshotId.flatMap(m.snapshots.get).getOrElse(
        throw CatalogError.badRequest(
          s"snapshot $fromSnapshotId is not an ancestor of ${to.snapshotId} " +
            "(expired, or on another branch) — incremental scan needs a " +
            "contiguous append history"))
    }
    chain.foreach { s =>
      s.operation match {
        case Some("append") | Some("replace") => ()
        case _ if skipRowLevelChanges => ()
        case op => throw CatalogError.badRequest(
          s"incremental append scan undefined across snapshot ${s.snapshotId} " +
            s"(operation ${op.getOrElse("unknown")}): row-level change in range")
      }
    }
    var parentPaths =
      Manifests.readEntries(m.snapshots(fromSnapshotId).manifestList)
        .map(_.path).toSet
    val added = Vector.newBuilder[Manifests.ManifestEntry]
    chain.foreach { s =>
      val entries = Manifests.readEntries(s.manifestList)
      if (s.operation.contains("append"))
        added ++= entries.filterNot(e => parentPaths(e.path))
      parentPaths = entries.map(_.path).toSet
    }
    // appends never add delete shards; filter defensively anyway
    Manifests.filesOf(added.result().distinctBy(_.path))
      .filterNot(_.isDeleteFile)
  }

  /** CHANGELOG scan — the row-level CDC view `scanIncremental` can't
    * give: every change committed after `fromSnapshotId` (exclusive)
    * up to `toSnapshotId` (inclusive; default = current main head) as
    * table rows tagged `_change_type` ('insert' | 'delete'),
    * `_change_ordinal` (commit position within the range) and
    * `_commit_snapshot_id`. An updated row appears as its old row
    * deleted + its new row inserted — the delta shape a downstream
    * sync or incremental materialization consumes.
    *
    * Per-snapshot semantics (file-diff based, like Iceberg's
    * changelog):
    *  - `append`: rows of the ADDED data files → inserts;
    *  - `replace` (compaction/manifest rewrite): nothing — a physical
    *    rewrite changes no logical row;
    *  - MoR `delete`/`merge`: added data files → inserts; rows killed
    *    by the ADDED delete files → deletes, computed as the exact
    *    visibility diff (parent-visible minus current-visible) over
    *    ONLY the affected data files — position-delete targets by
    *    file key, equality deletes scoping older-sequence files;
    *  - removed data files (CoW rewrites, truncate) → their
    *    parent-visible rows as deletes.
    *
    * Scale: per commit the scan reads its CHURN, never the table —
    * added files, plus only data files its new delete files can
    * touch: position-delete targets by file key, equality deletes by
    * sequence bound AND the delete rows' key bounds against manifest
    * stats (the upsert runtime file filter pointed at delete files;
    * `convert_equality_deletes` shrinks this further by making them
    * file-scoped). The visibility diff is one keyed exceptAll over
    * those bounded reads; the full range is a union of independent
    * per-commit plans. [[GraftTable.lastChangelogDiff]] records the
    * last delete-diff's candidate-vs-affected file counts. */
  def changelogScan(
      spark: SparkSession,
      fromSnapshotId: Long,
      toSnapshotId: Option[Long] = None): DataFrame = {
    import org.apache.spark.sql.functions.lit
    val m = metadata
    val to = toSnapshotId match {
      case Some(id) => m.snapshots.getOrElse(id,
        throw CatalogError.notFound("SnapshotNotFound", s"snapshot $id not found"))
      case None => m.currentSnapshot.getOrElse(
        throw CatalogError.notFound("SnapshotNotFound", "table has no snapshots"))
    }
    if (!m.snapshots.contains(fromSnapshotId))
      throw CatalogError.notFound(
        "SnapshotNotFound", s"snapshot $fromSnapshotId not found")
    val schema = m.currentSchema
    def withChange(df: DataFrame, t: String, ord: Int, snap: Long): DataFrame =
      df.withColumn("_change_type", lit(t))
        .withColumn("_change_ordinal", lit(ord))
        .withColumn("_commit_snapshot_id", lit(snap))
    val empty = withChange(emptyDf(spark, schema), "insert", 0, 0L).limit(0)
    if (to.snapshotId == fromSnapshotId) return empty

    var chain = List.empty[Snapshot] // from-exclusive .. to, oldest first
    var cur = to
    while (cur.snapshotId != fromSnapshotId) {
      chain ::= cur
      cur = cur.parentSnapshotId.flatMap(m.snapshots.get).getOrElse(
        throw CatalogError.badRequest(
          s"snapshot $fromSnapshotId is not an ancestor of ${to.snapshotId} " +
            "(expired, or on another branch) — a changelog needs a " +
            "contiguous history"))
    }

    val parts = chain.zipWithIndex.flatMap { case (s, ord) =>
      if (s.operation.contains("replace")) Nil
      else {
        val parentFiles = s.parentSnapshotId.flatMap(m.snapshots.get)
          .map(p => Manifests.read(p.manifestList)).getOrElse(Nil)
        val curFiles = Manifests.read(s.manifestList)
        val parentPaths = parentFiles.map(_.path).toSet
        val curPaths = curFiles.map(_.path).toSet
        val addedData = curFiles.filter(f => !f.isDeleteFile && !parentPaths(f.path))
        val removedData = parentFiles.filter(f => !f.isDeleteFile && !curPaths(f.path))
        val addedDeletes = curFiles.filter(f => f.isDeleteFile && !parentPaths(f.path))
        val parentDeletes = parentFiles.filter(_.isDeleteFile)

        val inserts =
          if (addedData.isEmpty) Nil
          else Seq(withChange(
            // same-commit delete files ride along: a foreign snapshot
            // (register adopts any legal Iceberg tree) may add
            // position deletes targeting data files added in the SAME
            // commit — those rows were never visible and must not
            // appear as inserts. readFiles' sequence semantics make
            // this exact: position deletes apply at seq >= data seq
            // (suppressing same-commit targets), equality deletes at
            // seq > data seq (same-commit adds correctly unaffected),
            // and deletes aimed at parent files can't match added
            // rows' file keys. Our own writers never produce the
            // shape, so the ride-along is usually a no-op join on a
            // churn-sized read.
            readFiles(spark, schema, addedData ++ addedDeletes),
            "insert", ord, s.snapshotId))
        val rowDeletes =
          if (addedDeletes.isEmpty) Nil
          else {
            // affected data files only: position-delete targets by
            // normalized file key (one bounded distinct over the
            // delete files — O(referenced files) driver-side, the
            // same order as the manifest list already held, CAPPED by
            // conf: a wide-churn commit referencing millions of files
            // must not materialize them all on the driver, so past
            // the cap the diff falls back to sequence-bound scoping —
            // every parent data file is a candidate (broader read,
            // identical answer; the same correct-but-broader fallback
            // the equality path uses when key bounds are underivable)
            val posFiles = addedDeletes.filter(_.isPositionDeleteFile)
            val maxPosKeys = GraftTable.changelogMaxPosDeleteKeys(spark)
            val posKeyRows: Array[String] =
              if (posFiles.isEmpty) Array.empty
              else spark.read.parquet(posFiles.map(_.path): _*)
                .select("file_path").distinct().limit(maxPosKeys + 1)
                .collect().map(r => r.getString(0))
            val posOverCap = posKeyRows.length > maxPosKeys
            val posKeys: Set[String] =
              if (posOverCap) Set.empty
              else posKeyRows.map(GraftDeleteCache.fileKey).toSet
            val posAffected: Manifests.DataFile => Boolean =
              if (posOverCap) _ => true
              else f => posKeys(GraftDeleteCache.fileKey(f.path))
            // equality deletes scope older-sequence files, NARROWED by
            // the key bounds of the delete rows against manifest stats
            // (the upsert runtime-file-filter, aimed at delete files) —
            // one bounded aggregation over churn-sized delete files per
            // key group. Renamed-away key columns fall back to the
            // sequence bound alone (correct, just broader).
            val eqFiles = addedDeletes.filterNot(_.isPositionDeleteFile)
            val eqAffected: Manifests.DataFile => Boolean =
              if (eqFiles.isEmpty) _ => false
              else {
                val parts = StatsPruning.partFields(m.partitionSpecs.values)
                val preds = eqFiles
                  .groupBy(f => (f.equalityIds, f.equalityColumns)).toSeq
                  .map { case ((ids, legacyNames), dfs) =>
                    val keyNames =
                      if (ids.nonEmpty) ids.flatMap(id =>
                        schema.fieldById(id).map(_.name))
                      else legacyNames
                    val maxSeq = dfs.map(_.seq).max
                    val rows = spark.read.parquet(dfs.map(_.path): _*)
                    val prunable = keyNames.nonEmpty &&
                      keyNames.forall(rows.columns.contains)
                    val keep =
                      if (!prunable) (_: Manifests.DataFile) => true
                      else GraftTable.sourceKeyFilters(rows, keyNames) match {
                        case Some(filters) =>
                          StatsPruning.keeper(schema, parts, filters)
                        case None => (_: Manifests.DataFile) => true
                      }
                    (f: Manifests.DataFile) => f.seq < maxSeq && keep(f)
                  }
                f => preds.exists(_(f))
              }
            val affected = parentFiles.filter(f => !f.isDeleteFile &&
              (posAffected(f) || eqAffected(f)))
            GraftTable.lastChangelogDiff = Some(GraftTable.ChangelogDiffPlan(
              parentFiles.count(!_.isDeleteFile), affected.size))
            if (affected.isEmpty) Nil
            else {
              val visParent = readFiles(spark, schema, affected ++ parentDeletes)
              val visCur = readFiles(
                spark, schema, affected ++ curFiles.filter(_.isDeleteFile))
              Seq(withChange(
                visParent.exceptAll(visCur), "delete", ord, s.snapshotId))
            }
          }
        val fileDeletes =
          if (removedData.isEmpty) Nil
          else Seq(withChange(
            readFiles(spark, schema, removedData ++ parentDeletes),
            "delete", ord, s.snapshotId))
        inserts ++ rowDeletes ++ fileDeletes
      }
    }
    parts.reduceOption(_ unionAll _).getOrElse(empty)
  }

  /** Partition-pruned snapshot scan: only data files whose partition
    * tuple passes `keep` are read — the manifest prune happens at plan
    * time on the driver, so a selective partition predicate touches a
    * fraction of the files regardless of table size (the 100 TB lever).
    */
  def scanPruned(
      spark: SparkSession,
      keep: Map[String, String] => Boolean,
      selector: Selector = CurrentMain): DataFrame = {
    val m = metadata
    val snap = resolveSnapshot(m, selector)
    val schema = selector match {
      case CurrentMain => m.currentSchema
      case _ =>
        snap.flatMap(_.schemaId).flatMap(m.schemas.get).getOrElse(m.currentSchema)
    }
    // shard-level prune first (skips whole manifest files), then the
    // residual file-level filter; delete files always ride along
    val kept = snap.map(s => Manifests.readPruned(s.manifestList, keep)).getOrElse(Nil)
    readFiles(spark, schema, kept)
  }

  /** Metadata tables: `.files`, `.partitions`, `.refs`, `.snapshots`,
    * `.history` (reference test_spark.py:149-357 surface). `.files` and
    * `.partitions` are DISTRIBUTED scans of the manifest shards — the
    * driver holds only the shard entry list, executors parse the shard
    * JSON — so a 10⁶-file table lists without materializing a driver
    * Seq (Iceberg serves its metadata tables the same way). The
    * low-cardinality tables (refs/snapshots/history) stay driver-side. */
  def metadataTable(
      spark: SparkSession, name: String,
      keepTuple: Map[String, String] => Boolean = _ => true): DataFrame = {
    import spark.implicits._
    val m = metadata
    name match {
      case "files" => filesTable(spark, m, keepTuple)
      case "partitions" =>
        filesTable(spark, m, keepTuple)
          .groupBy(col("partition"))
          .agg(count(lit(1)).as("file_count"),
            sum(col("record_count")).as("record_count"))
          .orderBy(col("partition"))
      case "refs" =>
        m.refs.toSeq.sortBy(_._1).map { case (n, r) =>
          (n, r.refType, r.snapshotId, r.minSnapshotsToKeep, r.maxSnapshotAgeMs, r.maxRefAgeMs)
        }.toDF("name", "type", "snapshot_id", "min_snapshots_to_keep",
          "max_snapshot_age_in_ms", "max_reference_age_in_ms")
      case "snapshots" =>
        m.snapshots.values.toSeq.sortBy(_.sequenceNumber).map(s =>
          (new java.sql.Timestamp(s.timestampMs), s.snapshotId, s.parentSnapshotId,
            s.sequenceNumber, s.summary.getOrElse("operation", ""), s.manifestList))
          .toDF("committed_at", "snapshot_id", "parent_id", "sequence_number",
            "operation", "manifest_list")
      case "history" =>
        m.snapshotLog.map(e =>
          (new java.sql.Timestamp(e.timestampMs), e.snapshotId,
            m.currentSnapshotId.contains(e.snapshotId)))
          .toDF("made_current_at", "snapshot_id", "is_current_ancestor")
      case "manifests" =>
        m.currentSnapshot.map(s => Manifests.readEntries(s.manifestList))
          .getOrElse(Nil)
          .map(e => (e.path, e.fileCount, e.rowCount, e.hasDeletes,
            e.partition.map(_.toSeq.sorted
              .map { case (k, v) => s"$k=$v" }.mkString("/")).orNull))
          .toDF("path", "added_data_files_count", "added_rows_count",
            "has_deletes", "partition_summary")
      case other =>
        throw CatalogError.badRequest(s"unknown metadata table: $other")
    }
  }

  /** `.files` as a distributed read: the shard paths (already in hand
    * from the manifest list) parallelize to the executors, and each
    * task parses its shards through [[Manifests.read]] — which resolves
    * the METADATA backend from the FileIO registry, so shards on an
    * object store read through the registered backend (executors need
    * [[graft.catalog.GraftSparkPlugin]] on a real cluster), and JSON
    * and avro shards (externally-written snapshots) parse uniformly. A
    * partition-scoped query (`WHERE partition = 'k=v'`) passes
    * `keepTuple`, and only the matching SHARDS are read — the prune
    * rides the list entries' tuples, zero shard I/O for skipped
    * partitions (mixed and delete shards always read; the SQL layer
    * re-applies the filter exactly). */
  private def filesTable(
      spark: SparkSession, m: TableMetadata,
      keepTuple: Map[String, String] => Boolean = _ => true): DataFrame = {
    val allEntries = m.currentSnapshot.toSeq
      .flatMap(s => Manifests.readEntries(s.manifestList))
    val kept = allEntries.filter(e =>
      e.hasDeletes || e.partition.forall(keepTuple))
    GraftTable.lastMetaPlan = Some(GraftTable.MetaPlan(kept.size, allEntries.size))
    val out = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("file_path",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("file_size_in_bytes",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("record_count",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("partition",
        org.apache.spark.sql.types.StringType)))
    val paths = kept.map(_.path)
    if (paths.isEmpty)
      return spark.createDataFrame(new java.util.ArrayList[Row](), out)
    val parallelism =
      math.max(1, math.min(paths.size, spark.sparkContext.defaultParallelism))
    val rows = spark.sparkContext.parallelize(paths, parallelism).flatMap(p =>
      Manifests.read(p).map(f => Row(
        f.path, f.sizeBytes, f.recordCount, GraftTable.renderTuple(f.partition))))
    spark.createDataFrame(rows, out)
  }

  // ------------------------------------------------------------- writes
  /** INSERT INTO: append a new snapshot on `branch` (copy-on-write:
    * the new manifest lists previous files ++ written files). */
  def append(df: DataFrame, branch: String = TableMetadata.MainBranch,
      extraSummary: Map[String, String] = Map.empty,
      extraProperties: Map[String, String] = Map.empty): TableMetadata = {
    val written = writeDataFiles(df)
    commitLoop(branch, "append", extraSummary, extraProperties)(base =>
      (carriedEntries(base), written))
  }

  /** Replace the branch's entire content with `df` (the commit style
    * behind MERGE/compaction). `expectedBase` pins the snapshot the
    * caller computed from; a concurrent commit in between fails with
    * 409 rather than silently dropping the other writer's rows. */
  def overwriteAll(
      df: DataFrame,
      expectedBase: Option[Long],
      operation: String = "overwrite",
      branch: String = TableMetadata.MainBranch,
      /** true when the CALLER already laid out df (compaction/z-order):
        * skips write.distribution-mode repartitioning and the default
        * sort, both of which would silently destroy that layout */
      preserveLayout: Boolean = false,
      /** properties committed ATOMICALLY with the new content — the
        * incremental-materialization checkpoint rides here, same
        * exactly-once construct as the streaming high-water mark */
      extraProperties: Map[String, String] = Map.empty): TableMetadata = {
    val written = GraftTable.writeDataFiles(df, metadata,
      preserveLayout = preserveLayout)
    commitOnce(branch, operation, expectedBase, _ => (Nil, written),
      extraProperties = extraProperties)
  }

  /** MERGE INTO (upsert form: WHEN MATCHED UPDATE SET *, WHEN NOT
    * MATCHED INSERT * — the shape reference test_spark.py:64-81 runs)
    * as a DELTA: matched target rows become position-delete records
    * (their `(_file, _pos)` addresses from the lineage-bearing scan),
    * the source lands as new data files, and the commit carries every
    * untouched file over — O(source + matched) work, never an O(table)
    * rewrite. Same shape as the SQL MERGE path (SupportsDelta). */
  def upsert(spark: SparkSession, source: DataFrame, keys: Seq[String]): TableMetadata = {
    val m = metadata
    val base = m.currentSnapshotId
    val cols = m.currentSchema.fields.map(_.name)
    // the source is consumed up to three times (key-bounds aggregation,
    // match join, data write) — persist so an expensive source subquery
    // computes ONCE; the first consumer materializes the cache
    val src = source.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val aligned = src.select(cols.map(c => col(c)): _*)
      val deleteFiles = m.currentSnapshot.toSeq.flatMap { snap =>
        // runtime file pruning: one tiny aggregation over the SOURCE
        // derives per-key bounds, and only target files whose manifest
        // stats / partition tuples can hold a matching key join at all —
        // a 1-row MERGE on a 100 TB table reads candidate files, not the
        // table (Iceberg's runtime file filtering, derived source-side)
        val all = Manifests.read(snap.manifestList)
        val keyFilters = GraftTable.sourceKeyFilters(src, keys)
        val candidates = keyFilters match {
          case None => all // bound derivation unavailable: read everything
          case Some(Nil) => Nil // empty source: nothing can match
          case Some(fs) =>
            val parts = StatsPruning.partFields(m.partitionSpecs.values)
            all.filter(StatsPruning.keeper(m.currentSchema, parts, fs))
        }
        GraftTable.lastUpsertPlan = Some(GraftTable.UpsertPlan(
          candidates.count(!_.isDeleteFile), all.count(!_.isDeleteFile)))
        if (candidates.forall(_.isDeleteFile)) Nil
        else {
          val target = GraftTable.readFiles(
            spark, m.currentSchema, candidates, lineage = true)
          val joinCond = keys.map(k => target(k) <=> src(k)).reduce(_ && _)
          val matched = target.join(src, joinCond, "left_semi")
            .select(
              col(GraftTable.FileCol).as("file_path",
                SchemaBridge.fieldIdMetadata(GraftTable.PosDeleteFilePathId)),
              col(GraftTable.PosCol).as("pos",
                SchemaBridge.fieldIdMetadata(GraftTable.PosDeletePosId)))
          val deleteDir = s"${m.location}/deletes/${UUID.randomUUID()}"
          GraftTable.toDataFiles(ParquetBatchWrite.writeJob(matched, deleteDir, None))
            .map(_.copy(content = Manifests.ContentPositionDeletes))
        }
      }
      val dataFiles = writeDataFiles(aligned)
      commitDelta(deleteFiles ++ dataFiles, "merge", base)
    } finally src.unpersist(blocking = false)
  }

  /** DELETE FROM ... WHERE (delta): matching rows become position-
    * delete records addressed by the lineage-bearing scan — O(matched
    * rows) written, untouched files carried over, never an O(table)
    * rewrite. SQL DELETE removes rows where the condition is TRUE; rows
    * where it evaluates NULL survive (`coalesce(cond, false)`). A
    * no-match delete commits nothing. Compaction materializes the
    * deletes away. */
  def deleteWhere(
      spark: SparkSession, condition: Column,
      keep: Manifests.DataFile => Boolean = _ => true): TableMetadata = {
    val m = metadata
    val base = m.currentSnapshotId
    m.currentSnapshot match {
      case None => m
      case Some(snap) =>
        // `keep` prunes the match-finding scan to candidate files
        // (stats/partition bounds from the DELETE predicate) — a
        // selective DELETE reads a fraction of the table, and rows in
        // skipped files provably don't match, so no delete is lost
        val target = GraftTable.readFiles(
          spark, m.currentSchema,
          Manifests.read(snap.manifestList).filter(keep), lineage = true)
        val matched = target.filter(coalesce(condition, lit(false)))
          .select(
            col(GraftTable.FileCol).as("file_path",
              SchemaBridge.fieldIdMetadata(GraftTable.PosDeleteFilePathId)),
            col(GraftTable.PosCol).as("pos",
              SchemaBridge.fieldIdMetadata(GraftTable.PosDeletePosId)))
        val dir = s"${m.location}/deletes/${UUID.randomUUID()}"
        val deleteFiles = GraftTable
          .toDataFiles(ParquetBatchWrite.writeJob(matched, dir, None))
          .map(_.copy(content = Manifests.ContentPositionDeletes))
        if (deleteFiles.isEmpty) m
        else commitDelta(deleteFiles, "delete", base)
    }
  }

  /** DELETE FROM with no predicate (truncate): metadata-only commit of
    * an empty content set — no delete records, no rewrite. */
  def truncate(): TableMetadata = {
    val m = metadata
    commitFiles(Nil, "delete", m.currentSnapshotId)
  }

  /** DELETE (merge-on-read): write the distinct key tuples of
    * `toDelete` as an equality-delete file and commit it ALONGSIDE the
    * existing data — no data-file rewrite. Scans anti-join the delete
    * rows against older-sequence data files; `rewriteDataFiles`
    * materializes and drops the delete files. This is the
    * O(deleted-keys) write path a 100 TB table needs for small deletes,
    * vs copy-on-write's O(table). */
  def deleteByKeys(
      spark: SparkSession, keys: Seq[String], toDelete: DataFrame,
      branch: String = TableMetadata.MainBranch): TableMetadata = {
    val m = metadata
    val schemaCols = m.currentSchema.fields.map(_.name).toSet
    require(keys.nonEmpty && keys.forall(schemaCols), s"unknown key columns: $keys")
    val dir = s"${m.location}/deletes/${UUID.randomUUID()}"
    val byName = m.currentSchema.fields.map(f => f.name -> f).toMap
    val keyRows = toDelete
      .select(keys.map(k => col(k).as(k, SchemaBridge.fieldIdMetadata(byName(k).id))): _*)
      .distinct()
    val deleteFiles = GraftTable
      .toDataFiles(ParquetBatchWrite.writeJob(keyRows, dir, routing = None))
      .map(_.copy(content = Manifests.ContentEqualityDeletes,
        // keys recorded BY FIELD ID (Iceberg equality_ids): scans
        // resolve them to then-current names, so RENAME COLUMN on a
        // key column cannot strand the delete files
        equalityIds = keys.map(k => byName(k).id)))
    commitLoop(branch, "delete")(base => (carriedEntries(base), deleteFiles))
  }

  /** Churn-sized keyed MERGE (delete+insert): equality-delete every key
    * tuple of `deleteKeys` (MoR — an O(touched keys) key file, no data
    * rewrite) and land `rows` as new data files, in ONE commit that
    * also carries `extraProperties` — the incremental-materialization
    * write path. The same-commit pairing is exact by Iceberg delete
    * scoping: equality deletes apply only to STRICTLY older sequence
    * numbers, so the deletes retire the keys' previous rows and never
    * touch the rows landing beside them. An MV refresh tick over a
    * 10⁹-key MV with 100 touched keys writes 100 delete tuples + 100
    * rows, never the 10⁹-row table ([[overwriteAll]] would).
    * `deleteKeys` may cover keys with no replacement row (a group
    * folded to zero drops out). `expectedBase` pins the snapshot the
    * fold read its previous state from — concurrent writers 409.
    * Delete-file debt compacts away via `rewrite_data_files`, exactly
    * as MERGE/DELETE debt does. */
  def replaceKeys(
      spark: SparkSession, keys: Seq[String],
      deleteKeys: DataFrame, rows: DataFrame,
      expectedBase: Option[Long],
      operation: String = "overwrite",
      branch: String = TableMetadata.MainBranch,
      extraProperties: Map[String, String] = Map.empty): TableMetadata = {
    val m = metadata
    val schemaCols = m.currentSchema.fields.map(_.name).toSet
    require(keys.nonEmpty && keys.forall(schemaCols), s"unknown key columns: $keys")
    val byName = m.currentSchema.fields.map(f => f.name -> f).toMap
    val dir = s"${m.location}/deletes/${UUID.randomUUID()}"
    val keyRows = deleteKeys
      .select(keys.map(k => col(k).as(k, SchemaBridge.fieldIdMetadata(byName(k).id))): _*)
      .distinct()
    val deleteFiles = m.currentSnapshot match {
      case None => Nil // nothing stored yet: nothing to retire
      case Some(_) => GraftTable
        .toDataFiles(ParquetBatchWrite.writeJob(keyRows, dir, routing = None))
        .map(_.copy(content = Manifests.ContentEqualityDeletes,
          equalityIds = keys.map(k => byName(k).id)))
    }
    val dataFiles = GraftTable.writeDataFiles(rows, m)
    commitOnce(branch, operation, expectedBase,
      base => (carriedEntries(base), deleteFiles ++ dataFiles),
      extraProperties = extraProperties)
  }

  /** CALL system.rewrite_data_files: compact small files into
    * `targetFileCount` without changing content (reference
    * test_spark.py:330-357). Content-identical ⇒ committed as a
    * "replace" snapshot.
    *
    * With `zorderBy`, the rewrite CLUSTERS rows by the interleaved
    * quantile-rank z-value ([[graft.functions.ZOrder]]) instead of
    * hash-repartitioning: `repartitionByRange` on z (sampled range
    * bounds — no global sort barrier beyond Spark's range exchange)
    * then an in-partition sort, so every output file covers a small
    * hyper-rectangle of the clustered columns' value space and
    * manifest-stats pruning skips files for predicates on ANY of them.
    * One extra sketch pass for the quantile cuts; everything else is
    * the same single rewrite job. */
  def rewriteDataFiles(
      spark: SparkSession,
      targetFileCount: Int = 1,
      zorderBy: Seq[String] = Nil): TableMetadata = {
    val m = metadata
    val df = scan(spark)
    val compacted =
      if (zorderBy.isEmpty) df.repartition(targetFileCount)
      else {
        val z = graft.functions.ZOrder.clusterColumn(df, zorderBy)
        df.withColumn("__graft_z", z)
          .repartitionByRange(targetFileCount, col("__graft_z"))
          .sortWithinPartitions("__graft_z")
          .drop("__graft_z")
      }
    // z-order IS the layout decision: the write path must not
    // re-distribute (write.distribution-mode) or re-sort (default sort
    // order) the clustered frame. Plain compaction keeps both — its
    // repartition is only a file-count choice, not an ordering.
    overwriteAll(compacted, m.currentSnapshotId, operation = "replace",
      preserveLayout = zorderBy.nonEmpty)
  }

  /** CALL system.rewrite_position_delete_files: compact the table's
    * position-delete files WITHOUT touching data. MoR DELETE/MERGE
    * traffic accumulates one small delete file per task per commit,
    * and scans pay one set-load per applicable file — the file COUNT
    * is the read-side tax. This procedure reads every live
    * position-delete row once, DROPS rows whose target data file left
    * the snapshot (dead pointers from partition overwrites /
    * compactions), dedupes (file_path, pos), and lands the result as
    * `targetFileCount` fresh delete files in one commit that retires
    * the old ones — O(delete rows), never the O(table) data rewrite
    * `rewrite_data_files` costs. Content-identical ⇒ "replace"; the
    * new files take the commit's sequence number, which preserves
    * applicability exactly (a position delete is born with a sequence
    * ≥ its target's, and paths are never reused, so raising the
    * sequence cannot activate anything new).
    *
    * Concurrency: the compacted source list is pinned up front; the
    * commit loop drops exactly those paths from whatever base it
    * lands on, so delete files committed concurrently carry
    * untouched. If a concurrent commit retired a compacted source's
    * targets, the merged rows become dead pointers — harmless no-ops
    * at scan, collected by the next compaction. */
  def rewritePositionDeleteFiles(
      spark: SparkSession, targetFileCount: Int = 1): TableMetadata = {
    val m = metadata
    m.currentSnapshot match {
      case None => m
      case Some(snap) =>
        val all = Manifests.filesOf(Manifests.readEntries(snap.manifestList))
        val posFiles = all.filter(_.isPositionDeleteFile)
        if (posFiles.isEmpty) return m
        val compacted = posFiles.map(_.path).toSet
        import spark.implicits._
        val live = all.filter(_.content == Manifests.ContentData)
          .map(f => GraftDeleteCache.fileKey(f.path)).toDF("target_key")
        val rows = spark.read.parquet(posFiles.map(_.path): _*)
          .select(
            col("file_path").as("file_path",
              SchemaBridge.fieldIdMetadata(GraftTable.PosDeleteFilePathId)),
            col("pos").as("pos",
              SchemaBridge.fieldIdMetadata(GraftTable.PosDeletePosId)))
          .withColumn("target_key", GraftTable.fileKey(col("file_path")))
          .join(live, Seq("target_key"), "left_semi")
          .select("file_path", "pos")
          .distinct()
          .repartition(math.max(targetFileCount, 1))
        val dir = s"${m.location}/deletes/${UUID.randomUUID()}"
        val newFiles = GraftTable
          .toDataFiles(ParquetBatchWrite.writeJob(rows, dir, None))
          .map(_.copy(content = Manifests.ContentPositionDeletes))
        commitRetiringFiles("replace", compacted, newFiles)
    }
  }

  /** Commit that RETIRES the pinned delete-file `retired` paths and
    * lands `newFiles`, carrying everything else — INCLUDING delete
    * files committed concurrently (the retired set is pinned, never
    * recomputed per attempt). Shards can mix data and delete files:
    * a shard holding a retired path is read once and its survivors
    * re-recorded with their own sequence numbers; all other shards
    * carry verbatim. */
  private def commitRetiringFiles(
      operation: String,
      retired: Set[String],
      newFiles: Seq[Manifests.DataFile]): TableMetadata =
    commitLoop(TableMetadata.MainBranch, operation)(base => {
      val carried = Seq.newBuilder[Manifests.ManifestEntry]
      val extra = Seq.newBuilder[Manifests.DataFile]
      carriedEntries(base).foreach { e =>
        if (!e.hasDeletes) carried += e
        else {
          val files = Manifests.filesOf(Seq(e))
          if (files.exists(f => retired(f.path)))
            extra ++= files.filterNot(f => retired(f.path))
          else carried += e
        }
      }
      (carried.result(), newFiles ++ extra.result())
    })

  /** CALL system.convert_equality_deletes: rewrite every equality-
    * delete file as position-delete rows addressing the exact rows it
    * deletes — content-identical now AND forever: an equality delete
    * only ever applies to data files sequenced below its own, all of
    * which exist at conversion time, and files appended later are
    * untouched by both forms. After conversion scans pay an O(1)
    * row-index set probe instead of hashing every row's key tuple
    * against every applicable equality set, and
    * [[rewritePositionDeleteFiles]] can fold ALL delete state into
    * one file. Key columns resolve by FIELD ID (the same rename-safe
    * resolution the scan uses), so conversion is correct across
    * RENAME COLUMN — spec-pinned. Rows already position-deleted may
    * convert too (a duplicate (file, pos) is a no-op at scan).
    *
    * The matching scan mirrors [[readFiles]]'s equality application
    * exactly — one multi-path scan per key-set with per-file
    * sequences from a broadcast — but keeps the SEMI side (the rows
    * the anti-join would drop). */
  def convertEqualityDeletes(
      spark: SparkSession, targetFileCount: Int = 1): TableMetadata = {
    val m = metadata
    m.currentSnapshot match {
      case None => m
      case Some(snap) =>
        val schema = m.currentSchema
        val all = Manifests.filesOf(Manifests.readEntries(snap.manifestList))
        val eqFiles = all.filter(_.content == Manifests.ContentEqualityDeletes)
        if (eqFiles.isEmpty) return m
        val datas = all.filter(_.content == Manifests.ContentData)
        val retired = eqFiles.map(_.path).toSet
        if (datas.isEmpty)
          return commitRetiringFiles("replace", retired, Nil)
        import spark.implicits._
        val seqDf = datas.map(f => (GraftDeleteCache.fileKey(f.path), f.seq))
          .toDF("__seq_file", "__data_seq")
        val base = spark.read.schema(SchemaBridge.toSpark(schema))
          .parquet(datas.map(_.path): _*)
          .withColumn(GraftTable.FileCol, col("_metadata.file_path"))
          .withColumn(GraftTable.PosCol, col("_metadata.row_index"))
          .withColumn("__seq_file", GraftTable.fileKey(col(GraftTable.FileCol)))
          .join(broadcast(seqDf), "__seq_file")
        var matched: DataFrame = null
        eqFiles.groupBy(f => (f.equalityIds, f.equalityColumns))
          .foreach { case ((ids, legacyNames), dfiles) =>
            val keyFields =
              if (ids.nonEmpty) ids.map(id => schema.fieldById(id).getOrElse(
                sys.error(s"equality-delete key field id $id missing from schema")))
              else legacyNames.map(n => schema.fieldByName(n).getOrElse(
                sys.error(s"equality-delete key column $n missing from schema")))
            val keys = keyFields.map(_.name)
            val delSchema = org.apache.spark.sql.types.StructType(keyFields.map(f =>
              org.apache.spark.sql.types.StructField(f.name,
                SchemaBridge.toSpark(f.fieldType), nullable = true,
                SchemaBridge.fieldIdMetadata(f.id))))
            val delSeqDf = dfiles
              .map(f => (GraftDeleteCache.fileKey(f.path), f.seq))
              .toDF("__del_seq_file", "__del_seq")
            val delRows = spark.read.schema(delSchema)
              .parquet(dfiles.map(_.path): _*)
              .withColumn("__del_seq_file",
                GraftTable.fileKey(col("_metadata.file_path")))
              .join(broadcast(delSeqDf), "__del_seq_file")
              .select(keys.map(k => col(k).as(s"__del_$k")) :+ col("__del_seq"): _*)
            val cond = keys.map(k => base(k) <=> delRows(s"__del_$k")).reduce(_ && _) &&
              delRows("__del_seq") > base("__data_seq")
            val hit = base.join(delRows, cond, "left_semi")
              .select(
                col(GraftTable.FileCol).as("file_path",
                  SchemaBridge.fieldIdMetadata(GraftTable.PosDeleteFilePathId)),
                col(GraftTable.PosCol).as("pos",
                  SchemaBridge.fieldIdMetadata(GraftTable.PosDeletePosId)))
            matched = if (matched == null) hit else matched.unionByName(hit)
          }
        val rows = matched.distinct().repartition(math.max(targetFileCount, 1))
        val dir = s"${m.location}/deletes/${UUID.randomUUID()}"
        val newFiles = GraftTable
          .toDataFiles(ParquetBatchWrite.writeJob(rows, dir, None))
          .map(_.copy(content = Manifests.ContentPositionDeletes))
        commitRetiringFiles("replace", retired, newFiles)
    }
  }

  /** Partition-scoped INSERT OVERWRITE (the static `PARTITION (p='v')`
    * clause, arriving as a filter-scoped V2 overwrite): drops exactly
    * the data files whose IDENTITY partition values satisfy `filters`,
    * carries everything else byte-untouched, and lands `df` as the
    * partitions' new content — an O(affected + new files) commit,
    * never a table rewrite. Shard entries matching wholly drop at the
    * ENTRY level (no shard read); mixed/legacy shards are read once
    * and their survivors re-recorded with their own sequence numbers.
    * Delete files always carry (they key by content — a stale target
    * simply stops matching; new files outsequence them regardless).
    *
    * Exactness over convenience: the predicate must be a conjunction
    * of equalities / IN on columns that are identity partition fields
    * in EVERY spec naming them, and every data file's tuple must
    * DECIDE it — a file written before the partition field existed
    * aborts the operation with a clear error rather than silently
    * leaving half the partition behind. */
  def overwritePartitions(
      df: DataFrame,
      filters: Seq[org.apache.spark.sql.sources.Filter],
      branch: String = TableMetadata.MainBranch): TableMetadata = {
    val m = metadata
    val pred = GraftTable.partitionPredicate(m, filters).fold(
      why => throw new UnsupportedOperationException(
        s"INSERT OVERWRITE with this condition cannot be partition-scoped " +
          s"($why); supported: AND of =, <=>, IN on identity partition " +
          s"columns. Condition: ${filters.mkString(", ")}"),
      identity)
    val written = GraftTable.writeDataFiles(df, m)
    commitLoop(branch, "overwrite")(base => {
      val (carried, extra) = splitCarried(carriedEntries(base), pred)
      (carried, written ++ extra)
    })
  }

  /** Dynamic partition overwrite (`partitionOverwriteMode=dynamic` /
    * `writeTo.overwritePartitions()`): replace exactly the partition
    * tuples PRESENT in the freshly-written files — the Hive-dynamic
    * semantics. `written` comes from a distributed
    * [[ParquetBatchWrite]] commit (per-task inventory, tuples ride the
    * commit messages); the drop predicate is full-tuple membership, so
    * every file decides (pre-evolution tuples simply never match a
    * current-spec tuple and survive). An empty write replaces nothing.
    */
  def overwriteDynamic(
      written: Seq[Manifests.DataFile],
      branch: String = TableMetadata.MainBranch): TableMetadata = {
    if (written.isEmpty) return metadata
    val tuples = written.map(_.partition).toSet
    commitLoop(branch, "overwrite")(base => {
      val (carried, extra) =
        splitCarried(carriedEntries(base), pt => Some(tuples.contains(pt)))
      (carried, written ++ extra)
    })
  }

  /** Entry-level split for a partition-scoped replace: (carried
    * entries, per-file survivors re-recorded from shards the entry
    * tuple could not decide). `drop(tuple) = None` = undecidable. */
  private def splitCarried(
      entries: Seq[Manifests.ManifestEntry],
      drop: Map[String, String] => Option[Boolean])
      : (Seq[Manifests.ManifestEntry], Seq[Manifests.DataFile]) = {
    def undecidable(what: String): Nothing =
      throw new UnsupportedOperationException(
        s"partition overwrite cannot decide $what (file predates the " +
          "partition field or uses a non-identity spec) — run CALL " +
          "system.rewrite_data_files to normalize the layout first")
    val carried = Seq.newBuilder[Manifests.ManifestEntry]
    val extra = Seq.newBuilder[Manifests.DataFile]
    entries.foreach { e =>
      if (e.hasDeletes) carried += e
      else e.partition match {
        case Some(pt) => drop(pt) match {
          case Some(true) => () // whole shard replaced
          case Some(false) => carried += e
          case None => undecidable(s"shard ${e.path}")
        }
        case None =>
          Manifests.filesOf(Seq(e)).foreach { f =>
            if (f.isDeleteFile) extra += f
            else drop(f.partition) match {
              case Some(true) => ()
              case Some(false) => extra += f
              case None => undecidable(s"file ${f.path}")
            }
          }
      }
    }
    (carried.result(), extra.result())
  }

  /** CALL system.rewrite_manifests: re-shard the current snapshot's
    * manifest tree into fresh partition-grouped shards — same data
    * files (paths, sequence numbers, stats, delete files all carried
    * byte-exact), new grouping. A long-lived table accumulates one
    * shard set per commit plus mixed overflow shards; planning cost
    * and shard-level pruning both degrade with that fragmentation. At
    * 100 TB the manifest tree IS the planning hot path — this compacts
    * it back to ≤[[Manifests.MaxShardsPerCommit]] homogeneous shards
    * and makes every shard partition-prunable again. Metadata-only:
    * no data file is read or written; query results are unchanged. */
  def rewriteManifests(branch: String = TableMetadata.MainBranch): TableMetadata = {
    val m = metadata
    if (m.snapshotFor(branch).isEmpty) return m
    commitLoop(branch, "replace")(base =>
      (Nil, base.map(s => Manifests.read(s.manifestList)).getOrElse(Nil)))
  }

  /** CALL system.rollback_to_snapshot / set_current_snapshot: point
    * the main branch at `snapshotId`. Rollback requires the target to
    * be an ancestor of the current snapshot (undo recent commits);
    * set_current_snapshot accepts any snapshot the table retains.
    * Metadata-only commit guarded against concurrent writers by the
    * branch-head requirement. */
  def setCurrentSnapshot(
      snapshotId: Long, requireAncestor: Boolean = false): TableMetadata = {
    val m = metadata
    if (!m.snapshots.contains(snapshotId))
      throw CatalogError.badRequest(s"unknown snapshot: $snapshotId")
    if (requireAncestor) {
      val ancestors = Iterator.iterate(m.currentSnapshotId)(
        _.flatMap(id => m.snapshots.get(id).flatMap(_.parentSnapshotId)))
        .takeWhile(_.isDefined).map(_.get).toSet
      if (!ancestors.contains(snapshotId))
        throw CatalogError.badRequest(
          s"snapshot $snapshotId is not an ancestor of the current snapshot " +
            "(use set_current_snapshot for non-linear moves)")
    }
    client.commitTable(prefix, ident,
      Seq(TableRequirement.AssertRefSnapshotId(
        TableMetadata.MainBranch, m.currentSnapshotId)),
      Seq(TableUpdate.SetSnapshotRef(
        TableMetadata.MainBranch, snapshotId, SnapshotRefType.Branch))).metadata
  }

  /** CALL system.fast_forward: move `branch` to `toRef`'s head iff
    * that head is a DESCENDANT of the branch's current head — the
    * merge-without-merge publish step of a branch workflow (audit on a
    * staging branch, then fast-forward main onto it). A non-ancestor
    * head is rejected loudly (that move needs cherry-picks or an
    * explicit set_current_snapshot, never a silent history swap). A
    * branch that does not exist yet is created at the target head —
    * the Iceberg procedure's convention. Metadata-only commit, guarded
    * by the branch-head requirement against concurrent writers. */
  def fastForward(branch: String, toRef: String): TableMetadata = {
    val m = metadata
    val toHead = m.refs.getOrElse(toRef,
      throw CatalogError.badRequest(s"unknown ref: $toRef")).snapshotId
    val curHead = m.refs.get(branch).map { r =>
      if (r.refType != SnapshotRefType.Branch)
        throw CatalogError.badRequest(s"cannot fast-forward tag $branch")
      r.snapshotId
    }
    curHead.foreach { c =>
      if (c != toHead) {
        val ancestorsOfTarget = Iterator.iterate(Option(toHead))(
          _.flatMap(id => m.snapshots.get(id).flatMap(_.parentSnapshotId)))
          .takeWhile(_.isDefined).map(_.get).toSet
        if (!ancestorsOfTarget.contains(c))
          throw CatalogError.badRequest(
            s"$branch (at $c) is not an ancestor of $toRef's head $toHead " +
              "— not a fast-forward")
      }
    }
    if (curHead.contains(toHead)) m
    else client.commitTable(prefix, ident,
      Seq(TableRequirement.AssertRefSnapshotId(branch, curHead)),
      Seq(TableUpdate.SetSnapshotRef(
        branch, toHead, SnapshotRefType.Branch))).metadata
  }

  /** CALL system.cherrypick_snapshot: apply ONE append snapshot's
    * added files on top of the current main head as a NEW commit —
    * the selective-publish half of a branch workflow (the snapshot
    * usually lives on a staging branch or was orphaned by a
    * rollback). Only `append` snapshots are cherry-pickable ("what
    * this snapshot added" is well-defined exactly there; row-level
    * change is not replayable against a moved base — same line
    * Iceberg draws). The added set is the manifest-LIST diff against
    * the snapshot's own parent (O(shards) driver work, no data I/O),
    * and the files re-enter with the new commit's sequence number —
    * they are logically new on this branch. Picking a snapshot that
    * is already an ancestor of main is rejected: it would append the
    * same rows twice with no signal. */
  def cherrypickSnapshot(snapshotId: Long): TableMetadata = {
    val m0 = metadata
    val snap = m0.snapshots.getOrElse(snapshotId,
      throw CatalogError.badRequest(s"unknown snapshot: $snapshotId"))
    if (!snap.operation.contains("append"))
      throw CatalogError.badRequest(
        s"cherrypick_snapshot supports append snapshots only; " +
          s"$snapshotId is ${snap.operation.getOrElse("unknown")}")
    val parentPaths = snap.parentSnapshotId
      .flatMap(m0.snapshots.get)
      .map(p => Manifests.readEntries(p.manifestList).map(_.path).toSet)
      .getOrElse(Set.empty[String])
    val added = Manifests.filesOf(
      Manifests.readEntries(snap.manifestList).filterNot(e => parentPaths(e.path)))
    // appends never carry delete shards; guard loudly anyway
    require(added.forall(!_.isDeleteFile),
      s"snapshot $snapshotId unexpectedly adds delete files")
    commitLoop(TableMetadata.MainBranch, "append",
      extraSummary = Map("source-snapshot-id" -> snapshotId.toString)) { base =>
      base.foreach { b =>
        val ancestors = Iterator.iterate(Option(b.snapshotId))(
          _.flatMap(id => metadata.snapshots.get(id).flatMap(_.parentSnapshotId)))
          .takeWhile(_.isDefined).map(_.get).toSet
        if (ancestors.contains(snapshotId))
          throw CatalogError.badRequest(
            s"snapshot $snapshotId is already an ancestor of main — " +
              "cherry-picking it would duplicate its rows")
      }
      val carried = base.map(s => Manifests.readEntries(s.manifestList)).getOrElse(Nil)
      (carried, added.map(_.copy(seq = Manifests.UnassignedSeq)))
    }
  }

  /** expire_snapshots maintenance: remove snapshots older than the
    * cutoff that no ref points at (ref targets and the current snapshot
    * always survive). Metadata-only commit; data files of expired
    * snapshots are left for a separate orphan sweep, like the
    * reference's no-purge drop. */
  def expireSnapshots(olderThanMs: Long, retainLast: Int = 1): TableMetadata = {
    val m = metadata
    // retain_last: the newest N ancestors of the current snapshot stay
    // regardless of age (the Iceberg-standard guard against an
    // older_than cutoff in the future expiring the whole history and
    // stranding time travel/rollback)
    val retained = {
      var keep = List.empty[Long]
      var cur = m.currentSnapshotId
      while (keep.size < math.max(retainLast, 1) && cur.isDefined) {
        keep ::= cur.get
        cur = m.snapshots.get(cur.get).flatMap(_.parentSnapshotId)
      }
      keep.toSet
    }
    val pinned = m.refs.values.map(_.snapshotId).toSet ++
      m.currentSnapshotId ++ retained
    val removable = m.snapshots.values
      .filter(s => s.timestampMs < olderThanMs && !pinned.contains(s.snapshotId))
      .map(_.snapshotId).toSeq.sorted
    if (removable.isEmpty) m
    else client.commitTable(prefix, ident, Nil,
      Seq(TableUpdate.RemoveSnapshots(removable))).metadata
  }

  /** CALL system.remove_orphan_files: delete data-plane files under
    * the table's data/ and deletes/ directories that NO snapshot
    * references and that are older than `olderThanMs` — the
    * complementary sweep to the reference's no-purge DROP
    * (tables.rs:556 leaves files behind by design; something must
    * reclaim them). Safety: the age cutoff keeps in-flight writers'
    * not-yet-committed files alive (default 3 days, Iceberg's
    * convention), unknown mtimes are never deleted, and referenced
    * paths compare scheme-normalized. Metadata-only — no commit, no
    * snapshot change. Returns the exact deleted count plus a bounded
    * sorted path sample ([[GraftTable.OrphanSweepResult]]).
    *
    * DISTRIBUTED like the `.files` machinery — a table-scale reclaim
    * (the post-DROP case is millions of files) never funnels through
    * the driver:
    *  - referenced paths: the driver holds only the per-snapshot shard
    *    ENTRY lists, dedupes shard paths across snapshots (carried
    *    shards repeat in every child snapshot — one read, not one per
    *    snapshot), and executors parse the shards into a path
    *    DataFrame;
    *  - candidates: executors list the data/ and deletes/ trees and
    *    probe ages IN the listing task (no per-file driver round
    *    trips);
    *  - the sweep set is a LEFT ANTI join on normalized path — keyed
    *    shuffle, O(files) but parallel;
    *  - deletion happens IN the anti-join's output tasks; the driver
    *    receives one bounded (count, sample) summary per partition —
    *    the full orphan path list never exists driver-side.
    * Executors resolve backends from the FileIO registry, so a real
    * cluster needs [[graft.catalog.GraftSparkPlugin]] — same contract
    * as the distributed metadata tables. */
  def removeOrphanFiles(
      spark: SparkSession,
      olderThanMs: Long = System.currentTimeMillis() - 3L * 24 * 3600 * 1000)
      : GraftTable.OrphanSweepResult = {
    val m = metadata
    GraftTable.sweepOrphans(spark, m.location,
      m.snapshots.values.map(_.manifestList).toSeq, olderThanMs)
  }

  /** Commit ALREADY-WRITTEN data files as the branch's complete new
    * content (the hook for external distributed writers, e.g. the V2
    * [[ParquetBatchWrite]] behind SQL MERGE/UPDATE). `expectedBase` pins
    * the snapshot the rewrite was computed from — concurrent commits
    * 409 instead of losing rows. */
  def commitFiles(
      files: Seq[Manifests.DataFile],
      operation: String,
      expectedBase: Option[Long],
      branch: String = TableMetadata.MainBranch): TableMetadata =
    commitOnce(branch, operation, expectedBase, _ => (Nil, files))

  /** Commit a row-level DELTA (new data files + delete files) ON TOP of
    * the branch's current content: every untouched file carries over
    * into the new manifest unchanged, so a 1-row MERGE costs O(changed
    * rows) data write + O(file count) manifest metadata — never an
    * O(table) rewrite. `expectedBase` pins the snapshot the delta was
    * computed against (position deletes address rows of those exact
    * files); a concurrent commit 409s instead of corrupting. */
  def commitDelta(
      files: Seq[Manifests.DataFile],
      operation: String,
      expectedBase: Option[Long],
      branch: String = TableMetadata.MainBranch): TableMetadata =
    commitOnce(branch, operation, expectedBase, base => (carriedEntries(base), files))

  /** CREATE TAG / CREATE BRANCH at the current main snapshot. */
  def createRef(name: String, refType: String,
      maxRefAgeMs: Option[Long] = None): TableMetadata = {
    val m = metadata
    val snapId = m.currentSnapshotId.getOrElse(
      throw CatalogError.badRequest("cannot create a ref on an empty table"))
    client.commitTable(prefix, ident, Nil, Seq(
      TableUpdate.SetSnapshotRef(name, snapId, refType, maxRefAgeMs = maxRefAgeMs)))
      .metadata
  }

  // ------------------------------------------------------------ commits
  /** The base snapshot's manifest entries, carried verbatim into a
    * child commit — untouched shards are immutable and shared across
    * snapshots, so a commit's manifest I/O is O(its own files). */
  private def carriedEntries(base: Option[Snapshot]): Seq[Manifests.ManifestEntry] =
    base.map(s => Manifests.readEntries(s.manifestList)).getOrElse(Nil)

  private def commitLoop(branch: String, operation: String,
      extraSummary: Map[String, String] = Map.empty,
      extraProperties: Map[String, String] = Map.empty)(
      delta: Option[Snapshot] => (Seq[Manifests.ManifestEntry], Seq[Manifests.DataFile]))
      : TableMetadata = {
    var attempt = 0
    while (true) {
      val cur = metadata
      val base = cur.snapshotFor(branch)
      val (carried, newFiles) = delta(base)
      try return commitOnceAgainst(cur, branch, operation, base, carried, newFiles,
        extraSummary, extraProperties)
      catch {
        case e: CatalogError if e.code == 409 && attempt < MaxRetries => attempt += 1
      }
    }
    sys.error("unreachable")
  }

  private def commitOnce(
      branch: String, operation: String, expectedBase: Option[Long],
      delta: Option[Snapshot] => (Seq[Manifests.ManifestEntry], Seq[Manifests.DataFile]),
      extraProperties: Map[String, String] = Map.empty)
      : TableMetadata = {
    val cur = metadata
    val base = expectedBase.map(id => cur.snapshots.getOrElse(id,
      throw CatalogError.conflict("SnapshotNotFound", s"base snapshot $id vanished")))
    val (carried, newFiles) = delta(base)
    commitOnceAgainst(cur, branch, operation, base, carried, newFiles,
      extraProperties = extraProperties)
  }

  private def commitOnceAgainst(
      cur: TableMetadata, branch: String, operation: String,
      base: Option[Snapshot], carried: Seq[Manifests.ManifestEntry],
      newFiles: Seq[Manifests.DataFile],
      extraSummary: Map[String, String] = Map.empty,
      extraProperties: Map[String, String] = Map.empty): TableMetadata = {
    val snapId = java.util.concurrent.ThreadLocalRandom.current().nextLong(1L, Long.MaxValue)
    // files added by THIS commit get its sequence number (MoR delete
    // scoping); carried-over shards keep theirs untouched
    val files = newFiles.map(f =>
      if (f.seq == Manifests.UnassignedSeq) f.copy(seq = cur.lastSequenceNumber + 1) else f)
    val manifestLoc = Manifests.writeCommit(
      s"${cur.location}/metadata", snapId, carried, files,
      iceberg = Some(IcebergAvro.Ctx(
        cur.currentSchema, cur.partitionSpecs, cur.defaultSpecId,
        snapId, base.map(_.snapshotId), cur.lastSequenceNumber + 1)))
    val snapshot = Snapshot(
      snapId,
      base.map(_.snapshotId),
      cur.lastSequenceNumber + 1,
      clock(),
      manifestLoc,
      Map(
        "operation" -> operation,
        // DATA files/rows only — delete files are subtractions, not
        // content (delete shards are homogeneous, so entry-level
        // hasDeletes separates them exactly; legacy mixed entries
        // over-count until compaction)
        "total-data-files" ->
          (carried.filterNot(_.hasDeletes).map(_.fileCount).sum +
            files.count(!_.isDeleteFile)).toString,
        "total-records" ->
          (carried.filterNot(_.hasDeletes).map(_.rowCount).sum +
            files.filterNot(_.isDeleteFile).map(_.recordCount).sum).toString,
        "total-delete-files" ->
          (carried.filter(_.hasDeletes).map(_.fileCount).sum +
            files.count(_.isDeleteFile)).toString,
        // added-* = THIS commit's own writes (Iceberg's standard
        // summary fields) — the observable half of churn-sized
        // commits: an incremental MV tick's added-records is bounded
        // by its touched keys, never the MV's row count
        "added-data-files" -> files.count(!_.isDeleteFile).toString,
        "added-records" ->
          files.filterNot(_.isDeleteFile).map(_.recordCount).sum.toString,
        "added-delete-files" -> files.count(_.isDeleteFile).toString) ++
        extraSummary,
      Some(cur.currentSchemaId))
    val refType =
      if (cur.refs.get(branch).exists(_.refType == SnapshotRefType.Tag))
        throw CatalogError.badRequest(s"cannot write to tag $branch")
      else SnapshotRefType.Branch
    client.commitTable(prefix, ident,
      Seq(TableRequirement.AssertRefSnapshotId(branch, base.map(_.snapshotId))),
      Seq(TableUpdate.AddSnapshot(snapshot),
        TableUpdate.SetSnapshotRef(branch, snapId, refType)) ++
        // properties ride in the SAME commit as the snapshot (used for
        // the streaming high-water mark: atomically exactly-once)
        (if (extraProperties.nonEmpty)
          Seq(TableUpdate.SetProperties(extraProperties)) else Nil)).metadata
  }

  // --------------------------------------------------------- data files
  /** Write df as parquet under a fresh data/ subdirectory, stamped and
    * partitioned per the table's current metadata (see the companion's
    * [[GraftTable.writeDataFiles]]). */
  private def writeDataFiles(df: DataFrame): Seq[Manifests.DataFile] =
    GraftTable.writeDataFiles(df, metadata)
}

object GraftTable {
  /** How many data files the last upsert's match-finding scan read vs
    * the snapshot total — the observable half of runtime file pruning
    * (specs assert candidates ≪ total for selective sources). */
  final case class UpsertPlan(candidates: Int, total: Int)
  @volatile var lastUpsertPlan: Option[UpsertPlan] = None

  /** Last changelog delete-diff's file bound: how many of the parent
    * snapshot's data files the new delete files could touch (the
    * visibility diff reads only `affected`). Observability for specs
    * and run logs, like [[lastUpsertPlan]]. */
  final case class ChangelogDiffPlan(candidateFiles: Int, affectedFiles: Int)
  @volatile var lastChangelogDiff: Option[ChangelogDiffPlan] = None

  /** Cumulative data files handed to programmatic [[readFiles]] scans
    * this JVM — the observability hook for plan-time file pruning on
    * the NON-SQL read path (specs bound a churn-localized tick's
    * listing against the base's file count). Reset before the window
    * you mean to measure. */
  val plannedDataFiles = new java.util.concurrent.atomic.AtomicLong

  /** Cap on the per-commit distinct position-delete TARGET keys the
    * changelog diff materializes on the driver. O(referenced files) is
    * the same order the driver already holds in manifests, but a
    * wide-churn foreign commit can reference 10⁶ files in its delete
    * rows; past the cap the diff scopes by sequence bound instead —
    * every parent data file becomes a visibility-diff candidate
    * (broader executor read, identical rows out; spec-pinned with the
    * cap forced to 0). */
  val ChangelogMaxPosDeleteKeysConf = "spark.graft.changelog.maxPosDeleteKeys"
  private val CHANGELOG_MAX_POS_DELETE_KEYS = 100000
  private[engine] def changelogMaxPosDeleteKeys(
      spark: SparkSession): Int = {
    val n = spark.conf.get(ChangelogMaxPosDeleteKeysConf,
      CHANGELOG_MAX_POS_DELETE_KEYS.toString).toInt
    require(n >= 0, s"$ChangelogMaxPosDeleteKeysConf must be non-negative, got $n")
    n
  }

  /** Compile an overwrite condition into a partition-TUPLE predicate:
    * `Right(eval)` where `eval(tuple)` is Some(matches) or None when
    * the tuple cannot decide (missing field). `Left(reason)` when the
    * condition shape / column transforms make file-exact evaluation
    * impossible. Only columns that are IDENTITY partition fields in
    * every spec naming them qualify — for those, equality against the
    * rendered tuple value IS row equality ([[ParquetBatchWrite]]'s
    * rendering; dates via their ISO form, nulls via the hive marker).
    */
  private[engine] def partitionPredicate(
      m: TableMetadata, filters: Seq[org.apache.spark.sql.sources.Filter])
      : Either[String, Map[String, String] => Option[Boolean]] = {
    import org.apache.spark.sql.sources._
    val NullMarker = "__HIVE_DEFAULT_PARTITION__"
    val allFields = m.partitionSpecs.values.flatMap(_.fields).toSeq
    def pname(col: String): Either[String, String] =
      m.currentSchema.fieldByName(col).toRight(s"unknown column $col").flatMap { f =>
        val idNames = allFields.filter(pf =>
          pf.sourceId == f.id && pf.transform == Transform.Identity)
          .map(_.name).distinct
        idNames match {
          case Seq(n) if allFields.filter(_.name == n).forall(pf =>
            pf.sourceId == f.id && pf.transform == Transform.Identity) =>
            Right(n)
          case Seq(_) => Left(s"partition name for $col was not always identity")
          case _ => Left(s"$col is not an identity partition column")
        }
      }
    def render(v: Any): Either[String, String] = v match {
      case null => Right(NullMarker)
      case d: java.sql.Date => Right(d.toString)
      case d: java.time.LocalDate => Right(d.toString)
      case _: java.sql.Timestamp | _: java.time.Instant |
           _: java.time.LocalDateTime => Left("timestamp partition equality")
      case s: String if s == NullMarker =>
        Left("value collides with the null partition marker")
      case other => Right(other.toString)
    }
    def eq(col: String, v: Any, nullSafe: Boolean)
        : Either[String, Map[String, String] => Option[Boolean]] =
      if (v == null && !nullSafe) Right(_ => Some(false)) // x = NULL: never
      else for { n <- pname(col); rv <- render(v) } yield
        (t: Map[String, String]) => t.get(n).map(_ == rv)
    def compile(f: Filter): Either[String, Map[String, String] => Option[Boolean]] =
      f match {
        case And(l, r) => for { cl <- compile(l); cr <- compile(r) } yield
          (t: Map[String, String]) =>
            for { a <- cl(t); b <- cr(t) } yield a && b
        case EqualTo(a, v) => eq(a, v, nullSafe = false)
        case EqualNullSafe(a, v) => eq(a, v, nullSafe = true)
        case In(a, vs) => pname(a).flatMap { n =>
          val rendered = vs.toSeq.filter(_ != null).foldLeft(
            Right(Set.empty[String]): Either[String, Set[String]]) { (acc, v) =>
            for { s <- acc; r <- render(v) } yield s + r
          }
          rendered.map(set =>
            (t: Map[String, String]) => t.get(n).map(pv =>
              pv != NullMarker && set.contains(pv)))
        }
        case AlwaysTrue() => Right(_ => Some(true))
        case other => Left(s"unsupported condition ${other.getClass.getSimpleName}")
      }
    filters.foldLeft(
      Right((_: Map[String, String]) => Some(true)): Either[String,
        Map[String, String] => Option[Boolean]]) { (acc, f) =>
      for { ca <- acc; cf <- compile(f) } yield
        (t: Map[String, String]) => for { a <- ca(t); b <- cf(t) } yield a && b
    }
  }

  /** Manifest shards parsed vs total by the last `.files`/`.partitions`
    * metadata-table scan — observable shard-level pruning. */
  final case class MetaPlan(shards: Int, total: Int)
  @volatile var lastMetaPlan: Option[MetaPlan] = None

  /** A partition tuple rendered the way the `.files` table's
    * `partition` column renders it (`k=v/k2=v2`, keys sorted). */
  def renderTuple(m: Map[String, String]): String =
    m.toSeq.sortBy(_._1).map { case (k, v) => s"$k=$v" }.mkString("/")

  /** Scheme-normalized path for orphan-sweep comparisons (manifest
    * paths vs listing output may differ in `file:` form). Pure —
    * evaluated executor-side by the sweep tasks. */
  private[engine] def normPath(p: String): String =
    if (p.startsWith("file:")) graft.catalog.MetadataIO.toPath(p).toString else p

  /** A Hadoop checksum sidecar's base file (`.name.crc` → `name`);
    * non-sidecar paths map to themselves. */
  private[engine] def crcBaseOf(p: String): String = {
    val cut = p.lastIndexOf('/')
    val name = p.substring(cut + 1)
    if (name.startsWith(".") && name.endsWith(".crc"))
      p.substring(0, cut + 1) + name.substring(1, name.length - 4)
    else p
  }

  /** What an orphan sweep reports back: how many files were deleted
    * (exact) and a bounded, sorted sample of their paths (complete
    * when `deletedCount ≤ sampleCap`). The full path list deliberately
    * does NOT exist anywhere driver-side — see [[sweepOrphans]]. */
  final case class OrphanSweepResult(
      deletedCount: Long, sample: Seq[String], sampleCap: Int)

  /** The orphan sweep behind [[GraftTable.removeOrphanFiles]], keyed
    * only by the table location and its snapshots' manifest lists (so
    * specs can drive it against an [[graft.catalog.InMemoryFileIO]]
    * with op counters and no server). */
  private[engine] def sweepOrphans(
      spark: SparkSession,
      location: String,
      manifestLists: Seq[String],
      olderThanMs: Long,
      sampleCap: Int = 100): OrphanSweepResult = {
    import spark.implicits._
    val sc = spark.sparkContext
    def par(n: Int): Int = math.max(1, math.min(n, sc.defaultParallelism))

    // driver holds only the shard ENTRY lists; carried shards repeat
    // in every child snapshot — dedupe so each shard reads ONCE
    val shardPaths = manifestLists
      .flatMap(Manifests.readEntries)
      .map(_.path).distinct

    val prefixes = Seq(s"$location/data/", s"$location/deletes/")
    // fail on the DRIVER with sweep context when this JVM lacks the
    // scheme registration the executor tasks will need — otherwise the
    // miss surfaces as an opaque task failure deep inside a listing.
    // The probe runs ON AN EXECUTOR (one tiny job): a driver-only
    // FileIO.register would pass a driver-side check and still fail
    // every listing task on a real cluster.
    locally {
      val probePaths = prefixes ++ shardPaths.headOption
      val missing = sc.parallelize(probePaths, 1)
        .filter(p => !graft.catalog.FileIO.canHandle(p)).collect()
      if (missing.nonEmpty)
        throw new IllegalStateException(
          s"orphan sweep for $location needs a FileIO for " +
            s"'${missing.mkString("', '")}' on every executor JVM — " +
            "register the scheme via an executor plugin (FileIO.register) " +
            "before calling remove_orphan_files")
    }

    val referenced: Dataset[String] =
      if (shardPaths.isEmpty) spark.emptyDataset[String]
      else sc.parallelize(shardPaths, par(shardPaths.size))
        .flatMap(p => Manifests.read(p).map(f => normPath(f.path)))
        .toDS()

    // candidate (path, base-for-crc-pairing, mtime): listed AND
    // age-probed executor-side; a Hadoop checksum sidecar (.name.crc)
    // lives and dies with its base file, so it anti-joins on the base.
    // The listing FANS OUT: a cheap delimiter probe per top prefix
    // (driver-side, returns only shard names) splits the tree into one
    // LIST task per sub-prefix — no single task pages the whole tree,
    // and each task streams its shard page by page (FileIO.list is an
    // Iterator). Direct children under the top prefixes (rare: legacy
    // flat layouts) ride along as their own candidates.
    val dirListings =
      prefixes.map(p => graft.catalog.FileIO.forLocation(p).listDir(p))
    val shards = dirListings.flatMap(_.subPrefixes)
    val direct = dirListings.flatMap(_.objects)
    val shardCands = sc.parallelize(shards, par(math.max(shards.size, 1)))
      .flatMap { shard =>
        val io = graft.catalog.FileIO.forLocation(shard)
        io.list(shard).map(p => (p, normPath(crcBaseOf(p)), io.modifiedAt(p)))
      }
    val directCands = sc.parallelize(direct, par(math.max(direct.size, 1)))
      .map { p =>
        val io = graft.catalog.FileIO.forLocation(p)
        (p, normPath(crcBaseOf(p)), io.modifiedAt(p))
      }
    val candidates = (shardCands ++ directCands).toDF("path", "base", "mtime")

    val orphans = candidates
      .join(referenced.toDF("ref_path"),
        candidates("base") === col("ref_path"), "left_anti")
      .where(col("mtime").isNotNull && col("mtime") < olderThanMs) // unknown age: keep
      .select("path").as[String]
    // Deletion happens EXECUTOR-SIDE, directly off the anti-join
    // output — the full orphan list never rides to the driver. A
    // pathological sweep (millions of orphans after a failed backfill,
    // ~200 B/path) would otherwise materialize gigabytes there. Each
    // task deletes its partition's paths and emits one bounded summary
    // (count + first ≤cap paths); the driver folds those summaries
    // keeping at most ~2·cap paths live at any moment.
    val perPart = orphans.rdd.mapPartitions { it =>
      var n = 0L
      val samp = scala.collection.mutable.ArrayBuffer.empty[String]
      it.foreach { p =>
        graft.catalog.FileIO.forLocation(p).delete(p)
        n += 1
        if (samp.size < sampleCap) samp += p
      }
      Iterator.single((n, samp.toList))
    }
    val (deleted, sample) = perPart.aggregate((0L, List.empty[String]))(
      (a, b) => (a._1 + b._1, (a._2 ++ b._2).sorted.take(sampleCap)),
      (a, b) => (a._1 + b._1, (a._2 ++ b._2).sorted.take(sampleCap)))
    OrphanSweepResult(deleted, sample, sampleCap)
  }

  /** Per-key pruning filters derived from the SOURCE side of an
    * upsert: one small aggregation computes each key's min/max and
    * null presence; single-valued keys become equality (which prunes
    * through bucket transforms), ranges prune via stats and monotonic
    * transforms, and a null-free source drops null-keyed target files.
    * `Some(Nil)` = empty source (nothing can match); the aggregation
    * evaluates the source once more than the join — cache upstream if
    * the source is expensive to recompute. */
  private[engine] def sourceKeyFilters(
      source: DataFrame, keys: Seq[String])
      : Option[Seq[org.apache.spark.sql.sources.Filter]] = {
    import org.apache.spark.sql.sources._
    val aggs = keys.flatMap(k => Seq(
      min(col(k)).as(s"__mn_$k"), max(col(k)).as(s"__mx_$k"),
      count(col(k)).as(s"__cnt_$k"))) :+ count(lit(1)).as("__total")
    val row = source.agg(aggs.head, aggs.tail: _*).head()
    val total = row.getAs[Long]("__total")
    if (total == 0L) return Some(Nil)
    Some(keys.map { k =>
      val mn = row.getAs[Any](s"__mn_$k")
      val mx = row.getAs[Any](s"__mx_$k")
      val hasNull = row.getAs[Long](s"__cnt_$k") < total
      val range: Option[Filter] =
        if (mn == null) None
        else if (mn == mx) Some(EqualTo(k, mn))
        else Some(And(GreaterThanOrEqual(k, mn), LessThanOrEqual(k, mx)))
      (range, hasNull) match {
        case (Some(r), false) => r
        case (Some(r), true) => Or(r, IsNull(k))
        case (None, _) => IsNull(k) // no non-null key values at all
      }
    })
  }

  /** Row-lineage metadata column names the SQL layer exposes (Iceberg's
    * metadata-column names): the data file a row came from and its
    * ordinal position inside that file — the row id of position-delete
    * (SupportsDelta) writes. */
  val FileCol = "_file"
  val PosCol = "_pos"

  /** The Iceberg spec's RESERVED position-delete field ids. */
  private[engine] val PosDeleteFilePathId = 2147483546
  private[engine] val PosDeletePosId = 2147483545


  /** Position-delete READ schema: which row of which data file dies.
    * Deliberately id-LESS — columns resolve by NAME, so delete files
    * written before the ids landed still read (an id-bearing read
    * schema over an id-less file resolves to NULLs under
    * fieldId.read, silently losing deletes). */
  private[engine] val PosDeleteSchema = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("file_path",
      org.apache.spark.sql.types.StringType, nullable = false),
    org.apache.spark.sql.types.StructField("pos",
      org.apache.spark.sql.types.LongType, nullable = false)))

  /** Position-delete WRITE schema: same columns stamped with the
    * spec's reserved field ids, so new delete files carry conformant
    * parquet ids (and footer stats fold by id). */
  private[engine] val PosDeleteWriteSchema = org.apache.spark.sql.types.StructType(
    PosDeleteSchema.fields.zip(Seq(PosDeleteFilePathId, PosDeletePosId)).map {
      case (f, id) => f.copy(metadata = SchemaBridge.fieldIdMetadata(id))
    })

  /** Snapshot listing → DataFrame, applying merge-on-read deletes:
    * an equality-delete file removes every key-matching row in data
    * files with a STRICTLY LOWER sequence number (so rows re-inserted
    * after the delete survive); a position-delete file removes the
    * addressed `(file, pos)` rows in data files with sequence ≤ its
    * own. Rows are attributed to their file via the builtin
    * `_metadata.file_path` column and joined to the manifest's per-file
    * sequence (a broadcast of O(file count)); each delete set is then a
    * keyed LEFT ANTI join with the sequence comparison as a residual
    * condition — no all-pairs work, scales with candidate matches.
    * With `lineage`, the output carries `_file`/`_pos` columns (the
    * surviving rows' addresses) for row-level operation scans.
    * Shared by the programmatic scan and the SQL path's MoR scan. */
  private[engine] def readFiles(
      spark: SparkSession, schema: Schema,
      all: Seq[Manifests.DataFile], lineage: Boolean = false): DataFrame = {
    import spark.implicits._
    val (deletes, datas) = all.partition(_.isDeleteFile)
    GraftTable.plannedDataFiles.addAndGet(datas.size.toLong)
    if (datas.isEmpty) return emptyDf(spark, schema, lineage)
    val base = spark.read.schema(SchemaBridge.toSpark(schema))
      .parquet(datas.map(_.path): _*)
    if (deletes.isEmpty && !lineage) return base

    var df = base
      .withColumn(FileCol, col("_metadata.file_path"))
      .withColumn(PosCol, col("_metadata.row_index"))
    if (deletes.nonEmpty) {
      val seqDf = datas.map(f => (GraftDeleteCache.fileKey(f.path), f.seq))
        .toDF("__seq_file", "__data_seq")
      df = df.withColumn("__seq_file", fileKey(col(FileCol)))
        .join(broadcast(seqDf), "__seq_file")

      deletes.filterNot(_.isPositionDeleteFile)
        .groupBy(f => (f.equalityIds, f.equalityColumns))
        .foreach { case ((ids, legacyNames), dfiles) =>
          // key columns resolve against the CURRENT schema by field id
          // (rename-safe); legacy manifests recorded names only
          val keyFields =
            if (ids.nonEmpty) ids.map(id => schema.fieldById(id).getOrElse(
              sys.error(s"equality-delete key field id $id missing from schema")))
            else legacyNames.map(n => schema.fieldByName(n).getOrElse(
              sys.error(s"equality-delete key column $n missing from schema")))
          val keys = keyFields.map(_.name)
          val delSchema = org.apache.spark.sql.types.StructType(keyFields.map(f =>
            org.apache.spark.sql.types.StructField(f.name,
              SchemaBridge.toSpark(f.fieldType), nullable = true,
              SchemaBridge.fieldIdMetadata(f.id))))
          // ONE multi-path scan per key-set (not a union per file —
          // plan size stays O(key-sets), not O(delete files)); each
          // row's sequence number joins back in from a tiny broadcast
          // keyed by source file, same as the data side. Read schema is
          // id-stamped: columns resolve by field id even if written
          // under a pre-rename name.
          val delSeqDf = dfiles
            .map(f => (GraftDeleteCache.fileKey(f.path), f.seq))
            .toDF("__del_seq_file", "__del_seq")
          val delRows = spark.read.schema(delSchema)
            .parquet(dfiles.map(_.path): _*)
            .withColumn("__del_seq_file", fileKey(col("_metadata.file_path")))
            .join(broadcast(delSeqDf), "__del_seq_file")
            .select(keys.map(k => col(k).as(s"__del_$k")) :+ col("__del_seq"): _*)
          val cond = keys.map(k => df(k) <=> delRows(s"__del_$k")).reduce(_ && _) &&
            delRows("__del_seq") > df("__data_seq")
          df = df.join(delRows, cond, "left_anti")
        }

      val posDeletes = deletes.filter(_.isPositionDeleteFile)
      if (posDeletes.nonEmpty) {
        // same consolidation: one scan over ALL position-delete files,
        // per-file sequence joined from a broadcast
        val posSeqDf = posDeletes
          .map(f => (GraftDeleteCache.fileKey(f.path), f.seq))
          .toDF("__del_seq_file", "__del_seq")
        val delRows = spark.read.schema(PosDeleteSchema)
          .parquet(posDeletes.map(_.path): _*)
          .withColumn("__del_seq_file", fileKey(col("_metadata.file_path")))
          .join(broadcast(posSeqDf), "__del_seq_file")
          .select(fileKey(col("file_path")).as("__del_file"),
            col("pos").as("__del_pos"), col("__del_seq"))
        val cond = df("__seq_file") === delRows("__del_file") &&
          df(PosCol) === delRows("__del_pos") &&
          delRows("__del_seq") >= df("__data_seq")
        df = df.join(delRows, cond, "left_anti")
      }
    }
    val outCols = base.columns.toIndexedSeq ++ (if (lineage) Seq(FileCol, PosCol) else Nil)
    df.select(outCols.map(col): _*)
  }

  /** Key a file by its FULL scheme/authority-stripped path — the SQL
    * twin of [[GraftDeleteCache.fileKey]] (`file:///x`, `file:/x`,
    * `s3://bucket/x` and bare `/x` all key to `/x`): stable across URI
    * forms between manifest paths and `_metadata.file_path`, and safe
    * under nested layouts or cross-job name reuse where a last-two-
    * segment suffix could collide. */
  private[engine] def fileKey(c: Column): Column =
    regexp_replace(
      regexp_replace(
        // degenerate scheme://authority with NO path keys as the bare
        // authority (the JVM twin's behavior), not the empty string
        regexp_replace(c, "^[a-zA-Z][a-zA-Z0-9+.-]*://([^/]*)$", "$1"),
        "^[a-zA-Z][a-zA-Z0-9+.-]*://[^/]*", ""),
      "^file:", "")

  private[engine] def emptyDf(
      spark: SparkSession, schema: Schema, lineage: Boolean = false): DataFrame = {
    val s = SchemaBridge.toSpark(schema)
    val withLineage =
      if (!lineage) s
      else org.apache.spark.sql.types.StructType(s.fields.toSeq ++ Seq(
        org.apache.spark.sql.types.StructField(FileCol,
          org.apache.spark.sql.types.StringType, nullable = false),
        org.apache.spark.sql.types.StructField(PosCol,
          org.apache.spark.sql.types.LongType, nullable = false)))
    spark.createDataFrame(new java.util.ArrayList[Row](), withLineage)
  }

  /** Write df as parquet under a fresh data/ subdirectory of
    * `m.location` — partitioned by the metadata's default spec when one
    * is set (partition values derived per row by codegen'd transform
    * expressions, incl. the native bucket expression, one open writer
    * per tuple per task) — via the same distributed task writer the V2
    * write uses ([[ParquetBatchWrite.writeJob]]). The file inventory
    * (path, bytes, rows, partition tuple) is assembled by the write
    * tasks themselves and travels back in their commit results, so the
    * driver does NO filesystem walking and opens NO parquet footers —
    * at 10⁵ written files the metadata cost stays on the cluster.
    * Shared by the live-table write path and the staged-table
    * (CTAS/RTAS) write path, which has no loadable table yet. */
  private[engine] def writeDataFiles(
      df: DataFrame, m: TableMetadata,
      preserveLayout: Boolean = false): Seq[Manifests.DataFile] = {
    val spec = m.defaultSpec
    val dataDir = s"${m.location}/data/${UUID.randomUUID()}"
    // Stamp every column with its Iceberg field id so the parquet writer
    // records field_id in the files — scans then resolve columns by id
    // (see SchemaBridge.ParquetFieldId), keeping old files readable
    // across renames without rewrites.
    val stamped0 = df.select(m.currentSchema.fields.map(f =>
      col(f.name).as(f.name, SchemaBridge.fieldIdMetadata(f.id))): _*)
    // Honor the table's default sort order WITHIN each write task
    // (transform-aware, direction + null order per spec): a local sort,
    // no exchange — rows cluster by the sort key inside every file, so
    // per-file min/max bounds tighten and stats pruning on the sort
    // columns skips more files. This is Iceberg's write.sort behavior;
    // a global sort (range exchange) stays the compaction job's call.
    // write.distribution-mode (Iceberg's knob): with `hash`, cluster
    // incoming rows BY PARTITION TUPLE before the task writers — one
    // exchange, and each partition value's rows land in one task, so a
    // partitioned table gets O(partitions) files per write instead of
    // O(tasks × partitions) small files (the 1000-executor failure
    // mode: every task opening a writer for every partition it sees).
    // `range` uses a range exchange (sampled bounds), clustering
    // adjacent partition values for tighter cross-partition file
    // ordering. Default (unset/none) keeps the incoming distribution —
    // zero added shuffle, the right call when the query is already
    // clustered (e.g. streaming epochs, sorted compaction output).
    // `preserveLayout` (compaction/z-order callers): the caller IS the
    // layout decision — re-distributing or re-sorting here would
    // silently undo it.
    val stamped1 = m.properties.get("write.distribution-mode") match {
      case Some(mode @ ("hash" | "range"))
          if !spec.isUnpartitioned && !preserveLayout =>
        val pcols = PartitionExprs.partitionColumns(spec, m.currentSchema, col)
        if (mode == "hash") stamped0.repartition(pcols: _*)
        else stamped0.repartitionByRange(pcols: _*)
      case _ => stamped0
    }
    val order = m.defaultSortOrder
    val sortCols = if (preserveLayout) Nil else order.fields.flatMap { sf =>
      for {
        src <- m.currentSchema.fieldById(sf.sourceId)
        base <- scala.util.Try(PartitionExprs.partitionValue(
          sf.transform, col(src.name), src.fieldType)).toOption
      } yield (sf.direction, sf.nullOrder) match {
        case (SortDirection.Asc, NullOrder.NullsFirst) => base.asc_nulls_first
        case (SortDirection.Asc, NullOrder.NullsLast) => base.asc_nulls_last
        case (SortDirection.Desc, NullOrder.NullsFirst) => base.desc_nulls_first
        case (SortDirection.Desc, NullOrder.NullsLast) => base.desc_nulls_last
      }
    }
    val stamped =
      if (sortCols.isEmpty) stamped1
      else stamped1.sortWithinPartitions(sortCols: _*)
    val routing =
      if (spec.isUnpartitioned) None
      else Some(ParquetBatchWrite.PartitionRouting(
        spec.fields.map(_.name),
        org.apache.spark.sql.GraftShims.boundExpressions(
          df.sparkSession, stamped.schema,
          PartitionExprs.partitionColumns(spec, m.currentSchema, col))))
    toDataFiles(ParquetBatchWrite.writeJob(stamped, dataDir, routing))
  }

  /** Task-reported inventory → manifest entries (scheme-normalized
    * paths; pure transformation, no I/O). */
  private[engine] def toDataFiles(
      files: Seq[ParquetBatchWrite.WrittenFile]): Seq[Manifests.DataFile] =
    files.map(f => Manifests.DataFile(
      graft.catalog.MetadataIO.toPath(f.path).toString, f.bytes, f.rows, f.partition,
      content = f.content, stats = f.stats))
      .sortBy(_.path)
}

