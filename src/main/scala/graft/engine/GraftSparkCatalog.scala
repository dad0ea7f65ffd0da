package graft.engine

import graft.catalog.{CatalogError, TableIdent}
import graft.core.{Transform => ITransform, UnboundPartitionField, UnboundPartitionSpec}
import org.apache.spark.sql.{GraftShims, SparkSession}
import org.apache.spark.sql.catalyst.analysis.{NoSuchNamespaceException, NoSuchTableException, NamespaceAlreadyExistsException, TableAlreadyExistsException}
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.{Literal => V2Literal, NamedReference, Transform}
import org.apache.spark.sql.connector.read.ScanBuilder
import org.apache.spark.sql.connector.write.{BatchWrite, LogicalWriteInfo, RowLevelOperation, RowLevelOperationBuilder, RowLevelOperationInfo, SupportsTruncate, V1Write, Write, WriteBuilder}
import org.apache.spark.sql.sources.InsertableRelation
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import java.util
import scala.jdk.CollectionConverters._

/** Spark V2 catalog plugin over our REST catalog — the SQL front door
  * (the role iceberg-spark's SparkCatalog plays against the reference,
  * conftest.py:208-217):
  *
  * {{{
  *   spark.conf.set("spark.sql.catalog.graft", classOf[GraftSparkCatalog].getName)
  *   spark.conf.set("spark.sql.catalog.graft.uri", serverUri)
  *   spark.conf.set("spark.sql.catalog.graft.warehouse", "wh")
  *   spark.sql("CREATE NAMESPACE graft.db")
  *   spark.sql("CREATE TABLE graft.db.t (id INT) PARTITIONED BY (bucket(16, id))")
  *   spark.sql("SELECT * FROM graft.db.t WHERE id > 7")
  * }}}
  *
  * Reads resolve the current snapshot's file list from the manifest and
  * hand it to the builtin parquet source, so SQL scans get the full
  * pushdown/pruning machinery (MoR snapshots read through
  * [[GraftScanBuilder]], which keeps pushdown). Every SQL write form
  * routes through the snapshot-commit protocol: INSERT INTO / INSERT
  * OVERWRITE / CTAS via the V1 insert bridge into [[GraftTable]],
  * DELETE FROM via SupportsDelete (position-delete deltas; truncate is
  * metadata-only; equality deletes under merge-on-read mode), MERGE
  * INTO / UPDATE as SupportsDelta row-level operations backed by
  * [[GraftDeltaWrite]], and ALTER TABLE as guarded metadata commits.
  * Time-travel loads stay read-only.
  */
class GraftSparkCatalog extends TableCatalog with SupportsNamespaces
    with StagingTableCatalog with FunctionCatalog with ViewCatalog {

  private var catalogName: String = _
  private var client: RestCatalogClient = _
  private var prefix: String = _

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    val uri = Option(options.get("uri")).getOrElse(
      throw new IllegalArgumentException(s"catalog $name requires option `uri`"))
    val warehouse = Option(options.get("warehouse")).getOrElse(
      throw new IllegalArgumentException(s"catalog $name requires option `warehouse`"))
    client = new RestCatalogClient(uri)
    prefix = client.config(warehouse)
  }

  override def name(): String = catalogName

  private def ident(i: Identifier): TableIdent =
    TableIdent(i.namespace().toSeq, i.name())

  // -------------------------------------------------------- namespaces
  override def listNamespaces(): Array[Array[String]] =
    client.listNamespaces(prefix).map(_.toArray).toArray

  override def listNamespaces(namespace: Array[String]): Array[Array[String]] =
    if (namespace.isEmpty) listNamespaces()
    else if (namespaceExists(namespace)) Array.empty // depth is 1
    else throw new NoSuchNamespaceException(namespace)

  override def loadNamespaceMetadata(namespace: Array[String]): util.Map[String, String] =
    try client.getNamespaceProperties(prefix, namespace.toSeq).asJava
    catch { case e: CatalogError if e.code == 404 =>
      throw new NoSuchNamespaceException(namespace) }

  override def createNamespace(
      namespace: Array[String], metadata: util.Map[String, String]): Unit =
    try client.createNamespace(prefix, namespace.toSeq, metadata.asScala.toMap)
    catch { case e: CatalogError if e.code == 409 =>
      throw new NamespaceAlreadyExistsException(namespace) }

  /** SQL ALTER NAMESPACE ... SET/UNSET PROPERTIES → the catalog's
    * atomic namespace-properties endpoint. */
  override def alterNamespace(
      namespace: Array[String], changes: NamespaceChange*): Unit = {
    val sets = changes.collect {
      case c: NamespaceChange.SetProperty => c.property -> c.value
    }.toMap
    val removes = changes.collect {
      case c: NamespaceChange.RemoveProperty => c.property
    }
    try client.updateNamespaceProperties(prefix, namespace.toSeq, removes, sets)
    catch { case e: CatalogError if e.code == 404 =>
      throw new NoSuchNamespaceException(namespace) }
  }

  override def dropNamespace(namespace: Array[String], cascade: Boolean): Boolean =
    try { client.dropNamespace(prefix, namespace.toSeq); true }
    catch { case e: CatalogError if e.code == 404 => false }

  // ---------------------------------------------------------- functions
  /** V2 function resolution — the planner side of bucket partitioning:
    * storage-partitioned-join compatibility resolves `bucket(N, col)`
    * through here (any namespace; the function is catalog-global). */
  override def listFunctions(namespace: Array[String]): Array[Identifier] =
    Array(Identifier.of(namespace, "bucket"))
  override def loadFunction(ident: Identifier)
      : org.apache.spark.sql.connector.catalog.functions.UnboundFunction =
    if (ident.name() == "bucket") graft.functions.IcebergBucketFunction
    else throw new org.apache.spark.sql.catalyst.analysis
      .NoSuchFunctionException(ident)

  // ------------------------------------------------------------ tables
  override def listTables(namespace: Array[String]): Array[Identifier] =
    try client.listTables(prefix, namespace.toSeq)
      .map(t => Identifier.of(t.namespace.toArray, t.name)).toArray
    catch { case e: CatalogError if e.code == 404 =>
      throw new NoSuchNamespaceException(namespace) }

  override def loadTable(i: Identifier): Table = loadTableAt(i, None)

  /** SQL time travel: `VERSION AS OF <snapshot-id | tag | branch>`. */
  override def loadTable(i: Identifier, version: String): Table =
    loadTableAt(i, Some(version))

  /** SQL time travel: `TIMESTAMP AS OF <ts>` — Spark hands micros since
    * epoch; the snapshot is the last snapshot-log entry at or before
    * that instant (Iceberg's as-of-time rule), skipping entries whose
    * snapshot was since expired. */
  override def loadTable(i: Identifier, timestampMicros: Long): Table =
    loadTableAt(i, None, Some(timestampMicros))

  private def loadTableAt(
      i: Identifier, version: Option[String],
      asOfMicros: Option[Long] = None): Table = {
    val timeTravel = version.isDefined || asOfMicros.isDefined
    val loaded =
      try client.loadTable(prefix, ident(i))
      catch { case e: CatalogError if e.code == 404 =>
        // `db.t.files` / `db.t.branch_x` style identifier suffixes
        // (not combinable with time travel, like loadSpecialTable's
        // version guard)
        return (if (asOfMicros.isDefined) None else loadSpecialTable(i, version))
          .getOrElse(throw new NoSuchTableException(i)) }
    val m = loaded.metadata
    val snapshot = (version, asOfMicros) match {
      case (None, None) => m.currentSnapshot
      case (Some(v), _) =>
        val byId = v.toLongOption.flatMap(m.snapshots.get)
        Some(byId.orElse(m.snapshotFor(v)).getOrElse(
          throw new NoSuchTableException(i)))
      case (None, Some(us)) =>
        val ms = Math.floorDiv(us, 1000L)
        Some(m.snapshotLog.reverseIterator
          .filter(e => e.timestampMs <= ms && m.snapshots.contains(e.snapshotId))
          .map(e => m.snapshots(e.snapshotId))
          .nextOption()
          .getOrElse(throw new IllegalArgumentException(
            s"no snapshot of ${i.namespace().mkString(".")}.${i.name()} " +
              s"at or before epoch-ms $ms (oldest retained: " +
              // same still-loadable filter as the selection above: an
              // EXPIRED log entry's timestamp would name a snapshot the
              // user cannot actually travel to
              s"${m.snapshotLog.iterator
                .filter(e => m.snapshots.contains(e.snapshotId))
                .map(_.timestampMs).nextOption().getOrElse("none")})")))
    }
    // a current load always presents the table's CURRENT schema (data
    // files resolve by field id, so older files still read correctly);
    // only time travel pins the snapshot's schema
    val coreSchema =
      if (!timeTravel) m.currentSchema
      else snapshot.flatMap(_.schemaId).flatMap(m.schemas.get).getOrElse(m.currentSchema)
    val schema = SchemaBridge.toSpark(coreSchema)
    val listing = snapshot.map(s => Manifests.read(s.manifestList)).getOrElse(Nil)
    val spark = SparkSession.active
    val fullName = s"$catalogName.${i.namespace().mkString(".")}.${i.name()}"
    val pruning = new SnapshotPruning(m, coreSchema, listing)
    val delegate = GraftShims.prunedParquetTable(
      i.name(), spark,
      listing.filterNot(_.isDeleteFile).map(f => (f.path, f.sizeBytes)),
      schema, pruning.pathKeeper,
      MetadataAggregates.plan(coreSchema, m.partitionSpecs.values, listing, _))
    // time-travel loads are read-only: you can't INSERT into the past
    if (timeTravel)
      new ReadOnlyTable(fullName, delegate, schema, coreSchema, listing,
        m.properties, pruning)
    else new WritableTable(fullName, ident(i), delegate, schema,
      coreSchema, listing, m.properties, pruning)
  }

  /** Filter-driven file skipping for one snapshot: evaluates pushed
    * predicates against manifest column stats + partition tuples
    * ([[StatsPruning]]), exposed file-keyed (MoR / row-level scans)
    * and path-keyed (the delegate's [[GraftShims.prunedParquetTable]]
    * file index). */
  private final class SnapshotPruning(
      m: graft.core.TableMetadata,
      coreSchema: graft.core.Schema,
      listing: Seq[Manifests.DataFile]) {
    private val parts = StatsPruning.partFields(m.partitionSpecs.values)
    private val byPath = listing.iterator.map(f => f.path -> f).toMap
    /** The default spec, for storage-partitioned-join key grouping. */
    def defaultSpec: Option[graft.core.PartitionSpec] =
      m.partitionSpecs.get(m.defaultSpecId)
    /** Every spec, for manifest-answered GROUP BY exactness checks. */
    def allSpecs: Iterable[graft.core.PartitionSpec] = m.partitionSpecs.values
    /** Route reads through [[GraftScanBuilder]] so the scan can report
      * KeyGroupedPartitioning: only when the user opted into V2
      * bucketing AND the default spec is all identity/bucket (the stock
      * parquet delegate cannot report storage partitioning). */
    def spjEligible: Boolean =
      GraftSpj.enabled(SparkSession.active) &&
        defaultSpec.exists(GraftSpj.supportedSpec)
    def fileKeeper(filters: Seq[org.apache.spark.sql.sources.Filter])
        : Manifests.DataFile => Boolean =
      StatsPruning.keeper(coreSchema, parts, filters)
    def pathKeeper(filters: Seq[org.apache.spark.sql.sources.Filter])
        : String => Boolean = {
      val keep = fileKeeper(filters)
      p => byPath.get(p).forall(keep)
    }
  }

  /** Iceberg-style identifier suffixes on a table name: metadata tables
    * (`db.t.files` / `.partitions` / `.refs` / `.snapshots` /
    * `.history`, reference test_spark.py:149-164,344) and ref-pinned
    * reads (`db.t.branch_x` / `db.t.tag_y`, test_spark.py:299-327).
    * Returns None when the base table doesn't exist either. */
  private def loadSpecialTable(i: Identifier, version: Option[String]): Option[Table] = {
    if (i.namespace().isEmpty || version.isDefined) return None
    val baseIdent = TableIdent(i.namespace().init.toSeq, i.namespace().last)
    val loaded =
      try client.loadTable(prefix, baseIdent)
      catch { case e: CatalogError if e.code == 404 => return None }
    val m = loaded.metadata
    val name = i.name()
    val fullName = s"$catalogName.${i.namespace().mkString(".")}.$name"
    if (GraftSparkCatalog.MetadataTables(name)) {
      val gt = new GraftTable(client, prefix, baseIdent)
      // `.files`/`.partitions` scan manifest shards: partition-scoped
      // queries prune SHARD reads through pushed filters
      if (name == "files" || name == "partitions")
        Some(new PartitionMetaTable(fullName, gt, name))
      else Some(new DataFrameTable(fullName,
        gt.metadataTable(SparkSession.active, name)))
    } else if (name == "stream") {
      // the table as a streaming SOURCE: offsets are snapshot ids, each
      // micro-batch reads the incremental append plan (GraftStreamRead)
      val gt = new GraftTable(client, prefix, baseIdent)
      Some(new StreamReadTable(fullName, gt, m.currentSchema,
        SchemaBridge.toSpark(m.currentSchema)))
    } else if (name.startsWith("branch_") || name.startsWith("tag_")) {
      val refName = name.substring(name.indexOf('_') + 1)
      m.refs.get(refName).map { ref =>
        val snap = m.snapshots(ref.snapshotId)
        val listing = Manifests.read(snap.manifestList)
        // branch/tag reads use the table's CURRENT schema (files
        // resolve by field id), matching Iceberg's ref-read semantics
        val schema = SchemaBridge.toSpark(m.currentSchema)
        val pruning = new SnapshotPruning(m, m.currentSchema, listing)
        val delegate = GraftShims.prunedParquetTable(i.name(), SparkSession.active,
          listing.filterNot(_.isDeleteFile).map(f => (f.path, f.sizeBytes)),
          schema, pruning.pathKeeper,
          MetadataAggregates.plan(m.currentSchema, m.partitionSpecs.values, listing, _))
        // branches accept SQL INSERT / INSERT OVERWRITE (committed on
        // the branch ref, main untouched); tags are immutable
        if (name.startsWith("branch_"))
          new BranchTable(fullName, baseIdent, refName, delegate, schema,
            m.currentSchema, listing, m.properties, pruning)
        else
          new ReadOnlyTable(fullName, delegate, schema, m.currentSchema,
            listing, m.properties, pruning)
      }
    } else None
  }

  /** A branch surfaced as its own identifier (`db.t.branch_x`): reads
    * pin the branch head; INSERT INTO / INSERT OVERWRITE commit new
    * snapshots ON the branch (reference test_spark.py:299-327 writes to
    * a branch and proves main unchanged). Row-level operations stay on
    * the main identifier. */
  private final class BranchTable(
      tableName: String, tid: TableIdent, branch: String,
      delegate: Table, tableSchema: StructType,
      coreSchema: graft.core.Schema, listing: Seq[Manifests.DataFile],
      props: Map[String, String], pruning: SnapshotPruning)
      extends Table with SupportsRead with SupportsWrite {
    override def name(): String = tableName
    override def schema(): StructType = tableSchema
    override def properties(): util.Map[String, String] = props.asJava
    override def capabilities(): util.Set[TableCapability] =
      util.EnumSet.of(
        TableCapability.BATCH_READ,
        TableCapability.V1_BATCH_WRITE,
        TableCapability.TRUNCATE)
    override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
      if (listing.exists(_.isDeleteFile) || pruning.spjEligible)
        new GraftScanBuilder(coreSchema, listing, pruning.fileKeeper,
          pruning.defaultSpec, pruning.allSpecs)
      else delegate.asInstanceOf[SupportsRead].newScanBuilder(options)

    override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
      new WriteBuilder with SupportsTruncate {
        private var replace = false
        override def truncate(): WriteBuilder = { replace = true; this }
        override def build(): Write = new V1Write {
          override def toInsertableRelation: InsertableRelation =
            new InsertableRelation {
              override def insert(data: org.apache.spark.sql.DataFrame,
                  overwrite: Boolean): Unit = {
                require(data.columns.length == tableSchema.length,
                  s"INSERT column count ${data.columns.length} != table arity ${tableSchema.length}")
                val aligned = data.toDF(tableSchema.fieldNames.toIndexedSeq: _*)
                val table = new GraftTable(client, prefix, tid)
                if (replace || overwrite)
                  table.overwriteAll(aligned,
                    table.metadata.refs.get(branch).map(_.snapshotId),
                    branch = branch)
                else table.append(aligned, branch = branch)
              }
            }
        }
      }
  }

  /** `.files` / `.partitions` with shard-level pruning: a pushed
    * `WHERE partition = 'k=v'` (or IN list) selects only the manifest
    * SHARDS whose list-entry tuple matches — skipped partitions cost
    * zero shard I/O, the 100 TB lever for partition-scoped metadata
    * queries. Filters are reported back as residual (Spark re-applies
    * them exactly), so the prune is pure I/O savings. */
  private final class PartitionMetaTable(
      tableName: String, gt: GraftTable, kind: String)
      extends Table with SupportsRead {
    override def name(): String = tableName
    override def schema(): StructType =
      if (kind == "files") GraftSparkCatalog.FilesTableSchema
      else GraftSparkCatalog.PartitionsTableSchema
    override def capabilities(): util.Set[TableCapability] =
      util.EnumSet.of(TableCapability.BATCH_READ)
    override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
      new ScanBuilder
          with org.apache.spark.sql.connector.read.SupportsPushDownFilters {
        private var keep: Map[String, String] => Boolean = _ => true
        override def pushFilters(
            filters: Array[org.apache.spark.sql.sources.Filter])
            : Array[org.apache.spark.sql.sources.Filter] = {
          import org.apache.spark.sql.sources.{EqualTo, In}
          val allowedSets = filters.toSeq.collect {
            case EqualTo("partition", s: String) => Set(s)
            case In("partition", vs) =>
              vs.collect { case s: String => s }.toSet
          }
          if (allowedSets.nonEmpty) {
            val allowed = allowedSets.reduce(_ intersect _)
            keep = m => allowed.contains(GraftTable.renderTuple(m))
          }
          filters // all residual — the prune is inexact by design
        }
        override def pushedFilters(): Array[org.apache.spark.sql.sources.Filter] =
          Array.empty
        override def build(): org.apache.spark.sql.connector.read.Scan = {
          val df = gt.metadataTable(SparkSession.active, kind, keep)
          new org.apache.spark.sql.connector.read.V1Scan {
            override def readSchema(): StructType = df.schema
            override def toV1TableScan[T <: org.apache.spark.sql.sources.BaseRelation
                with org.apache.spark.sql.sources.TableScan](
                context: org.apache.spark.sql.SQLContext): T =
              (new org.apache.spark.sql.sources.BaseRelation
                  with org.apache.spark.sql.sources.TableScan {
                override def sqlContext: org.apache.spark.sql.SQLContext = context
                override def schema: StructType = df.schema
                override def buildScan()
                    : org.apache.spark.rdd.RDD[org.apache.spark.sql.Row] = df.rdd
              }).asInstanceOf[T]
          }
        }
      }
  }

  /** A fixed DataFrame surfaced as a read-only V2 table (driver-side
    * metadata relations — file/partition/ref listings). */
  private final class DataFrameTable(
      tableName: String, df: org.apache.spark.sql.DataFrame)
      extends Table with SupportsRead {
    override def name(): String = tableName
    override def schema(): StructType = df.schema
    override def capabilities(): util.Set[TableCapability] =
      util.EnumSet.of(TableCapability.BATCH_READ)
    override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
      new ScanBuilder {
        override def build(): org.apache.spark.sql.connector.read.Scan =
          new org.apache.spark.sql.connector.read.V1Scan {
            override def readSchema(): StructType = df.schema
            override def toV1TableScan[T <: org.apache.spark.sql.sources.BaseRelation
                with org.apache.spark.sql.sources.TableScan](
                context: org.apache.spark.sql.SQLContext): T =
              (new org.apache.spark.sql.sources.BaseRelation
                  with org.apache.spark.sql.sources.TableScan {
                override def sqlContext: org.apache.spark.sql.SQLContext = context
                override def schema: StructType = df.schema
                override def buildScan()
                    : org.apache.spark.rdd.RDD[org.apache.spark.sql.Row] = df.rdd
              }).asInstanceOf[T]
          }
      }
  }

  override def createTable(
      i: Identifier, schema: StructType, partitions: Array[Transform],
      properties: util.Map[String, String]): Table = {
    val icebergSchema = SchemaBridge.toIceberg(schema)
    try client.createTable(prefix, ident(i), icebergSchema,
      toUnboundSpec(icebergSchema, partitions), properties.asScala.toMap)
    catch { case e: CatalogError if e.code == 409 =>
      throw new TableAlreadyExistsException(i) }
    loadTable(i)
  }

  /** V2 partition transforms → our unbound spec (shared by create and
    * stage-create). */
  private def toUnboundSpec(
      icebergSchema: graft.core.Schema,
      partitions: Array[Transform]): UnboundPartitionSpec = {
    def sourceId(fieldNames: Seq[String]): Int = {
      require(fieldNames.size == 1, s"nested partition refs unsupported: $fieldNames")
      icebergSchema.fieldByName(fieldNames.head).getOrElse(
        throw new IllegalArgumentException(s"no such column: ${fieldNames.head}")).id
    }
    // generic V2 Transform API (name + arguments): the typed extractor
    // classes are private[sql]
    val fields = partitions.toSeq.map { p =>
      def ref: NamedReference = p.arguments().collectFirst {
        case r: NamedReference => r
      }.getOrElse(throw new UnsupportedOperationException(
        s"partition transform without column reference: $p"))
      def field = ref.fieldNames().last
      def src = sourceId(ref.fieldNames().toSeq)
      p.name() match {
        case "identity" => UnboundPartitionField(src, None, field, ITransform.Identity)
        case "bucket" =>
          val n = p.arguments().collectFirst {
            case l: V2Literal[_] => l.value().toString.toInt
          }.getOrElse(throw new IllegalArgumentException(s"bucket without count: $p"))
          UnboundPartitionField(src, None, s"${field}_bucket", ITransform.Bucket(n))
        case "years" => UnboundPartitionField(src, None, s"${field}_year", ITransform.Year)
        case "months" => UnboundPartitionField(src, None, s"${field}_month", ITransform.Month)
        case "days" => UnboundPartitionField(src, None, s"${field}_day", ITransform.Day)
        case "hours" => UnboundPartitionField(src, None, s"${field}_hour", ITransform.Hour)
        case "truncate" =>
          val w = p.arguments().collectFirst {
            case l: V2Literal[_] => l.value().toString.toInt
          }.getOrElse(throw new IllegalArgumentException(s"truncate without width: $p"))
          UnboundPartitionField(src, None, s"${field}_trunc", ITransform.Truncate(w))
        case other => throw new UnsupportedOperationException(
          s"partition transform not supported: $other")
      }
    }
    UnboundPartitionSpec(None, fields)
  }

  // ---------------------------------------------------- staged (CTAS)
  /** Atomic CTAS: POST tables with stage-create (the reference's
    * staged-row contract, postgres/table.rs:226-259) — the staged table
    * is invisible to loads/lists until the data write commits its first
    * snapshot, which also finalizes the row. Abort drops the staged
    * row. */
  override def stageCreate(
      i: Identifier, schema: StructType, partitions: Array[Transform],
      properties: util.Map[String, String]): StagedTable = {
    val icebergSchema = SchemaBridge.toIceberg(schema)
    val staged =
      try client.createTable(prefix, ident(i), icebergSchema,
        toUnboundSpec(icebergSchema, partitions), properties.asScala.toMap,
        stageCreate = true)
      catch { case e: CatalogError if e.code == 409 =>
        throw new TableAlreadyExistsException(i) }
    new GraftStagedTable(i, staged.metadata, replaceOf = None)
  }

  /** Atomic RTAS. An existing table is replaced CLIENT-side (like
    * Iceberg's replace transaction): the new schema lands as add-schema
    * with fresh field ids above the old last-column-id, and the data
    * swap is pinned to the pre-replace snapshot — a concurrent commit
    * 409s the whole replace. */
  override def stageReplace(
      i: Identifier, schema: StructType, partitions: Array[Transform],
      properties: util.Map[String, String]): StagedTable =
    stageForReplace(i, schema, partitions, properties, orCreate = false)

  override def stageCreateOrReplace(
      i: Identifier, schema: StructType, partitions: Array[Transform],
      properties: util.Map[String, String]): StagedTable =
    stageForReplace(i, schema, partitions, properties, orCreate = true)

  private def stageForReplace(
      i: Identifier, schema: StructType, partitions: Array[Transform],
      properties: util.Map[String, String], orCreate: Boolean): StagedTable = {
    import graft.core.{NestedField, IType}
    val existing =
      try Some(client.loadTable(prefix, ident(i)).metadata)
      catch { case e: CatalogError if e.code == 404 => None }
    existing match {
      case None if !orCreate => throw new NoSuchTableException(i)
      case None => stageCreate(i, schema, partitions, properties)
      case Some(m) =>
        // fresh ids strictly above the old last-column-id, so id-based
        // file resolution can never confuse old and new columns
        def shift(t: IType, by: Int): IType = t match {
          case IType.TStruct(fs) => IType.TStruct(fs.map(f =>
            f.copy(id = f.id + by, fieldType = shift(f.fieldType, by))))
          case IType.TList(id, e, r) => IType.TList(id + by, shift(e, by), r)
          case IType.TMap(k, kt, v, vt, r) =>
            IType.TMap(k + by, shift(kt, by), v + by, shift(vt, by), r)
          case p => p
        }
        val fresh = SchemaBridge.toIceberg(schema)
        val shifted = fresh.copy(fields = fresh.fields.map(f =>
          NestedField(f.id + m.lastColumnId, f.name, f.required,
            shift(f.fieldType, m.lastColumnId), f.doc)))
        val lastColumnId = m.lastColumnId + fresh.struct.maxFieldId
        // the replacement may change partitioning entirely: the old
        // specs are retired (remove-partition-specs — they reference
        // old field ids and cannot rebind to the new schema) and the
        // new spec, possibly empty, binds against the shifted schema
        val specChange = partitions.nonEmpty || !m.defaultSpec.isUnpartitioned
        val newSpec = toUnboundSpec(shifted, partitions)
        val boundSpec = graft.core.PartitionSpecBinder
          .bind(shifted.copy(schemaId = 0), newSpec,
            specId = m.defaultSpecId + 1, lastPartitionId = m.lastPartitionId)
          .fold(e => throw new IllegalArgumentException(e.message), identity)
        // pseudo-metadata for the data write: new schema + new spec at
        // the old location
        val writeMeta = m.copy(
          schemas = Map(0 -> shifted.copy(schemaId = 0)), currentSchemaId = 0,
          partitionSpecs = Map(boundSpec.specId -> boundSpec),
          defaultSpecId = boundSpec.specId)
        new GraftStagedTable(i, writeMeta,
          replaceOf = Some(ReplacePlan(m, shifted, lastColumnId,
            newSpec = if (specChange) Some(newSpec) else None,
            removeSpecIds = if (specChange) m.partitionSpecs.keys.toSeq.sorted else Nil)))
    }
  }

  private final case class ReplacePlan(
      base: graft.core.TableMetadata,
      schema: graft.core.Schema,
      lastColumnId: Int,
      newSpec: Option[graft.core.UnboundPartitionSpec],
      removeSpecIds: Seq[Int])

  /** A staged table: Spark writes the query result through it, then
    * commits or aborts atomically. The data write reuses the engine's
    * file writer (field-id stamping, footer inventory); the commit is a
    * single guarded metadata swap. */
  private final class GraftStagedTable(
      i: Identifier,
      writeMeta: graft.core.TableMetadata,
      replaceOf: Option[ReplacePlan])
      extends StagedTable with SupportsWrite {
    import graft.core._

    private var written: Seq[Manifests.DataFile] = Nil

    override def name(): String =
      s"$catalogName.${i.namespace().mkString(".")}.${i.name()} (staged)"
    override def schema(): StructType = SchemaBridge.toSpark(writeMeta.currentSchema)
    override def capabilities(): util.Set[TableCapability] =
      util.EnumSet.of(TableCapability.V1_BATCH_WRITE, TableCapability.TRUNCATE)

    override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
      new WriteBuilder with SupportsTruncate {
        override def truncate(): WriteBuilder = this // staged tables are empty
        override def build(): Write = new V1Write {
          override def toInsertableRelation: InsertableRelation =
            new InsertableRelation {
              override def insert(data: org.apache.spark.sql.DataFrame,
                  overwrite: Boolean): Unit = {
                val names = writeMeta.currentSchema.fields.map(_.name)
                written = GraftTable.writeDataFiles(
                  data.toDF(names: _*), writeMeta)
              }
            }
        }
      }

    override def commitStagedChanges(): Unit = {
      val base = replaceOf.map(_.base).getOrElse(writeMeta)
      val seq = base.lastSequenceNumber + 1
      val files = written.map(f =>
        if (f.seq == Manifests.UnassignedSeq) f.copy(seq = seq) else f)
      val snapId =
        java.util.concurrent.ThreadLocalRandom.current().nextLong(1L, Long.MaxValue)
      val manifestLoc = Manifests.writeCommit(
        s"${writeMeta.location}/metadata", snapId, carried = Nil, files,
        iceberg = Some(IcebergAvro.Ctx(
          writeMeta.currentSchema, writeMeta.partitionSpecs,
          writeMeta.defaultSpecId, snapId, base.currentSnapshotId, seq)))
      val (operation, schemaUpdates, requirements) = replaceOf match {
        case None =>
          ("append", Nil,
            Seq(TableRequirement.AssertTableUuid(writeMeta.tableUuid)))
        case Some(plan) =>
          // order matters: retire old specs BEFORE the schema swap (they
          // cannot rebind to the new field ids), add the new spec AFTER
          // it (it binds against the then-current schema)
          ("replace",
            Seq(TableUpdate.AddSchema(plan.schema, Some(plan.lastColumnId))) ++
              (if (plan.removeSpecIds.nonEmpty)
                Seq(TableUpdate.RemovePartitionSpecs(plan.removeSpecIds)) else Nil) ++
              Seq(TableUpdate.SetCurrentSchema(-1)) ++
              plan.newSpec.toSeq.flatMap(sp => Seq(
                TableUpdate.AddSpec(sp), TableUpdate.SetDefaultSpec(-1))),
            Seq(TableRequirement.AssertRefSnapshotId(
              TableMetadata.MainBranch, plan.base.currentSnapshotId)))
      }
      val snapshot = Snapshot(snapId, base.currentSnapshotId, seq,
        System.currentTimeMillis(), manifestLoc,
        Map("operation" -> operation,
          "total-data-files" -> files.size.toString,
          "total-records" -> files.map(_.recordCount).sum.toString),
        schemaId = if (replaceOf.isEmpty) Some(writeMeta.currentSchemaId) else None)
      client.commitTable(prefix, ident(i), requirements,
        schemaUpdates ++ Seq(
          TableUpdate.AddSnapshot(snapshot),
          TableUpdate.SetSnapshotRef(TableMetadata.MainBranch, snapId,
            SnapshotRefType.Branch)))
    }

    /** Create-mode: remove the staged row (hard delete incl. staged —
      * reference DROP semantics). Replace-mode: the pre-existing table
      * is untouched; written files are unreferenced orphans. */
    override def abortStagedChanges(): Unit =
      if (replaceOf.isEmpty) {
        try client.dropTable(prefix, ident(i))
        catch { case _: CatalogError => () }
      }
  }

  /** SQL ALTER TABLE: property changes map to set/remove-properties
    * updates; column changes evolve the current schema through
    * [[SchemaEvolution]] and land as add-schema + set-current-schema(-1)
    * guarded by assert-current-schema-id, so a concurrent evolution
    * conflicts (409) instead of silently clobbering. */
  override def alterTable(i: Identifier, changes: TableChange*): Table = {
    import graft.core.{TableRequirement, TableUpdate}
    val m =
      try client.loadTable(prefix, ident(i)).metadata
      catch { case e: CatalogError if e.code == 404 =>
        throw new NoSuchTableException(i) }

    val sets = changes.collect { case c: TableChange.SetProperty => c.property -> c.value }
    val removes = changes.collect { case c: TableChange.RemoveProperty => c.property }
    val columnChanges = changes.filter {
      case _: TableChange.SetProperty | _: TableChange.RemoveProperty => false
      case _ => true
    }

    var requirements = Seq.empty[TableRequirement]
    var updates = Seq.empty[TableUpdate]
    if (sets.nonEmpty) updates :+= TableUpdate.SetProperties(sets.toMap)
    if (removes.nonEmpty) updates :+= TableUpdate.RemoveProperties(removes)
    if (columnChanges.nonEmpty) {
      val (evolved, lastColumnId) =
        SchemaEvolution.evolve(m.currentSchema, m.lastColumnId, columnChanges,
          partitionSourceIds =
            m.partitionSpecs.values.flatMap(_.fields.map(_.sourceId)).toSet)
      requirements :+= TableRequirement.AssertCurrentSchemaId(m.currentSchemaId)
      updates ++= Seq(
        TableUpdate.AddSchema(evolved, Some(lastColumnId)),
        TableUpdate.SetCurrentSchema(-1))
    }
    if (updates.nonEmpty) client.commitTable(prefix, ident(i), requirements, updates)
    loadTable(i)
  }

  // --------------------------------------- SQL-extension entry points
  /** The engine-side table handle for extension commands (CALL
    * procedures). */
  private[graft] def engineTable(ti: TableIdent): GraftTable =
    new GraftTable(client, prefix, ti)

  /** ALTER TABLE ... ADD PARTITION FIELD: commit a new default spec =
    * current default + the parsed field (existing fields keep their
    * ids, so old files' partition tuples stay interpretable). */
  private[engine] def addPartitionField(ti: TableIdent, transformSql: String): Unit = {
    import graft.core.TableUpdate
    val m = client.loadTable(prefix, ti).metadata
    val field = PartitionFieldSql.parse(transformSql, m.currentSchema)
    val existing = m.defaultSpec.fields.map(f =>
      UnboundPartitionField(f.sourceId, Some(f.fieldId), f.name, f.transform))
    require(!existing.exists(_.name == field.name),
      s"partition field already exists: ${field.name}")
    client.commitTable(prefix, ti, Nil, Seq(
      TableUpdate.AddSpec(UnboundPartitionSpec(None, existing :+ field)),
      TableUpdate.SetDefaultSpec(-1)))
  }

  /** ALTER TABLE ... DROP PARTITION FIELD: commit a new default spec
    * without the matching field (by name or by source+transform). Old
    * specs survive for old snapshots' interpretation. */
  private[engine] def dropPartitionField(ti: TableIdent, refSql: String): Unit = {
    import graft.core.TableUpdate
    val m = client.loadTable(prefix, ti).metadata
    // drop-by-FIELD-NAME first (covers derived names like `id_bucket`
    // that are not schema columns); fall back to transform parsing
    val bare = refSql.trim.stripPrefix("`").stripSuffix("`")
    val remaining =
      if (m.defaultSpec.fields.exists(_.name == bare))
        m.defaultSpec.fields.filterNot(_.name == bare)
      else {
        val target = PartitionFieldSql.parse(refSql, m.currentSchema)
        m.defaultSpec.fields.filterNot(f =>
          f.name == target.name ||
            (f.sourceId == target.sourceId && f.transform == target.transform))
      }
    require(remaining.size < m.defaultSpec.fields.size,
      s"no partition field matches: $refSql")
    client.commitTable(prefix, ti, Nil, Seq(
      TableUpdate.AddSpec(UnboundPartitionSpec(None, remaining.map(f =>
        UnboundPartitionField(f.sourceId, Some(f.fieldId), f.name, f.transform)))),
      TableUpdate.SetDefaultSpec(-1)))
  }

  override def dropTable(i: Identifier): Boolean =
    try { client.dropTable(prefix, ident(i)); true }
    catch { case e: CatalogError if e.code == 404 => false }

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit =
    try client.renameTable(prefix, ident(oldIdent), ident(newIdent))
    catch { case e: CatalogError if e.code == 404 =>
      throw new NoSuchTableException(oldIdent) }

  // ------------------------------------------------------------- views
  // Spark's ViewCatalog connector API over the REST views surface —
  // BEYOND the reference, which 501s every view mutation
  // (catalog/views.rs:84-189). Spark 4.1 ships the interface but no
  // analyzer support, so [[GraftViewResolution]] (injected via
  // spark.sql.extensions) routes SQL view commands and view reads here,
  // the same wiring pattern iceberg-spark uses for its view support.

  override def listViews(namespace: String*): Array[Identifier] =
    try client.listViews(prefix, namespace.toSeq)
      .map(id => Identifier.of(id.namespace.toArray, id.name)).toArray
    catch { case e: CatalogError if e.code == 404 =>
      throw new NoSuchNamespaceException(namespace.toArray) }

  override def loadView(viewIdent: Identifier): View =
    try {
      val lv = client.loadView(prefix, ident(viewIdent))
      new GraftView(viewIdent, lv.metadata)
    } catch { case e: CatalogError if e.code == 404 =>
      throw new org.apache.spark.sql.catalyst.analysis.NoSuchViewException(viewIdent) }

  override def viewExists(viewIdent: Identifier): Boolean =
    client.viewExists(prefix, ident(viewIdent))

  override def createView(info: ViewInfo): View = {
    val (schema, version, props) = GraftView.fromViewInfo(info)
    try {
      val lv = client.createView(prefix, ident(info.ident), schema, version, props)
      new GraftView(info.ident, lv.metadata)
    } catch {
      case e: CatalogError if e.code == 409 =>
        throw new org.apache.spark.sql.catalyst.analysis.ViewAlreadyExistsException(info.ident)
      case e: CatalogError if e.code == 404 =>
        throw new NoSuchNamespaceException(info.ident.namespace())
    }
  }

  override def replaceView(info: ViewInfo, orCreate: Boolean): View = {
    val id = ident(info.ident)
    val (schema, version, props) = GraftView.fromViewInfo(info)
    val existing =
      try Some(client.loadView(prefix, id))
      catch { case e: CatalogError if e.code == 404 => None }
    existing match {
      case None =>
        if (!orCreate)
          throw new org.apache.spark.sql.catalyst.analysis.NoSuchViewException(info.ident)
        createView(info)
      case Some(lv) =>
        // CAS on the loaded uuid: a concurrent replace loses with a 409
        // instead of silently clobbering (same contract as table commits)
        import graft.core.{ViewRequirement, ViewUpdate}
        val old = lv.metadata.properties
        val updates = Seq(
          ViewUpdate.AddSchema(schema),
          ViewUpdate.AddViewVersion(version.copy(schemaId = -1,
            summary = version.summary + ("operation" -> "replace"))),
          ViewUpdate.SetCurrentViewVersion(-1)) ++
          (if (props != old) Seq(ViewUpdate.SetProperties(props)) else Nil) ++ {
            val gone = old.keySet -- props.keySet
            if (gone.nonEmpty) Seq(ViewUpdate.RemoveProperties(gone.toSeq.sorted)) else Nil
          }
        val out = client.commitView(prefix, id,
          Seq(ViewRequirement.AssertViewUuid(lv.metadata.viewUuid)), updates)
        new GraftView(info.ident, out.metadata)
    }
  }

  override def alterView(viewIdent: Identifier, changes: ViewChange*): View = {
    import graft.core.{ViewRequirement, ViewUpdate}
    val sets = changes.collect {
      case c: ViewChange.SetProperty => c.property -> c.value
    }.toMap
    val removes = changes.collect {
      case c: ViewChange.RemoveProperty => c.property
    }
    try {
      val lv = client.loadView(prefix, ident(viewIdent))
      val updates =
        (if (sets.nonEmpty) Seq(ViewUpdate.SetProperties(sets)) else Nil) ++
        (if (removes.nonEmpty) Seq(ViewUpdate.RemoveProperties(removes)) else Nil)
      val out = client.commitView(prefix, ident(viewIdent),
        Seq(ViewRequirement.AssertViewUuid(lv.metadata.viewUuid)), updates)
      new GraftView(viewIdent, out.metadata)
    } catch { case e: CatalogError if e.code == 404 =>
      throw new org.apache.spark.sql.catalyst.analysis.NoSuchViewException(viewIdent) }
  }

  override def dropView(viewIdent: Identifier): Boolean =
    try { client.dropView(prefix, ident(viewIdent)); true }
    catch { case e: CatalogError if e.code == 404 => false }

  override def renameView(oldIdent: Identifier, newIdent: Identifier): Unit =
    try client.renameView(prefix, ident(oldIdent), ident(newIdent))
    catch {
      case e: CatalogError if e.code == 404 =>
        throw new org.apache.spark.sql.catalyst.analysis.NoSuchViewException(oldIdent)
      case e: CatalogError if e.code == 409 =>
        throw new org.apache.spark.sql.catalyst.analysis.ViewAlreadyExistsException(newIdent)
    }

  /** Delegates scans to the parquet table, but exposes NO write
    * capability — used for time-travel loads, which must stay
    * immutable. Snapshots with outstanding MoR delete files read
    * through [[GraftScanBuilder]] (delete-applying scan with pushdown
    * restored). */
  private final class ReadOnlyTable(
      tableName: String, delegate: Table, tableSchema: StructType,
      coreSchema: graft.core.Schema, listing: Seq[Manifests.DataFile],
      props: Map[String, String], pruning: SnapshotPruning)
      extends Table with SupportsRead {
    override def name(): String = tableName
    override def schema(): StructType = tableSchema
    override def properties(): util.Map[String, String] = props.asJava
    override def capabilities(): util.Set[TableCapability] =
      util.EnumSet.of(TableCapability.BATCH_READ)
    override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
      if (listing.exists(_.isDeleteFile) || pruning.spjEligible)
        new GraftScanBuilder(coreSchema, listing, pruning.fileKeeper,
          pruning.defaultSpec, pruning.allSpecs)
      else delegate.asInstanceOf[SupportsRead].newScanBuilder(options)
  }

  /** Reads like [[ReadOnlyTable]]; writes route through [[GraftTable]]'s
    * optimistic snapshot commit (append for INSERT INTO, overwrite for
    * INSERT OVERWRITE / TRUNCATE), so SQL writers get the same
    * requirement-guarded commit path as the programmatic API. Spark has
    * already resolved and cast the incoming query to the table schema
    * (by-position), so the V1 bridge only needs to restore the table's
    * column names before handing off — the data files must carry the
    * table field names for read-by-name snapshot scans. */
  private final class WritableTable(
      tableName: String, tid: TableIdent, delegate: Table, tableSchema: StructType,
      coreSchema: graft.core.Schema, listing: Seq[Manifests.DataFile],
      props: Map[String, String], pruning: SnapshotPruning)
      extends Table with SupportsRead with SupportsWrite with SupportsDelete
      with SupportsRowLevelOperations with SupportsMetadataColumns
      with GraftMergeTarget {
    override def name(): String = tableName
    override def schema(): StructType = tableSchema
    /** SHOW TBLPROPERTIES surface (reference test_spark.py:106-120). */
    override def properties(): util.Map[String, String] = props.asJava
    /** The default spec as V2 transforms — what lets the analyzer
      * accept `INSERT OVERWRITE ... PARTITION (p='v')` (it validates
      * the clause's columns against this) and DESCRIBE report the
      * layout. */
    override def partitioning(): Array[Transform] =
      GraftSparkCatalog.v2Partitioning(coreSchema, pruning.defaultSpec)
    override def capabilities(): util.Set[TableCapability] =
      util.EnumSet.of(
        TableCapability.BATCH_READ,
        TableCapability.V1_BATCH_WRITE,
        // BATCH_WRITE is required by the DYNAMIC overwrite capability
        // check; append/truncate/filter writes still build V1Write and
        // plan through the V1 execs (routing is by Write instance)
        TableCapability.BATCH_WRITE,
        TableCapability.TRUNCATE,
        TableCapability.OVERWRITE_BY_FILTER,
        TableCapability.OVERWRITE_DYNAMIC)

    /** Row-lineage metadata columns — the SupportsDelta row id. Served
      * by [[GraftScanBuilder]] (row-level operation scans and MoR
      * reads). Known limitation: a user query that explicitly projects
      * `_file`/`_pos` on a snapshot WITHOUT delete files routes to the
      * parquet delegate, which cannot produce them, and fails to plan —
      * the row-level framework (their actual consumer) always uses the
      * graft builder, so DML is unaffected. */
    override def metadataColumns(): Array[MetadataColumn] = Array(
      GraftSparkCatalog.metaCol(GraftTable.FileCol,
        org.apache.spark.sql.types.StringType),
      GraftSparkCatalog.metaCol(GraftTable.PosCol,
        org.apache.spark.sql.types.LongType))

    override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
      if (listing.exists(_.isDeleteFile) || pruning.spjEligible)
        new GraftScanBuilder(coreSchema, listing, pruning.fileKeeper,
          pruning.defaultSpec, pruning.allSpecs)
      else delegate.asInstanceOf[SupportsRead].newScanBuilder(options)

    // SQL DELETE FROM ... WHERE: copy-on-write rewrite through the
    // commit path (snapshot operation "delete"); refuses untranslatable
    // predicates so Spark errors rather than over- or under-deleting.
    // With table property write.delete.mode=merge-on-read, an
    // equality-shaped condition commits an O(keys) equality-delete file
    // instead of rewriting the table (see GraftTable.deleteByKeys).
    override def canDeleteWhere(filters: Array[org.apache.spark.sql.sources.Filter]): Boolean =
      FilterBridge.translateAll(filters).isDefined
    override def deleteWhere(filters: Array[org.apache.spark.sql.sources.Filter]): Unit = {
      val spark = SparkSession.active
      val table = new GraftTable(client, prefix, tid)
      val mor = table.metadata.properties.get("write.delete.mode")
        .contains("merge-on-read")
      if (mor) equalityTuples(filters) match {
        case Some((keys, rows)) =>
          val keyTypes = tableSchema.fields.filter(f => keys.contains(f.name))
          val ordered = keys.map(k => keyTypes.find(_.name == k).get)
          val df = spark.createDataFrame(
            rows.map(org.apache.spark.sql.Row.fromSeq).asJava,
            StructType(ordered.map(f => f.copy(nullable = true))))
          table.deleteByKeys(spark, keys, df)
          return
        case None => () // condition not equality-shaped: fall through to CoW
      }
      // unconditioned DELETE = truncate: metadata-only, no per-row
      // delete records
      if (filters.isEmpty ||
          filters.forall(_.isInstanceOf[org.apache.spark.sql.sources.AlwaysTrue])) {
        table.truncate()
        return
      }
      val cond = FilterBridge.translateAll(filters).getOrElse(
        throw new UnsupportedOperationException(
          s"untranslatable delete condition: ${filters.mkString(", ")}"))
      // the match-finding scan prunes files by stats/partitions first:
      // a selective DELETE reads candidate files, not the table
      table.deleteWhere(spark, cond, pruning.fileKeeper(filters.toSeq))
    }

    /** AND of EqualTo filters → one key tuple; a single In → one tuple
      * per value. Anything else is not equality-shaped. Tuples
      * containing NULL are rejected (→ CoW fallback): SQL `x = NULL` /
      * `x IN (…, NULL)` never matches any row, but the MoR scan's
      * null-safe `<=>` anti-join would wrongly delete NULL-key rows. */
    private def equalityTuples(filters: Array[org.apache.spark.sql.sources.Filter])
        : Option[(Seq[String], Seq[Seq[Any]])] = {
      import org.apache.spark.sql.sources.{EqualTo, In}
      val shaped: Option[(Seq[String], Seq[Seq[Any]])] = filters.toSeq match {
        case Seq(In(a, vs)) => Some((Seq(a), vs.toSeq.map(v => Seq(v))))
        case fs if fs.nonEmpty && fs.forall(_.isInstanceOf[EqualTo]) =>
          val eqs = fs.map { case EqualTo(a, v) => a -> v }
          if (eqs.map(_._1).distinct.size != eqs.size) None
          else Some((eqs.map(_._1), Seq(eqs.map(_._2))))
        case _ => None
      }
      shaped.filter { case (_, rows) => rows.forall(_.forall(_ != null)) }
    }

    /** Truncate = full replace; a filter-scoped overwrite (the static
      * `INSERT OVERWRITE ... PARTITION (p='v')` clause) routes through
      * [[GraftTable.overwritePartitions]] — only the matching identity
      * partitions are replaced, everything else carries byte-untouched.
      */
    override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
      new WriteBuilder with SupportsTruncate
          with org.apache.spark.sql.connector.write.SupportsOverwrite
          with org.apache.spark.sql.connector.write.SupportsDynamicOverwrite {
        private var replace = false
        private var dynamic = false
        private var scoped: Array[org.apache.spark.sql.sources.Filter] = Array.empty
        override def truncate(): WriteBuilder = { replace = true; this }
        override def overwrite(
            filters: Array[org.apache.spark.sql.sources.Filter]): WriteBuilder = {
          if (filters.isEmpty || filters.forall(
            _.isInstanceOf[org.apache.spark.sql.sources.AlwaysTrue]))
            replace = true
          else scoped = filters
          this
        }
        override def overwriteDynamicPartitions(): WriteBuilder = {
          dynamic = true; this
        }
        /** Dynamic overwrite has no V1 fallback exec in Spark, so it
          * builds the genuine distributed [[ParquetBatchWrite]] (the
          * row-level operations' write half): tasks stream rows to
          * parquet with their partition tuples riding the commit
          * messages, and the driver commit replaces exactly the tuples
          * written. */
        override def build(): Write =
          if (dynamic) new Write {
            override def description(): String = "graft dynamic overwrite"
            override def toBatch: org.apache.spark.sql.connector.write.BatchWrite = {
              val table = new GraftTable(client, prefix, tid)
              val m = table.metadata
              val spec = m.defaultSpec
              val spark = SparkSession.active
              val writeSchema = SchemaBridge.toSpark(m.currentSchema)
              val dataDir = s"${m.location}/data/${java.util.UUID.randomUUID()}"
              val routing =
                if (spec.isUnpartitioned) None
                else Some(ParquetBatchWrite.PartitionRouting(
                  spec.fields.map(_.name),
                  GraftShims.boundExpressions(spark, writeSchema,
                    PartitionExprs.partitionColumns(spec, m.currentSchema,
                      org.apache.spark.sql.functions.col))))
              val (factory, conf) =
                GraftShims.parquetWriteSpec(spark, writeSchema, Map.empty)
              new ParquetBatchWrite(dataDir, writeSchema, factory, conf, routing,
                files => table.overwriteDynamic(GraftTable.toDataFiles(files)))
            }
          }
          else new V1Write {
            override def toInsertableRelation: InsertableRelation =
              new InsertableRelation {
                override def insert(data: org.apache.spark.sql.DataFrame,
                    overwrite: Boolean): Unit = {
                  require(data.columns.length == tableSchema.length,
                    s"INSERT column count ${data.columns.length} != table arity ${tableSchema.length}")
                  val aligned = data.toDF(tableSchema.fieldNames.toIndexedSeq: _*)
                  val table = new GraftTable(client, prefix, tid)
                  if (scoped.nonEmpty)
                    table.overwritePartitions(aligned, scoped.toSeq)
                  else if (replace || overwrite)
                    table.overwriteAll(aligned, table.metadata.currentSnapshotId)
                  else table.append(aligned)
                }
              }
          }
      }

    /** SQL MERGE INTO / UPDATE / DELETE as DELTA operations
      * (SupportsDelta): the scan surfaces surviving rows plus their
      * `(_file, _pos)` row ids; Spark sends only the CHANGED rows to
      * the write — deletes as row ids, inserts as full rows, updates
      * as delete+insert pairs. The write emits new data files and
      * position-delete files; the commit appends them ON TOP of the
      * base snapshot, carrying every untouched file over unchanged
      * ([[GraftTable.commitDelta]]). A 1-row MERGE therefore writes
      * O(1 row) — never an O(table) rewrite — and concurrent writers
      * 409 on the pinned base. */
    override def newRowLevelOperationBuilder(
        info: RowLevelOperationInfo): RowLevelOperationBuilder =
      new RowLevelOperationBuilder {
        override def build(): RowLevelOperation = new RowLevelOperation
            with org.apache.spark.sql.connector.write.SupportsDelta {
          override def command(): RowLevelOperation.Command = info.command()

          override def rowId(): Array[NamedReference] = Array(
            org.apache.spark.sql.connector.expressions.Expressions
              .column(GraftTable.FileCol),
            org.apache.spark.sql.connector.expressions.Expressions
              .column(GraftTable.PosCol))

          override def representUpdateAsDeleteAndInsert(): Boolean = true

          // the delta scan may filter ROWS freely (no group integrity
          // to preserve): static predicates push down to the parquet
          // scan AND prune the file listing by manifest stats, so a
          // MERGE scoped by partition/range predicates reads candidate
          // files only (key-only conditions still read the table —
          // runtime filtering needs a native V2 batch scan)
          override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
            new GraftScanBuilder(coreSchema, listing, pruning.fileKeeper)

          override def newWriteBuilder(writeInfo: LogicalWriteInfo)
              : org.apache.spark.sql.connector.write.DeltaWriteBuilder =
            new org.apache.spark.sql.connector.write.DeltaWriteBuilder {
              override def build(): org.apache.spark.sql.connector.write.DeltaWrite = {
                val table = new GraftTable(client, prefix, tid)
                val m = table.metadata
                val spec = m.defaultSpec
                val base = m.currentSnapshotId
                val spark = SparkSession.active
                // inserts arrive projected to the table's column order;
                // write them with the id-stamped table schema
                val writeSchema = SchemaBridge.toSpark(m.currentSchema)
                val dataDir = s"${m.location}/data/${java.util.UUID.randomUUID()}"
                val deleteDir = s"${m.location}/deletes/${java.util.UUID.randomUUID()}"
                val routing =
                  if (spec.isUnpartitioned) None
                  else Some(ParquetBatchWrite.PartitionRouting(
                    spec.fields.map(_.name),
                    GraftShims.boundExpressions(spark, writeSchema,
                      PartitionExprs.partitionColumns(spec, m.currentSchema,
                        org.apache.spark.sql.functions.col))))
                new GraftDeltaWrite(dataDir, deleteDir, writeSchema,
                  GraftShims.parquetWriteSpec(spark, writeSchema, Map.empty),
                  GraftShims.parquetWriteSpec(spark, GraftTable.PosDeleteWriteSchema, Map.empty),
                  routing,
                  files =>
                    // an empty delta (nothing matched, nothing inserted)
                    // commits no snapshot
                    if (files.nonEmpty) table.commitDelta(
                      GraftTable.toDataFiles(files),
                      info.command().name().toLowerCase(java.util.Locale.ROOT),
                      base))
              }
            }
        }
      }
  }
}

object GraftSparkCatalog {
  /** Core partition spec → V2 transform array (None / unmappable
    * fields — void, renamed-away sources — are skipped: the analyzer
    * only needs the DECLARABLE dimensions). */
  private[engine] def v2Partitioning(
      schema: graft.core.Schema,
      spec: Option[graft.core.PartitionSpec]): Array[Transform] = {
    import org.apache.spark.sql.connector.expressions.Expressions
    spec.map(_.fields.flatMap { pf =>
      schema.fieldById(pf.sourceId).map(_.name).flatMap { src =>
        pf.transform match {
          case graft.core.Transform.Identity => Some(Expressions.identity(src))
          case graft.core.Transform.Bucket(n) => Some(Expressions.bucket(n, src))
          case graft.core.Transform.Year => Some(Expressions.years(src))
          case graft.core.Transform.Month => Some(Expressions.months(src))
          case graft.core.Transform.Day => Some(Expressions.days(src))
          case graft.core.Transform.Hour => Some(Expressions.hours(src))
          case _ => None
        }
      }
    }.toArray).getOrElse(Array.empty)
  }

  /** Metadata-table identifier suffixes (`SELECT * FROM db.t.files`). */
  val MetadataTables: Set[String] =
    Set("files", "partitions", "refs", "snapshots", "history", "manifests")

  import org.apache.spark.sql.types.{LongType, StringType, StructField}
  private[engine] val FilesTableSchema: StructType = StructType(Seq(
    StructField("file_path", StringType),
    StructField("file_size_in_bytes", LongType),
    StructField("record_count", LongType),
    StructField("partition", StringType)))
  private[engine] val PartitionsTableSchema: StructType = StructType(Seq(
    StructField("partition", StringType),
    StructField("file_count", LongType),
    StructField("record_count", LongType)))

  /** Non-null metadata column (the SupportsDelta row id pieces). */
  private def metaCol(
      colName: String,
      colType: org.apache.spark.sql.types.DataType): MetadataColumn =
    new MetadataColumn {
      override def name(): String = colName
      override def dataType(): org.apache.spark.sql.types.DataType = colType
      override def isNullable: Boolean = false
    }
}
