package graft.engine

import graft.catalog.TableIdent
import graft.core.{Schema, Transform => ITransform, UnboundPartitionField}
import org.apache.spark.sql.{GraftShims, Row, SparkSession}
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression}
import org.apache.spark.sql.catalyst.parser.{ParseException, ParserInterface}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.types.StructType

/** SQL statements Spark's grammar lacks, intercepted ahead of the
  * session parser (Iceberg ships the same statements via its own
  * extension parser — reference test_spark.py:185-264, 330-357):
  *
  *   ALTER TABLE t ADD PARTITION FIELD <transform>
  *   ALTER TABLE t DROP PARTITION FIELD <transform | name>
  *   CALL cat.system.rewrite_data_files(table => 'db.t'[, target_file_count => N][, zorder => 'x,y'])
  *   CALL cat.system.expire_snapshots(table => 'db.t', older_than_ms => N)
  *   CALL cat.system.remove_orphan_files(table => 'db.t'[, older_than_ms => N])
  *   CALL cat.system.rewrite_manifests(table => 'db.t')
  *   CALL cat.system.rewrite_position_delete_files(table => 'db.t'[, target_file_count => N])
  *   CALL cat.system.convert_equality_deletes(table => 'db.t'[, target_file_count => N])
  *   CALL cat.system.rollback_to_snapshot(table => 'db.t', snapshot_id => N)
  *   CALL cat.system.set_current_snapshot(table => 'db.t', snapshot_id => N)
  *
  * Everything else delegates verbatim. Injected by
  * [[graft.functions.GraftExtensions]] via `spark.sql.extensions`.
  */
final class GraftSqlParser(delegate: ParserInterface) extends ParserInterface {

  override def parsePlan(sqlText: String): LogicalPlan =
    GraftSqlParser.intercept(sqlText).getOrElse(delegate.parsePlan(sqlText))

  override def parseExpression(sqlText: String): Expression =
    delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseQuery(sqlText: String): LogicalPlan =
    delegate.parseQuery(sqlText)
  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)
  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String): org.apache.spark.sql.types.DataType =
    delegate.parseDataType(sqlText)
}

object GraftSqlParser {
  private val AddField =
    """(?is)\s*ALTER\s+TABLE\s+([\w.`]+)\s+ADD\s+PARTITION\s+FIELD\s+(.+?)\s*;?\s*""".r
  private val DropField =
    """(?is)\s*ALTER\s+TABLE\s+([\w.`]+)\s+DROP\s+PARTITION\s+FIELD\s+(.+?)\s*;?\s*""".r
  private val Call =
    """(?is)\s*CALL\s+([\w.`]+)\.system\.(\w+)\s*\((.*)\)\s*;?\s*""".r

  private def intercept(sqlText: String): Option[LogicalPlan] = sqlText match {
    case AddField(table, transform) =>
      Some(AlterPartitionFieldCommand(parts(table), transform.trim, add = true))
    case DropField(table, transform) =>
      Some(AlterPartitionFieldCommand(parts(table), transform.trim, add = false))
    case Call(catalog, proc, args) =>
      Some(CallProcedureCommand(parts(catalog), proc.toLowerCase, args))
    case _ => None
  }

  /** Split a multipart identifier on dots OUTSIDE backticks, then
    * strip the quoting — `` cat.`my.db`.t `` → Seq(cat, my.db, t). */
  private def parts(ident: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    val cur = new StringBuilder
    var quoted = false
    ident.foreach {
      case '`' => quoted = !quoted
      case '.' if !quoted => out += cur.toString; cur.clear()
      case ch => cur.append(ch)
    }
    out += cur.toString
    out.result()
  }
}

/** `<transform sql>` → an unbound partition field, with the same field
  * naming as the DDL transform path ([[GraftSparkCatalog]]'s
  * `toUnboundSpec`): `bucket(16, c)` → `c_bucket`, `truncate(4, c)` →
  * `c_trunc`, `year(c)` → `c_year`, bare `c` → identity. */
private[engine] object PartitionFieldSql {
  private val Bucket = """(?i)bucket\s*\(\s*(\d+)\s*,\s*`?(\w+)`?\s*\)""".r
  private val Trunc = """(?i)truncate\s*\(\s*(\d+)\s*,\s*`?(\w+)`?\s*\)""".r
  private val Unary = """(?i)(years?|months?|days?|hours?)\s*\(\s*`?(\w+)`?\s*\)""".r
  private val Ident = """`?(\w+)`?""".r

  def parse(sql: String, schema: Schema): UnboundPartitionField = {
    def src(col: String): Int = schema.fieldByName(col).getOrElse(
      throw new IllegalArgumentException(s"no such column: $col")).id
    sql.trim match {
      case Bucket(n, c) =>
        UnboundPartitionField(src(c), None, s"${c}_bucket", ITransform.Bucket(n.toInt))
      case Trunc(w, c) =>
        UnboundPartitionField(src(c), None, s"${c}_trunc", ITransform.Truncate(w.toInt))
      case Unary(fn, c) =>
        val (t, suffix) = fn.toLowerCase.stripSuffix("s") match {
          case "year" => (ITransform.Year, "year")
          case "month" => (ITransform.Month, "month")
          case "day" => (ITransform.Day, "day")
          case "hour" => (ITransform.Hour, "hour")
        }
        UnboundPartitionField(src(c), None, s"${c}_$suffix", t)
      case Ident(c) => UnboundPartitionField(src(c), None, c, ITransform.Identity)
      case other =>
        throw new IllegalArgumentException(s"cannot parse partition transform: $other")
    }
  }
}

/** ALTER TABLE ... ADD/DROP PARTITION FIELD — a guarded metadata commit
  * (add-spec + set-default-spec) through the owning catalog. */
final case class AlterPartitionFieldCommand(
    tableParts: Seq[String], transformSql: String, add: Boolean)
    extends LeafRunnableCommand {
  override def output: Seq[Attribute] = Nil
  override def run(spark: SparkSession): Seq[Row] = {
    val (catalog, ti) = GraftSqlCommands.resolve(spark, tableParts)
    if (add) catalog.addPartitionField(ti, transformSql)
    else catalog.dropPartitionField(ti, transformSql)
    Nil
  }
}

/** CALL cat.system.<proc>(...) — the maintenance procedures the
  * reference certifies through iceberg-spark (rewrite_data_files,
  * expire_snapshots). */
final case class CallProcedureCommand(
    catalogParts: Seq[String], procedure: String, args: String)
    extends LeafRunnableCommand {
  override def output: Seq[Attribute] = Nil

  private val TableArg = """(?i)table\s*=>\s*'([^']+)'""".r
  private val CountArg = """(?i)target_file_count\s*=>\s*(\d+)""".r
  private val ZorderArg = """(?i)zorder\s*=>\s*'([^']+)'""".r
  private val OlderArg = """(?i)older_than_ms\s*=>\s*(\d+)""".r
  private val RetainArg = """(?i)retain_last\s*=>\s*(\d+)""".r
  private val SnapshotArg = """(?i)snapshot_id\s*=>\s*(\d+)""".r
  private val BranchArg = """(?i)branch\s*=>\s*'([^']+)'""".r
  private val ToArg = """(?i)to\s*=>\s*'([^']+)'""".r
  private val ViewArg = """(?i)changelog_view\s*=>\s*'([^']+)'""".r
  private val FromSnapArg = """(?i)from_snapshot_id\s*=>\s*(\d+)""".r
  private val ToSnapArg = """(?i)to_snapshot_id\s*=>\s*(\d+)""".r

  override def run(spark: SparkSession): Seq[Row] = {
    require(catalogParts.size == 1, s"expected CALL <catalog>.system.<proc>")
    val tableIdent = TableArg.findFirstMatchIn(args).map(_.group(1)).getOrElse(
      throw new IllegalArgumentException(s"CALL $procedure requires table => '<ident>'"))
    val (catalog, ti) = GraftSqlCommands.resolve(spark,
      catalogParts ++ tableIdent.split('.').toSeq)
    procedure match {
      case "rewrite_data_files" =>
        val target = CountArg.findFirstMatchIn(args).map(_.group(1).toInt).getOrElse(1)
        val zorder = ZorderArg.findFirstMatchIn(args).map(_.group(1))
          .map(_.split(',').map(_.trim).filter(_.nonEmpty).toSeq).getOrElse(Nil)
        catalog.engineTable(ti).rewriteDataFiles(spark, target, zorder)
      case "expire_snapshots" =>
        val olderThan = OlderArg.findFirstMatchIn(args).map(_.group(1).toLong).getOrElse(
          throw new IllegalArgumentException("expire_snapshots requires older_than_ms => N"))
        val retain = RetainArg.findFirstMatchIn(args).map(_.group(1).toInt).getOrElse(1)
        catalog.engineTable(ti).expireSnapshots(olderThan, retain)
      case "remove_orphan_files" =>
        val t = catalog.engineTable(ti)
        OlderArg.findFirstMatchIn(args).map(_.group(1).toLong) match {
          case Some(cutoff) => t.removeOrphanFiles(spark, cutoff)
          case None => t.removeOrphanFiles(spark) // default: 3-day age guard
        }
      case "rewrite_manifests" =>
        catalog.engineTable(ti).rewriteManifests()
      case "rewrite_position_delete_files" =>
        val target = CountArg.findFirstMatchIn(args).map(_.group(1).toInt).getOrElse(1)
        catalog.engineTable(ti).rewritePositionDeleteFiles(spark, target)
      case "convert_equality_deletes" =>
        val target = CountArg.findFirstMatchIn(args).map(_.group(1).toInt).getOrElse(1)
        catalog.engineTable(ti).convertEqualityDeletes(spark, target)
      case "create_changelog_view" =>
        val view = ViewArg.findFirstMatchIn(args).map(_.group(1))
          .getOrElse(throw new IllegalArgumentException(
            "create_changelog_view requires changelog_view => '<name>'"))
        val from = FromSnapArg.findFirstMatchIn(args).map(_.group(1).toLong)
          .getOrElse(throw new IllegalArgumentException(
            "create_changelog_view requires from_snapshot_id => N"))
        val toSnap = ToSnapArg.findFirstMatchIn(args).map(_.group(1).toLong)
        catalog.engineTable(ti).changelogScan(spark, from, toSnap)
          .createOrReplaceTempView(view)
      case "refresh_materialized_view" =>
        // exactly-once tick: incremental (changelog fold) when the MV's
        // defining query is a foldable aggregate, full recompute
        // otherwise, no-op when already current — see
        // [[GraftMaterializedViews.refresh]]
        GraftMaterializedViews.refresh(spark, catalog, ti)
      case "cherrypick_snapshot" =>
        val snapId = SnapshotArg.findFirstMatchIn(args).map(_.group(1).toLong)
          .getOrElse(throw new IllegalArgumentException(
            "cherrypick_snapshot requires snapshot_id => N"))
        catalog.engineTable(ti).cherrypickSnapshot(snapId)
      case "fast_forward" =>
        val branch = BranchArg.findFirstMatchIn(args).map(_.group(1))
          .getOrElse(throw new IllegalArgumentException(
            "fast_forward requires branch => '<name>'"))
        val to = ToArg.findFirstMatchIn(args).map(_.group(1))
          .getOrElse(throw new IllegalArgumentException(
            "fast_forward requires to => '<ref>'"))
        catalog.engineTable(ti).fastForward(branch, to)
      case "rollback_to_snapshot" | "set_current_snapshot" =>
        val snapId = SnapshotArg.findFirstMatchIn(args).map(_.group(1).toLong)
          .getOrElse(throw new IllegalArgumentException(
            s"$procedure requires snapshot_id => N"))
        catalog.engineTable(ti).setCurrentSnapshot(snapId,
          requireAncestor = procedure == "rollback_to_snapshot")
      case other =>
        throw new UnsupportedOperationException(s"unknown procedure: system.$other")
    }
    Nil
  }
}

private[engine] object GraftSqlCommands {
  /** Multipart identifier → (owning GraftSparkCatalog, table ident).
    * The leading part is a catalog name when one is configured under
    * it; otherwise the current catalog owns the whole identifier. */
  def resolve(
      spark: SparkSession, parts: Seq[String]): (GraftSparkCatalog, TableIdent) = {
    require(parts.size >= 2, s"qualified table name required, got: ${parts.mkString(".")}")
    val (plugin, rest) =
      if (parts.size >= 3 && GraftShims.isCatalogName(spark, parts.head))
        (GraftShims.catalogPlugin(spark, Some(parts.head)), parts.tail)
      else (GraftShims.catalogPlugin(spark, None), parts)
    plugin match {
      case g: GraftSparkCatalog => (g, TableIdent(rest.init, rest.last))
      case other => throw new UnsupportedOperationException(
        s"${other.name()} is not a graft catalog")
    }
  }
}
