package graft.engine

import graft.catalog.TableIdent
import graft.core.{Schema, ViewMetadata, ViewRepresentation, ViewVersion}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.{UnresolvedIdentifier, UnresolvedNamespace, UnresolvedRelation, UnresolvedSubqueryColumnAliases, UnresolvedView}
import org.apache.spark.sql.catalyst.analysis.{ResolvedIdentifier, ResolvedNamespace}
import org.apache.spark.sql.catalyst.expressions.Attribute
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.connector.catalog.{Identifier, View, ViewInfo}
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.{GraftShims, Row}

import java.util
import scala.jdk.CollectionConverters._

/** Spark-facing view handle over Iceberg view-spec metadata. The SQL
  * text of the current version (spark dialect preferred) is the query;
  * Spark-only column metadata (query column names, aliases, comments)
  * rides in view properties under reserved `spark.*` keys, which are
  * stripped back out of [[properties]] — the convention iceberg-spark
  * uses for the same round-trip. */
final class GraftView(viewIdent: Identifier, metadata: ViewMetadata) extends View {
  private def version: ViewVersion = metadata.currentVersion

  override def name(): String = viewIdent.toString
  override def query(): String =
    version.sqlFor("spark").map(_.sql).getOrElse(
      throw new IllegalStateException(s"view $name has no SQL representation"))
  override def currentCatalog(): String = version.defaultCatalog.orNull
  override def currentNamespace(): Array[String] = version.defaultNamespace.toArray
  override def schema(): StructType =
    SchemaBridge.toSpark(metadata.currentSchema)
  override def queryColumnNames(): Array[String] =
    GraftView.unpackNames(metadata.properties.get(GraftView.QueryColumnNamesProp))
  override def columnAliases(): Array[String] =
    GraftView.unpackNames(metadata.properties.get(GraftView.ColumnAliasesProp))
  override def columnComments(): Array[String] =
    GraftView.unpackNames(metadata.properties.get(GraftView.ColumnCommentsProp))
  override def properties(): util.Map[String, String] =
    (metadata.properties -- GraftView.InternalProps +
      ("format-version" -> metadata.formatVersion.toString) +
      ("location" -> metadata.location)).asJava
}

object GraftView {
  /** Reserved view-property keys carrying Spark's extra ViewInfo fields
    * through the engine-agnostic metadata document. */
  val QueryColumnNamesProp = "spark.internal.query-column-names"
  val ColumnAliasesProp = "spark.internal.column-aliases"
  val ColumnCommentsProp = "spark.internal.column-comments"
  val InternalProps: Set[String] =
    Set(QueryColumnNamesProp, ColumnAliasesProp, ColumnCommentsProp)

  private val Sep = "\u001f" // unit separator, same list encoding the REST layer uses
  def packNames(names: Array[String]): String = names.mkString(Sep)
  def unpackNames(packed: Option[String]): Array[String] =
    packed.filter(_.nonEmpty).map(_.split(Sep, -1)).getOrElse(Array.empty)

  /** ViewInfo → (schema, initial version, properties) for the REST
    * create-view request. */
  def fromViewInfo(info: ViewInfo): (Schema, ViewVersion, Map[String, String]) = {
    val schema = SchemaBridge.toIceberg(info.schema)
    val version = ViewVersion(
      versionId = 1,
      timestampMs = 0L, // server stamps
      schemaId = 0,
      summary = Map("operation" -> "create", "engine-name" -> "spark"),
      representations = Seq(ViewRepresentation("spark", info.sql)),
      defaultCatalog = Option(info.currentCatalog),
      defaultNamespace = Option(info.currentNamespace).map(_.toSeq).getOrElse(Nil))
    val extra = Seq(
      QueryColumnNamesProp -> Option(info.queryColumnNames),
      ColumnAliasesProp -> Option(info.columnAliases),
      ColumnCommentsProp -> Option(info.columnComments))
      .collect { case (k, Some(names)) if names.nonEmpty =>
        k -> packNames(names.map(n => if (n == null) "" else n)) }
    (schema, version, info.properties.asScala.toMap ++ extra)
  }
}

/** Shared identifier→graft-catalog resolution for the two view rules. */
private[engine] trait GraftViewIdents {
  def spark: SparkSession

  /** Multipart identifier (or already-resolved identifier) → owning
    * graft catalog + ident, when the catalog IS a graft catalog. */
  protected def graftIdent(child: LogicalPlan): Option[(GraftSparkCatalog, Identifier)] =
    child match {
      case UnresolvedIdentifier(parts, _) => graftParts(parts)
      case UnresolvedView(parts, _, _, _) => graftParts(parts)
      case r: ResolvedIdentifier => r.catalog match {
        case g: GraftSparkCatalog => Some((g, r.identifier))
        case _ => None
      }
      case _ => None
    }

  protected def graftParts(parts: Seq[String]): Option[(GraftSparkCatalog, Identifier)] = {
    val (plugin, rest) =
      if (parts.size >= 2 && GraftShims.isCatalogName(spark, parts.head))
        (GraftShims.catalogPlugin(spark, Some(parts.head)), parts.tail)
      else (GraftShims.catalogPlugin(spark, None), parts)
    plugin match {
      case g: GraftSparkCatalog if rest.nonEmpty =>
        Some((g, Identifier.of(rest.init.toArray, rest.last)))
      case _ => None
    }
  }

  protected def graftNamespace(ns: LogicalPlan): Option[(GraftSparkCatalog, Seq[String])] =
    ns match {
      case UnresolvedNamespace(parts, _) =>
        val (plugin, rest) =
          if (parts.nonEmpty && GraftShims.isCatalogName(spark, parts.head))
            (GraftShims.catalogPlugin(spark, Some(parts.head)), parts.tail)
          else (GraftShims.catalogPlugin(spark, None), parts)
        plugin match {
          case g: GraftSparkCatalog => Some((g, rest))
          case _ => None
        }
      case r: ResolvedNamespace => r.catalog match {
        case g: GraftSparkCatalog => Some((g, r.namespace))
        case _ => None
      }
      case _ => None
    }
}

/** Rewrites SQL view COMMANDS against a graft catalog into runnable
  * commands. Injected as a HINT-resolution rule: that batch runs before
  * the main Resolution batch, which matters because Spark's own
  * `ResolveSessionCatalog` hard-fails `CreateView` for any non-session
  * catalog (MISSING_CATALOG_ABILITY.VIEWS, ResolveSessionCatalog.scala:469
  * in 4.1.2) before appended resolution rules get a look. Statements:
  *
  *   CREATE [OR REPLACE] VIEW [IF NOT EXISTS] cat.ns.v [cols] AS <query>
  *   ALTER VIEW cat.ns.v AS <query>
  *   DROP VIEW [IF EXISTS] cat.ns.v
  *   SHOW VIEWS IN cat.ns
  *   ALTER VIEW cat.ns.v SET/UNSET TBLPROPERTIES
  *
  * Non-graft targets pass through untouched, keeping Spark's native
  * temp/session-catalog view behavior intact. */
final case class GraftViewCommandRewrite(spark: SparkSession)
    extends Rule[LogicalPlan] with GraftViewIdents {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.resolveOperatorsUp {
    case c @ CreateView(child, userCols, comment, _, props, originalText,
        query, allowExisting, replace, _) =>
      graftIdent(child) match {
        case Some((cat, id)) =>
          CreateGraftViewCommand(cat, id, userCols.map { case (n, cm) => (n, cm) },
            comment, props, originalText, query, allowExisting, replace)
        case None => c
      }
    case d @ DropView(child, ifExists) =>
      graftIdent(child) match {
        case Some((cat, id)) => DropGraftViewCommand(cat, id, ifExists)
        case None => d
      }
    case s @ ShowViews(ns, pattern, output) =>
      graftNamespace(ns) match {
        case Some((cat, nsParts)) => ShowGraftViewsCommand(cat, nsParts, pattern, output)
        case None => s
      }
    case s @ SetViewProperties(child, props) =>
      graftIdent(child) match {
        case Some((cat, id)) => AlterGraftViewPropsCommand(cat, id, props, Nil)
        case None => s
      }
    case s @ UnsetViewProperties(child, keys, ifExists) =>
      graftIdent(child) match {
        case Some((cat, id)) =>
          AlterGraftViewPropsCommand(cat, id, Map.empty, keys, ifExists)
        case None => s
      }
    case a @ AlterViewAs(child, originalText, query) =>
      graftIdent(child) match {
        case Some((cat, id)) =>
          CreateGraftViewCommand(cat, id, Nil, None, Map.empty,
            Some(originalText), query, allowExisting = false, replace = true,
            requireExists = true)
        case None => a
      }
    case s @ ShowCreateTable(child, _, output) =>
      // SHOW CREATE TABLE on a graft VIEW: reconstruct the DDL from the
      // stored definition (the table path stays native — this case
      // only claims identifiers that resolve to a view)
      (child match {
        case u: org.apache.spark.sql.catalyst.analysis.UnresolvedTableOrView =>
          graftParts(u.multipartIdentifier)
        case _ => None
      }) match {
        case Some((cat, id)) if cat.viewExists(id) =>
          ShowCreateGraftViewCommand(cat, id, output)
        case _ => s
      }
    case m @ CreateMaterializedViewAsSelect(
        child, columns, partitioning, tableSpec, query, originalText, ifNotExists) =>
      graftIdent(child) match {
        case Some((cat, id)) =>
          val props = tableSpec match {
            case t: UnresolvedTableSpec => t.properties
            case t: TableSpec => t.properties
            case _ => Map.empty[String, String]
          }
          CreateGraftMaterializedViewCommand(cat, id, columns.map(_.name),
            partitioning, query, originalText, ifNotExists, props)
        case None => m
      }
  }
}

/** Expands reads of graft views: an [[UnresolvedRelation]] naming a
  * view in a graft catalog becomes the view's stored SQL, qualified and
  * aliased. Injected as a normal resolution rule so it runs AFTER the
  * core ResolveRelations within each fixed-point iteration — a name
  * that resolves as a table never reaches this rule, so table reads
  * never pay a view-endpoint round-trip. */
final case class GraftViewResolution(spark: SparkSession)
    extends Rule[LogicalPlan] with GraftViewIdents {

  /** Hand-rolled recursion (not `resolveOperatorsUp`) so the expansion
    * PATH travels with the traversal: each view expands eagerly into
    * its definition, carrying the chain of enclosing view names. A
    * cycle (v1 → v2 → v1) is the name reappearing on its own chain —
    * caught with a message naming the loop, instead of the analyzer's
    * generic max-iterations failure. A diamond (v_top → {v_a, v_b} →
    * v_base) is legal: each branch carries its own path. */
  override def apply(plan: LogicalPlan): LogicalPlan =
    GraftShims.allowTransformsInAnalyzer { expandAll(plan, Vector.empty) }

  private def expandAll(plan: LogicalPlan, path: Vector[String]): LogicalPlan =
    plan match {
      case u @ UnresolvedRelation(parts, _, false) =>
        lookupView(parts) match {
          case Some((cat, id, view)) =>
            val key = (cat.name() +: id.namespace().toSeq :+ id.name()).mkString(".")
            if (path.contains(key))
              throw new IllegalStateException(
                s"view cycle detected: ${(path :+ key).mkString(" -> ")}")
            if (path.size >= GraftViewResolution.MaxNestedDepth)
              throw new IllegalStateException(
                s"view nesting deeper than ${GraftViewResolution.MaxNestedDepth}: " +
                  (path :+ key).mkString(" -> "))
            expandAll(
              GraftViewResolution.expand(spark, cat, id, view), path :+ key)
          case None => u
        }
      case p => p.mapChildren(expandAll(_, path))
    }

  private def lookupView(parts: Seq[String])
      : Option[(GraftSparkCatalog, Identifier, View)] =
    graftParts(parts).flatMap { case (cat, id) =>
      // only a plausible view name costs a round-trip: the relation is
      // still unresolved here, so the table lookup already 404'd
      try Some((cat, id, cat.loadView(id)))
      catch { case _: Exception => None }
    }
}

object GraftViewResolution {

  /** Qualify bare relation names in stored SQL with the definition's
    * default catalog/namespace: a bare `t` must keep meaning THAT t no
    * matter where the view (or materialized view) is consumed from.
    * Shared by view expansion and materialized-view refresh. */
  private[engine] def qualifyRelations(
      spark: SparkSession, plan: LogicalPlan,
      defCat: Option[String], defNs: Seq[String]): LogicalPlan =
    plan.transformUp {
      case u @ UnresolvedRelation(parts, opts, false) =>
        val full = parts match {
          case Seq(t) if defNs.nonEmpty =>
            defCat.toSeq ++ defNs :+ t
          case p @ +:(head, _) if defCat.isDefined &&
              !GraftShims.isCatalogName(spark, head) && p.size == defNs.size + 1 =>
            defCat.toSeq ++ p
          case p => p
        }
        if (full == parts) u else UnresolvedRelation(full, opts, isStreaming = false)
    }

  /** Nested-view expansion cap: Spark's own views cap at
    * `spark.sql.view.maxNestedViewDepth`; a fixed cap keeps this
    * self-contained. Enforced along the expansion PATH in
    * [[GraftViewResolution.apply]] — a ThreadLocal depth counter would
    * be dead code here, because each `expand` call returns before the
    * nested view's relations are looked at. */
  private[engine] val MaxNestedDepth = 10

  /** Parse the stored SQL, qualify bare relation names with the view's
    * default catalog/namespace, re-apply the stored column names
    * positionally, and alias the subtree with the view name. */
  private[engine] def expand(
      spark: SparkSession, cat: GraftSparkCatalog, id: Identifier,
      view: View): LogicalPlan = {
    val parsed = spark.sessionState.sqlParser.parsePlan(view.query)
    val defCat = Option(view.currentCatalog)
    val defNs = view.currentNamespace.toSeq
    val qualified = qualifyRelations(spark, parsed, defCat, defNs)
    val named = view.schema().fieldNames.toSeq match {
      case names if names.nonEmpty =>
        UnresolvedSubqueryColumnAliases(names, qualified)
      case _ => qualified
    }
    SubqueryAlias(id.name, named)
  }
}

/** CREATE [OR REPLACE] VIEW — analyzes the defining query for the view
  * schema, then creates/replaces through the ViewCatalog (REST
  * create-view / commit-view under the hood). */
final case class CreateGraftViewCommand(
    catalog: GraftSparkCatalog,
    viewIdent: Identifier,
    userCols: Seq[(String, Option[String])],
    comment: Option[String],
    props: Map[String, String],
    originalText: Option[String],
    query: LogicalPlan,
    allowExisting: Boolean,
    replace: Boolean,
    requireExists: Boolean = false)
    extends LeafRunnableCommand {
  override def output: Seq[Attribute] = Nil
  override def run(spark: SparkSession): Seq[Row] = {
    val sql = originalText.getOrElse(throw new IllegalArgumentException(
      "CREATE VIEW requires the original query text"))
    val analyzed = spark.sessionState.executePlan(query).analyzed
    if (userCols.nonEmpty && userCols.size != analyzed.output.size)
      throw new IllegalArgumentException(
        s"view column list has ${userCols.size} names but query produces " +
          s"${analyzed.output.size} columns")
    val fields = analyzed.output.zipWithIndex.map { case (attr, i) =>
      val name = userCols.lift(i).map(_._1).getOrElse(attr.name)
      org.apache.spark.sql.types.StructField(name, attr.dataType, attr.nullable)
    }
    val mgr = spark.sessionState.catalogManager
    val exists = catalog.viewExists(viewIdent)
    if (requireExists && !exists)
      throw new org.apache.spark.sql.catalyst.analysis.NoSuchViewException(viewIdent)
    // ALTER VIEW ... AS changes only the QUERY: properties and comment
    // set earlier survive (Spark's native ALTER VIEW AS preserves them
    // too) — without this carry, replaceView's diff-against-empty would
    // emit RemoveProperties for every existing key
    val carried: Map[String, String] =
      if (requireExists)
        catalog.loadView(viewIdent).properties().asScala.toMap --
          Seq("format-version", "location")
      else Map.empty
    val info = new ViewInfo(
      viewIdent, sql, mgr.currentCatalog.name(), mgr.currentNamespace,
      StructType(fields),
      analyzed.output.map(_.name).toArray,
      (if (userCols.nonEmpty) userCols.map(_._1) else Seq.empty[String]).toArray,
      (if (userCols.exists(_._2.isDefined))
        userCols.map(_._2.getOrElse("")) else Seq.empty[String]).toArray,
      (carried ++ props ++ comment.map("comment" -> _)).asJava)
    if (exists && allowExisting) return Nil // CREATE VIEW IF NOT EXISTS: no-op
    if (replace) catalog.replaceView(info, /* orCreate = */ !requireExists)
    else catalog.createView(info)
    Nil
  }
}

final case class DropGraftViewCommand(
    catalog: GraftSparkCatalog, viewIdent: Identifier, ifExists: Boolean)
    extends LeafRunnableCommand {
  override def output: Seq[Attribute] = Nil
  override def run(spark: SparkSession): Seq[Row] = {
    val dropped = catalog.dropView(viewIdent)
    if (!dropped && !ifExists)
      throw new org.apache.spark.sql.catalyst.analysis.NoSuchViewException(viewIdent)
    Nil
  }
}

final case class ShowGraftViewsCommand(
    catalog: GraftSparkCatalog, namespace: Seq[String],
    pattern: Option[String], override val output: Seq[Attribute])
    extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    val ns = if (namespace.nonEmpty) namespace
      else spark.sessionState.catalogManager.currentNamespace.toSeq
    catalog.listViews(ns: _*)
      .filter(id => pattern.forall(p =>
        org.apache.spark.sql.catalyst.util.StringUtils
          .filterPattern(Seq(id.name), p).nonEmpty))
      .map(id => Row(id.namespace().mkString("."), id.name, false)).toSeq
  }
}

final case class ShowCreateGraftViewCommand(
    catalog: GraftSparkCatalog, viewIdent: Identifier,
    override val output: Seq[Attribute])
    extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    val v = catalog.loadView(viewIdent)
    val cols = v.schema().fields
      .map(f => s"  ${f.name} ${f.dataType.sql}").mkString(",\n")
    val props = v.properties().asScala.toSeq.sortBy(_._1)
      .filterNot { case (k, _) => k == "location" || k == "format-version" }
      .map { case (k, x) => s"  '$k' = '$x'" }
    val tbl = if (props.nonEmpty)
      props.mkString("\nTBLPROPERTIES (\n", ",\n", ")") else ""
    Seq(Row(
      s"CREATE VIEW ${viewIdent.toString} (\n$cols)$tbl AS\n${v.query}"))
  }
}

final case class AlterGraftViewPropsCommand(
    catalog: GraftSparkCatalog, viewIdent: Identifier,
    sets: Map[String, String], removes: Seq[String], ifExists: Boolean = true)
    extends LeafRunnableCommand {
  override def output: Seq[Attribute] = Nil
  override def run(spark: SparkSession): Seq[Row] = {
    import org.apache.spark.sql.connector.catalog.ViewChange
    val changes: Seq[ViewChange] =
      sets.toSeq.sortBy(_._1).map { case (k, v) => ViewChange.setProperty(k, v) } ++
        removes.map(ViewChange.removeProperty)
    catalog.alterView(viewIdent, changes: _*)
    Nil
  }
}
