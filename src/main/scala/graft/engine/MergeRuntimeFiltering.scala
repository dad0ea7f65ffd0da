package graft.engine

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{And, Attribute, DynamicPruningSubquery, EqualTo, Expression, PredicateHelper}
import org.apache.spark.sql.catalyst.plans.{Inner, JoinType, LeftOuter, LeftSemi, RightOuter}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join, LogicalPlan, WriteDelta}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.GraftShims
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation

/** Marker for tables whose row-level operation scans understand runtime
  * filters ([[GraftMorScan]]); [[MergeRuntimeFiltering]] only ever
  * touches relations over these. */
private[engine] trait GraftMergeTarget

/** Runtime file pruning for DELTA row-level commands (SQL MERGE /
  * UPDATE / DELETE-with-subquery).
  *
  * Spark's own `RowLevelOperationRuntimeGroupFiltering` covers only
  * GROUP-BASED (copy-on-write) plans, and the generic `PartitionPruning`
  * rule passes on a key-only `MERGE ... ON t.id = s.id` because the
  * source side carries no selective predicate — so with `SupportsDelta`
  * the target scan of a key-only MERGE would plan O(table) files. This
  * rule closes that gap the way Spark's group filter does: it plants a
  * `DynamicPruningSubquery(onlyInBroadcast = false)` over the target
  * relation keyed by the join's equi-keys. Downstream, entirely stock
  * machinery takes over — V2 pushdown keeps subquery filters post-scan,
  * `DataSourceV2Strategy` turns DynamicPruning conditions into
  * `BatchScanExec` runtime filters, and at execution the materialized
  * source keys reach [[GraftMorScan.filter]], which prunes the file
  * listing through manifest stats before any file opens.
  *
  * Injected as a PRE-CBO rule: after operator optimization (stable join
  * shape), immediately before scan pushdown. Scoped to [[WriteDelta]]
  * commands over [[GraftMergeTarget]] tables; join orientation follows
  * DPP soundness (prune the side whose unmatched rows the join drops —
  * never a full-outer side, so `WHEN NOT MATCHED BY SOURCE` plans keep
  * reading the whole table, as they must). The source side is evaluated
  * once more by the pruning subquery; MERGE sources are small relative
  * to the table, which is the entire premise of runtime filtering.
  */
final case class MergeRuntimeFiltering(spark: SparkSession)
    extends Rule[LogicalPlan] with PredicateHelper {

  override def apply(plan: LogicalPlan): LogicalPlan = plan match {
    case wd: WriteDelta if !alreadyInjected(wd.query) =>
      wd.copy(query = wd.query.transformUp { case j: Join => tryInject(j) })
    case _ => plan
  }

  private def alreadyInjected(query: LogicalPlan): Boolean =
    query.exists(_.expressions.exists(_.exists(_.isInstanceOf[DynamicPruningSubquery])))

  /** Can rows of this side that match NO build-side row be dropped from
    * the join output? (Then pruning its scan by build keys is sound.) */
  private def canPrune(side: JoinType => Boolean)(jt: JoinType): Boolean = side(jt)
  private val pruneLeftOk: JoinType => Boolean = {
    case Inner | LeftSemi | RightOuter => true
    case _ => false
  }
  private val pruneRightOk: JoinType => Boolean = {
    case Inner | LeftSemi | LeftOuter => true
    case _ => false
  }

  private def isGraftTarget(r: DataSourceV2Relation): Boolean =
    GraftShims.rowLevelTargetOf(r.table).exists(_.isInstanceOf[GraftMergeTarget])

  private def targetRelation(p: LogicalPlan): Option[DataSourceV2Relation] =
    p.collectFirst { case r: DataSourceV2Relation if isGraftTarget(r) => r }

  private def tryInject(j: Join): Join = j.condition match {
    case Some(cond) =>
      val equi = splitConjunctivePredicates(cond).collect {
        case EqualTo(a: Attribute, b: Attribute) => (a, b)
      }
      if (equi.isEmpty) j
      else targetRelation(j.left).filter(_ => pruneLeftOk(j.joinType)) match {
        case Some(rel) => inject(j, pruneLeft = true, rel, equi)
        case None => targetRelation(j.right).filter(_ => pruneRightOk(j.joinType)) match {
          case Some(rel) => inject(j, pruneLeft = false, rel, equi)
          case None => j
        }
      }
    case None => j
  }

  /** The pruning subquery re-evaluates the build subtree independently
    * of the main join; a non-deterministic source (rand(), sampled or
    * unordered-limited input) could materialize different keys than the
    * join sees and prune files holding genuinely-matching rows. Same
    * guard as Spark's PartitionPruning. */
  private def deterministic(p: LogicalPlan): Boolean =
    !p.exists(_.expressions.exists(e => !e.deterministic))

  private def inject(
      j: Join, pruneLeft: Boolean, rel: DataSourceV2Relation,
      equi: Seq[(Attribute, Attribute)]): Join = {
    val buildSide = if (pruneLeft) j.right else j.left
    if (!deterministic(buildSide)) return j
    val relOut = rel.outputSet
    val buildOut = buildSide.outputSet
    // orient each equi-pair as (target key, source key)
    val pairs = equi.flatMap { case (a, b) =>
      if (relOut.contains(a) && buildOut.contains(b)) Some((a, b))
      else if (relOut.contains(b) && buildOut.contains(a)) Some((b, a))
      else None
    }
    if (pairs.isEmpty) return j
    val cond = pairs.map { case (targetKey, sourceKey) =>
      DynamicPruningSubquery(
        targetKey, buildSide, Seq(sourceKey),
        broadcastKeyIndices = Seq(0), onlyInBroadcast = false): Expression
    }.reduce(And)
    val pruned = (if (pruneLeft) j.left else j.right).transformUp {
      case r: DataSourceV2Relation if r eq rel => Filter(cond, r)
    }
    if (pruneLeft) j.copy(left = pruned) else j.copy(right = pruned)
  }
}
