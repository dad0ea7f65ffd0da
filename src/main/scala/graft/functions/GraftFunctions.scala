package graft.functions

import org.apache.spark.sql.{GraftShims, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SQL-surface registration of the library's native expressions, so
  * `PARTITIONED BY`-style DDL and plain SQL can call them:
  *
  *   iceberg_bucket(n, col) — spec-conformant Iceberg bucket transform
  *
  * Two routes, mirroring how Spark libraries ship functions:
  *  - [[GraftFunctions.register]] on a live session;
  *  - [[GraftExtensions]] via `spark.sql.extensions` config at session
  *    construction (the SparkSessionExtensions injection point).
  */
object GraftFunctions {

  private[functions] val bucketBuilder: Seq[Expression] => Expression = {
    case Seq(n, child) if n.foldable && n.dataType ==
        org.apache.spark.sql.types.IntegerType =>
      IcebergBucket(child, n.eval().asInstanceOf[Int])
    case other => throw new IllegalArgumentException(
      s"iceberg_bucket expects (numBuckets: int literal, col); got ${other.size} args")
  }

  def register(spark: SparkSession): Unit =
    GraftShims.registerFunction(spark, "iceberg_bucket", bucketBuilder)
}

/** `--conf spark.sql.extensions=graft.functions.GraftExtensions`
  *
  * Injects the SQL functions AND the extension parser carrying the
  * statements Spark's grammar lacks (ALTER TABLE ... ADD/DROP PARTITION
  * FIELD, CALL <catalog>.system.<procedure> — see
  * [[graft.engine.GraftSqlParser]]). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  def apply(extensions: SparkSessionExtensions): Unit = {
    extensions.injectFunction((
      FunctionIdentifier("iceberg_bucket"),
      new ExpressionInfo("graft.functions.GraftFunctions", "iceberg_bucket"),
      GraftFunctions.bucketBuilder))
    extensions.injectParser((_, parser) =>
      new graft.engine.GraftSqlParser(parser))
    // runtime file pruning for key-only MERGE/UPDATE/DELETE deltas:
    // planted pre-CBO (post operator optimization, pre scan pushdown)
    extensions.injectPreCBORule(spark =>
      graft.engine.MergeRuntimeFiltering(spark))
    // ViewCatalog wiring: Spark 4.1 ships the connector API but no
    // analyzer support (its ResolveSessionCatalog hard-fails view DDL
    // on any non-session catalog), so graft-catalog view commands are
    // rewritten in the HINT batch — which runs BEFORE that check — and
    // view reads expand via a normal resolution rule (the iceberg-spark
    // RewriteViewCommands/ResolveViews pattern)
    extensions.injectHintResolutionRule(spark =>
      graft.engine.GraftViewCommandRewrite(spark))
    extensions.injectResolutionRule(spark =>
      graft.engine.GraftViewResolution(spark))
  }
}
