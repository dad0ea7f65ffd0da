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

  /** The dedup family's native text-hash expressions as plain SQL
    * functions, so users compose their own pipelines in SQL with the
    * exact codegen'd primitives the built-in operators use (and the
    * same cross-engine md5 hash contract):
    *
    *   simhash60(tokens)        — 60-bit SimHash of array<string>
    *   shingle_hashes(tokens)   — distinct 3-gram shingle hashes
    *   window_hashes(tokens, w) — rolling w-token window hashes
    */
  private[functions] val simhashBuilder: Seq[Expression] => Expression = {
    case Seq(toks) => SimHash60(toks)
    case other => throw new IllegalArgumentException(
      s"simhash60 expects (tokens: array<string>); got ${other.size} args")
  }
  private[functions] val shingleBuilder: Seq[Expression] => Expression = {
    case Seq(toks) => ShingleHashes(toks)
    case other => throw new IllegalArgumentException(
      s"shingle_hashes expects (tokens: array<string>); got ${other.size} args")
  }
  private[functions] val windowBuilder: Seq[Expression] => Expression = {
    case Seq(toks, w) if w.foldable &&
        w.dataType == org.apache.spark.sql.types.IntegerType =>
      WindowHashes(toks, w.eval().asInstanceOf[Int])
    case other => throw new IllegalArgumentException(
      s"window_hashes expects (tokens: array<string>, w: int literal); got ${other.size} args")
  }

  private[functions] val all: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "iceberg_bucket" -> bucketBuilder,
    "simhash60" -> simhashBuilder,
    "shingle_hashes" -> shingleBuilder,
    "window_hashes" -> windowBuilder)

  def register(spark: SparkSession): Unit =
    all.foreach { case (name, b) => GraftShims.registerFunction(spark, name, b) }
}

/** `--conf spark.sql.extensions=graft.functions.GraftExtensions`
  *
  * Injects the SQL functions AND the extension parser carrying the
  * statements Spark's grammar lacks (ALTER TABLE ... ADD/DROP PARTITION
  * FIELD, CALL <catalog>.system.<procedure> — see
  * [[graft.engine.GraftSqlParser]]). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  def apply(extensions: SparkSessionExtensions): Unit = {
    GraftFunctions.all.foreach { case (name, builder) =>
      extensions.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo("graft.functions.GraftFunctions", name),
        builder))
    }
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
