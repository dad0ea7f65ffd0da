package graft.functions

import graft.SparkTestSession
import graft.core.Transform
import org.scalatest.funsuite.AnyFunSuite

/** The native bucket expression against the pure JVM transform (which
  * itself is pinned to Iceberg spec appendix-B vectors), through both
  * the Column API and SQL registration — and inside codegen. */
class IcebergBucketSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  test("column API matches the spec-pinned JVM transform on every type") {
    import spark.implicits._
    val df = Seq((34, 34L, "iceberg", java.sql.Date.valueOf("2017-11-16")))
      .toDF("i", "l", "s", "d")
    val row = df.select(
      IcebergBucket.bucket(16, $"i"),
      IcebergBucket.bucket(16, $"l"),
      IcebergBucket.bucket(16, $"s"),
      IcebergBucket.bucket(16, $"d")).collect().head
    assert(row.getInt(0) === Transform.Bucket(16)(34))
    assert(row.getInt(1) === Transform.Bucket(16)(34L))
    assert(row.getInt(2) === Transform.Bucket(16)("iceberg"))
    assert(row.getInt(3) === Transform.Bucket(16)(17486)) // date = day ordinal
  }

  test("SQL registration: iceberg_bucket(n, col) usable in plain SQL") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      "select iceberg_bucket(16, 34) as b_int, iceberg_bucket(16, 'iceberg') as b_str")
      .collect().head
    assert(r.getInt(0) === Transform.Bucket(16)(34))
    assert(r.getInt(1) === Transform.Bucket(16)("iceberg"))
  }

  test("stays inside whole-stage codegen over a real scan") {
    GraftFunctions.register(spark)
    val df = spark.range(1, 1001)
      .selectExpr("iceberg_bucket(8, cast(id as int)) as b")
    // all buckets in range, distribution touches every bucket
    val buckets = df.groupBy("b").count().collect().map(_.getInt(0)).toSet
    assert(buckets.subsetOf((0 until 8).toSet))
    assert(buckets.size === 8)
    // the '*' marker on the Project proves the expression compiled into
    // the whole-stage-codegen span (an interpreted fallback loses it)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.linesIterator.next().startsWith("*"), plan)
  }
}
