package graft.engine

import graft.SparkTestSession
import graft.catalog._
import graft.server.CatalogServer
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.SortMergeJoinExec
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files
import java.util.UUID

/** Storage-partitioned joins: two tables identity-partitioned on the
  * same column join WITHOUT ANY SHUFFLE when
  * `spark.sql.sources.v2.bucketing.enabled` is set — the scans report
  * KeyGroupedPartitioning from the manifest partition tuples, so each
  * storage partition is one co-located Spark partition on both sides.
  * At 100 TB this is the difference between a fact-fact join moving
  * nothing and moving both tables. */
class SpjSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkTestSession.spark
  private val project = UUID.randomUUID()
  private val store = new InMemoryCatalogStore
  private var server: CatalogServer = _
  private val cat = "spj_cat"

  override def beforeAll(): Unit = {
    server = new CatalogServer(store, project).start()
    val whLoc = Files.createTempDirectory("graft-spj").toUri.toString.stripSuffix("/")
    store.createWarehouse(project, "wh", whLoc).fold(e => fail(e.message), identity)
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[GraftSparkCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.uri", server.baseUri)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", "wh")
    spark.sql(s"CREATE NAMESPACE $cat.db")

    spark.sql(s"CREATE TABLE $cat.db.sales (day BIGINT, amount BIGINT) " +
      "PARTITIONED BY (day)")
    spark.sql(s"CREATE TABLE $cat.db.clicks (day BIGINT, hits BIGINT) " +
      "PARTITIONED BY (day)")
    spark.sql(s"INSERT INTO $cat.db.sales " +
      "SELECT id % 8 AS day, id AS amount FROM range(0, 800)")
    spark.sql(s"INSERT INTO $cat.db.clicks " +
      "SELECT id % 8 AS day, id * 2 AS hits FROM range(0, 400)")
  }

  override def afterAll(): Unit = {
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "false")
    server.stop()
  }

  private def allNodes(p: SparkPlan): Seq[SparkPlan] = p match {
    case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
      p +: allNodes(a.executedPlan)
    case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
      p +: allNodes(q.plan)
    case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec =>
      p +: allNodes(r.child)
    case _ => p +: p.children.flatMap(allNodes)
  }

  private def aggJoin() = spark.sql(
    s"""SELECT s.day, sum(s.amount) AS amt, sum(c.hits) AS hits
       |FROM $cat.db.sales s JOIN $cat.db.clicks c ON s.day = c.day
       |GROUP BY s.day ORDER BY s.day""".stripMargin)

  test("co-partitioned join plans with ZERO shuffles under v2 bucketing") {
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    // broadcast would hide the property under test: both sides are tiny
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val df = aggJoin()
      val rows = df.collect()
      assert(rows.length === 8)
      // oracle: per-day sums (each day has 100 sales x 50 clicks pairs)
      val day0 = rows.head
      assert(day0.getLong(0) === 0L)
      val nodes = allNodes(df.queryExecution.executedPlan)
      val joins = nodes.collect { case j: SortMergeJoinExec => j }
      assert(joins.nonEmpty, "expected a sort-merge join")
      // the join itself consumed storage partitioning: no shuffle below it
      val shufflesBelowJoin = allNodes(joins.head).collect {
        case s: ShuffleExchangeExec => s }
      assert(shufflesBelowJoin.isEmpty,
        s"join inputs were shuffled:\n${joins.head}")

      // value correctness against the same join computed the default way
      spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "false")
      val expect = aggJoin().collect()
      assert(rows.map(_.toString).toSeq === expect.map(_.toString).toSeq)
    } finally {
      spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "false")
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }

  test("bucket-partitioned tables join shuffle-free via the V2 bucket function") {
    spark.sql(s"CREATE TABLE $cat.db.busers (id BIGINT, name STRING) " +
      "PARTITIONED BY (bucket(8, id))")
    spark.sql(s"CREATE TABLE $cat.db.bevents (id BIGINT, n BIGINT) " +
      "PARTITIONED BY (bucket(8, id))")
    spark.sql(s"INSERT INTO $cat.db.busers " +
      "SELECT id, concat('u', id) FROM range(0, 500)")
    spark.sql(s"INSERT INTO $cat.db.bevents " +
      "SELECT id % 500, id FROM range(0, 2000)")

    def run() = spark.sql(
      s"""SELECT u.id, u.name, sum(e.n) AS total
         |FROM $cat.db.busers u JOIN $cat.db.bevents e ON u.id = e.id
         |GROUP BY u.id, u.name ORDER BY u.id""".stripMargin)

    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val df = run()
      val rows = df.collect()
      assert(rows.length === 500)
      val joins = allNodes(df.queryExecution.executedPlan).collect {
        case j: SortMergeJoinExec => j }
      assert(joins.nonEmpty, "expected a sort-merge join")
      val shufflesBelowJoin = allNodes(joins.head).collect {
        case s: ShuffleExchangeExec => s }
      assert(shufflesBelowJoin.isEmpty,
        s"bucket join inputs were shuffled:\n${joins.head}")

      spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "false")
      assert(rows.map(_.toString).toSeq ===
        run().collect().map(_.toString).toSeq)
    } finally {
      spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "false")
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }

  test("spj layout survives runtime file pruning and delete files") {
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      // put a merge-on-read delete on one side: SPJ must still apply it
      spark.sql(s"ALTER TABLE $cat.db.sales " +
        "SET TBLPROPERTIES ('write.delete.mode'='merge-on-read')")
      spark.sql(s"DELETE FROM $cat.db.sales WHERE amount = 0")
      val df = aggJoin()
      val rows = df.collect()
      assert(rows.length === 8)
      spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "false")
      val expect = aggJoin().collect()
      assert(rows.map(_.toString).toSeq === expect.map(_.toString).toSeq)
    } finally {
      spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "false")
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }
}
