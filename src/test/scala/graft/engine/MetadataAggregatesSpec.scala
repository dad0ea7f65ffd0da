package graft.engine

import graft.SparkTestSession
import graft.catalog._
import graft.server.CatalogServer
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.ReusedExchangeExec
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files
import java.util.UUID

/** Manifest-answered aggregations: `count(*) / count(c) / min(c) /
  * max(c)` on a delete-free snapshot must plan as a LOCAL scan — zero
  * Spark jobs, zero data-file opens — and agree bit-for-bit with the
  * full-scan answer (pushdown disabled via the session conf). The
  * unsound cases (row filters, outstanding MoR deletes, missing
  * stats, float NaN semantics) must DECLINE and still answer
  * correctly through the scan. */
class MetadataAggregatesSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkTestSession.spark
  private val project = UUID.randomUUID()
  private val store = new InMemoryCatalogStore
  private var server: CatalogServer = _
  private var client: RestCatalogClient = _
  private var prefix: String = _
  private val cat = "graftagg"

  override def beforeAll(): Unit = {
    server = new CatalogServer(store, project).start()
    val whLoc = Files.createTempDirectory("graft-agg").toUri.toString.stripSuffix("/")
    store.createWarehouse(project, "wh", whLoc).fold(e => fail(e.message), identity)
    client = new RestCatalogClient(server.baseUri)
    prefix = client.config("wh")
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[GraftSparkCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.uri", server.baseUri)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", "wh")
    spark.sql(s"CREATE NAMESPACE $cat.db")
  }

  override def afterAll(): Unit = server.stop()

  /** Recurse into AQE/stage/reuse nodes (they hide children from
    * plan.collect). */
  private def allNodes(p: SparkPlan): Seq[SparkPlan] =
    p +: (p match {
      case a: AdaptiveSparkPlanExec => allNodes(a.executedPlan)
      case q: QueryStageExec => allNodes(q.plan)
      case r: ReusedExchangeExec => allNodes(r.child)
      case other => other.children.flatMap(allNodes)
    })

  private def isLocal(df: DataFrame): Boolean = {
    df.collect()
    allNodes(df.queryExecution.executedPlan)
      .exists(_.isInstanceOf[org.apache.spark.sql.execution.LocalTableScanExec])
  }

  /** The answer with pushdown OFF — the full-scan oracle. */
  private def scanned(sql: String): Seq[org.apache.spark.sql.Row] = {
    spark.conf.set(MetadataAggregates.ConfKey, "false")
    try spark.sql(sql).collect().toSeq
    finally spark.conf.unset(MetadataAggregates.ConfKey)
  }

  private def check(sql: String, expectLocal: Boolean): Unit = {
    val df = spark.sql(sql)
    val got = df.collect().toSeq
    assert(got === scanned(sql), s"pushdown answer drifted for: $sql")
    assert(isLocal(df) === expectLocal,
      s"expected local=$expectLocal for: $sql\n${df.queryExecution.executedPlan}")
  }

  test("count/min/max answered from manifests with zero file reads") {
    spark.sql(s"CREATE TABLE $cat.db.m (id BIGINT, s STRING, d DECIMAL(10,2), dt DATE)")
    // three commits → three files, with nulls and a decimal spread
    spark.sql(s"INSERT INTO $cat.db.m VALUES " +
      "(5, 'm', 10.50, DATE'2024-03-01'), (1, 'a', 99.99, DATE'2024-01-15')")
    spark.sql(s"INSERT INTO $cat.db.m VALUES " +
      "(9, 'z', -3.25, DATE'2023-12-31'), (7, NULL, 55.00, NULL)")
    spark.sql(s"INSERT INTO $cat.db.m VALUES (3, 'q', NULL, DATE'2024-06-09')")

    MetadataAggregates.lastAnswered = None
    check(s"SELECT count(*), count(s), count(d), min(id), max(id), " +
      s"min(s), max(s), min(d), max(d), min(dt), max(dt) FROM $cat.db.m",
      expectLocal = true)
    val t = new GraftTable(client, prefix, TableIdent(Seq("db"), "m"))
    val answered = MetadataAggregates.lastAnswered
    assert(answered.exists(_.files === t.planFiles().size),
      s"expected whole-listing answer: $answered")
    assert(answered.exists(_.functions.length === 11))

    // spot-check the values themselves (drift-proof against the oracle
    // helper itself regressing)
    val r = spark.sql(s"SELECT count(*), count(s), min(id), max(s), min(d), " +
      s"max(dt) FROM $cat.db.m").collect().head
    assert(r.getLong(0) === 5L)
    assert(r.getLong(1) === 4L)
    assert(r.getLong(2) === 1L)
    assert(r.getString(3) === "z")
    assert(r.getDecimal(4) === new java.math.BigDecimal("-3.25"))
    assert(r.getDate(5).toString === "2024-06-09")
  }

  test("row filters decline: the scan path answers") {
    check(s"SELECT count(*) FROM $cat.db.m WHERE id > 4", expectLocal = false)
  }

  test("float/double min-max decline (NaN unsoundness); their counts push") {
    spark.sql(s"CREATE TABLE $cat.db.f (x DOUBLE)")
    spark.sql(s"INSERT INTO $cat.db.f VALUES (1.5), (2.5), (NULL)")
    check(s"SELECT min(x), max(x) FROM $cat.db.f", expectLocal = false)
    check(s"SELECT count(x) FROM $cat.db.f", expectLocal = true)
  }

  test("outstanding MoR deletes decline and the scan stays exact") {
    spark.sql(s"CREATE TABLE $cat.db.del (id BIGINT, v STRING)")
    spark.sql(s"INSERT INTO $cat.db.del VALUES (1,'a'), (2,'b'), (3,'c')")
    check(s"SELECT count(*) FROM $cat.db.del", expectLocal = true)
    // untranslatable predicate → row-level MoR delete files
    spark.sql(s"DELETE FROM $cat.db.del WHERE id % 2 = 0")
    val t = new GraftTable(client, prefix, TableIdent(Seq("db"), "del"))
    assert(t.planFiles().exists(_.isDeleteFile), "expected MoR delete files")
    check(s"SELECT count(*), min(id), max(id) FROM $cat.db.del", expectLocal = false)
    assert(spark.sql(s"SELECT count(*) FROM $cat.db.del")
      .collect().head.getLong(0) === 2L)
  }

  test("empty table: count 0, min/max null, still local") {
    spark.sql(s"CREATE TABLE $cat.db.e (id BIGINT, s STRING)")
    val r = spark.sql(s"SELECT count(*), count(id), min(id), max(s) FROM $cat.db.e")
    assert(isLocal(r))
    val row = r.collect().head
    assert(row.getLong(0) === 0L && row.getLong(1) === 0L)
    assert(row.isNullAt(2) && row.isNullAt(3))
  }

  test("count distinct and group by decline") {
    check(s"SELECT count(DISTINCT s) FROM $cat.db.m", expectLocal = false)
    check(s"SELECT s, count(*) FROM $cat.db.m GROUP BY s", expectLocal = false)
  }

  test("partitioned (SPJ-routed) tables answer through the MoR builder") {
    spark.sql(s"CREATE TABLE $cat.db.p (id BIGINT, region STRING) " +
      "PARTITIONED BY (region)")
    spark.sql(s"INSERT INTO $cat.db.p VALUES (1,'eu'), (2,'us'), (3,'eu')")
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    try check(s"SELECT count(*), max(region) FROM $cat.db.p", expectLocal = true)
    finally spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "false")
  }

  test("GROUP BY identity partition columns answered from partition tuples") {
    spark.sql(s"CREATE TABLE $cat.db.g (id BIGINT, region STRING, n INT) " +
      "PARTITIONED BY (region)")
    spark.sql(s"INSERT INTO $cat.db.g VALUES " +
      "(1,'eu',10), (2,'us',20), (3,'eu',NULL), (4,'ap',40)")
    spark.sql(s"INSERT INTO $cat.db.g VALUES (5,'eu',50), (6,'us',NULL)")

    MetadataAggregates.lastAnswered = None
    val sql = s"SELECT region, count(*), count(n), min(id), max(id) " +
      s"FROM $cat.db.g GROUP BY region ORDER BY region"
    check(sql, expectLocal = true)
    assert(MetadataAggregates.lastAnswered.exists(_.groups === 3))
    val rows = spark.sql(sql).collect()
    assert(rows.map(_.getString(0)).toSeq === Seq("ap", "eu", "us"))
    assert(rows.map(_.getLong(1)).toSeq === Seq(1L, 3L, 2L)) // count(*)
    assert(rows.map(_.getLong(2)).toSeq === Seq(1L, 2L, 1L)) // count(n)

    // agg-before-group-column projection order still maps correctly
    check(s"SELECT max(id), region FROM $cat.db.g GROUP BY region ORDER BY region",
      expectLocal = true)
    // grouping by a NON-partition column must run as a scan
    check(s"SELECT n, count(*) FROM $cat.db.g GROUP BY n ORDER BY n",
      expectLocal = false)
  }

  test("GROUP BY declines: bucket transforms and pre-evolution files") {
    // bucket(4, id): the tuple value is a bucket ordinal, not the id
    spark.sql(s"CREATE TABLE $cat.db.gb (id BIGINT, v STRING) " +
      "PARTITIONED BY (bucket(4, id))")
    spark.sql(s"INSERT INTO $cat.db.gb VALUES (1,'a'), (2,'b')")
    check(s"SELECT id, count(*) FROM $cat.db.gb GROUP BY id ORDER BY id",
      expectLocal = false)

    // files written BEFORE the partition field existed carry no tuple key
    spark.sql(s"CREATE TABLE $cat.db.ge (id BIGINT, region STRING)")
    spark.sql(s"INSERT INTO $cat.db.ge VALUES (1,'eu')")
    spark.sql(s"ALTER TABLE $cat.db.ge ADD PARTITION FIELD region")
    spark.sql(s"INSERT INTO $cat.db.ge VALUES (2,'us')")
    check(s"SELECT region, count(*) FROM $cat.db.ge GROUP BY region ORDER BY region",
      expectLocal = false)
  }

  test("GROUP BY with a null partition value: non-string keys group it") {
    spark.sql(s"CREATE TABLE $cat.db.gn (id BIGINT, bucket INT) " +
      "PARTITIONED BY (bucket)")
    spark.sql(s"INSERT INTO $cat.db.gn VALUES (1, 7), (2, NULL), (3, 7), (4, NULL)")
    check(s"SELECT bucket, count(*) FROM $cat.db.gn GROUP BY bucket " +
      "ORDER BY bucket NULLS FIRST", expectLocal = true)
    val rows = spark.sql(s"SELECT bucket, count(*) FROM $cat.db.gn " +
      "GROUP BY bucket ORDER BY bucket NULLS FIRST").collect()
    assert(rows.head.isNullAt(0) && rows.head.getLong(1) === 2L)
    assert(rows(1).getInt(0) === 7 && rows(1).getLong(1) === 2L)
  }

  test("time travel answers from the historical snapshot's manifests") {
    // first snapshot of db.m (before the later inserts): 2 rows
    val t = new GraftTable(client, prefix, TableIdent(Seq("db"), "m"))
    val first = t.metadata.snapshotLog.head.snapshotId
    val df = spark.sql(s"SELECT count(*), max(id) FROM $cat.db.m VERSION AS OF $first")
    assert(isLocal(df))
    val row = df.collect().head
    assert(row.getLong(0) === 2L && row.getLong(1) === 5L)
  }
}
