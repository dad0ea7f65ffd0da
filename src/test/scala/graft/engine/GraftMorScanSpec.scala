package graft.engine

import graft.SparkTestSession
import graft.catalog._
import graft.server.CatalogServer
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files
import java.util.UUID

/** The native MoR/row-level batch scan under adversarial physical
  * layout: ONE data file spanning many parquet row groups, scanned as
  * MANY splits — row positions must stay file-global and exact through
  * both (the row-index column the reader relies on is computed from
  * row-group metadata, so a split in the middle of the file must not
  * shift positions), or position deletes kill the wrong rows. */
class GraftMorScanSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkTestSession.spark
  private val project = UUID.randomUUID()
  private val store = new InMemoryCatalogStore
  private var server: CatalogServer = _
  private var client: RestCatalogClient = _
  private var prefix: String = _
  private val cat = "graftmor2"

  override def beforeAll(): Unit = {
    server = new CatalogServer(store, project).start()
    val whLoc = Files.createTempDirectory("graft-mor2").toUri.toString.stripSuffix("/")
    store.createWarehouse(project, "wh", whLoc).fold(e => fail(e.message), identity)
    client = new RestCatalogClient(server.baseUri)
    prefix = client.config("wh")
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[GraftSparkCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.uri", server.baseUri)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", "wh")
    spark.sql(s"CREATE NAMESPACE $cat.db")
  }

  override def afterAll(): Unit = server.stop()

  test("positions stay exact across row groups and scan splits") {
    // tiny parquet row groups at write, tiny splits at read
    spark.conf.set("spark.hadoop.parquet.block.size", "32768")
    spark.conf.set("spark.hadoop.parquet.page.size", "4096")
    try {
      spark.sql(s"CREATE TABLE $cat.db.big (id BIGINT, v STRING)")
      val t = new GraftTable(client, prefix, TableIdent(Seq("db"), "big"))
      t.append(spark.range(0, 100000)
        .selectExpr("id", "concat('v-', id) as v").coalesce(1).toDF())
      val files = t.planFiles()
      assert(files.size === 1)
      // enough bytes for many 32 KB row groups and many 64 KB splits
      assert(files.head.sizeBytes > 256 * 1024L, s"file too small: ${files.head.sizeBytes}")

      // modulo predicate: untranslatable → the DELTA row-level path
      // (scan produces (_file,_pos) row ids, write commits pos-deletes)
      spark.sql(s"DELETE FROM $cat.db.big WHERE id % 1000 = 0")
      assert(new GraftTable(client, prefix, TableIdent(Seq("db"), "big"))
        .planFiles().exists(_.isPositionDeleteFile))

      spark.conf.set("spark.sql.files.maxPartitionBytes", "65536")
      // exactly the 100 deleted rows are gone — a single off-by-one
      // position under any split would break one of these
      assert(spark.sql(s"SELECT count(*) FROM $cat.db.big")
        .collect().head.getLong(0) === 99900L)
      assert(spark.sql(s"SELECT * FROM $cat.db.big WHERE id % 1000 = 0").count() === 0L)
      assert(spark.sql(s"SELECT sum(id) FROM $cat.db.big").collect().head.getLong(0) ===
        (0L until 100000L).sum - (0L until 100000L by 1000).sum)
      // neighbors of deleted positions survive with intact values
      val near = spark.sql(
        s"SELECT id, v FROM $cat.db.big WHERE id IN (999, 1001, 49999, 50001)")
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(near === Map(999L -> "v-999", 1001L -> "v-1001",
        49999L -> "v-49999", 50001L -> "v-50001"))

      // row-level UPDATE over the already-MoR table, still under tiny
      // splits: the matched row's (_file,_pos) must address the right row
      spark.sql(s"UPDATE $cat.db.big SET v = 'updated' WHERE id = 54321")
      assert(spark.sql(s"SELECT v FROM $cat.db.big WHERE id = 54321")
        .collect().map(_.getString(0)).toSeq === Seq("updated"))
      assert(spark.sql(
        s"SELECT v FROM $cat.db.big WHERE id IN (54320, 54322) ORDER BY id")
        .collect().map(_.getString(0)).toSeq === Seq("v-54320", "v-54322"))
      assert(spark.sql(s"SELECT count(*) FROM $cat.db.big")
        .collect().head.getLong(0) === 99900L)
    } finally {
      spark.conf.unset("spark.sql.files.maxPartitionBytes")
      spark.conf.unset("spark.hadoop.parquet.block.size")
      spark.conf.unset("spark.hadoop.parquet.page.size")
    }
  }

  test("equality-delete files with disjoint key bounds never load for other files") {
    import spark.implicits._
    spark.sql(s"CREATE TABLE $cat.db.eqprune (id BIGINT, v STRING)")
    val t = new GraftTable(client, prefix, TableIdent(Seq("db"), "eqprune"))
    // two data files with disjoint id ranges
    t.append((0L until 1000L).map(i => (i, s"a$i")).toDF("id", "v").coalesce(1))
    t.append((1000L until 2000L).map(i => (i, s"b$i")).toDF("id", "v").coalesce(1))
    // delete keys entirely inside the FIRST file's range
    t.deleteByKeys(spark, Seq("id"), (0L until 100L by 10).toDF("id"))

    // scan ONLY the second file's range: a pushed filter prunes the
    // listing to file 2, whose key bounds are disjoint from the delete
    // file's — the delete set must never load
    GraftDeleteCache.loads.set(0L)
    assert(spark.sql(s"SELECT count(*) FROM $cat.db.eqprune WHERE id >= 1000")
      .collect().head.getLong(0) === 1000L)
    assert(GraftDeleteCache.loads.get() === 0L,
      "delete set loaded for a data file its bounds cannot touch")

    // full scan: the set loads (once) and the deletes apply
    assert(spark.sql(s"SELECT count(*) FROM $cat.db.eqprune")
      .collect().head.getLong(0) === 1990L)
    assert(GraftDeleteCache.loads.get() === 1L)
  }

  test("manifest statistics auto-broadcast a small MoR table (no hint)") {
    import spark.implicits._
    // small dim table CARRYING A DELETE FILE — scan path is GraftMorScan
    spark.sql(s"CREATE TABLE $cat.db.statsdim (id BIGINT, name STRING)")
    val dim = new GraftTable(client, prefix, TableIdent(Seq("db"), "statsdim"))
    dim.append((0L until 50L).map(i => (i, s"n$i")).toDF("id", "name").coalesce(1))
    dim.deleteByKeys(spark, Seq("id"), Seq(49L).toDF("id"))
    spark.sql(s"CREATE TABLE $cat.db.statsfact (id BIGINT, x BIGINT)")
    val fact = new GraftTable(client, prefix, TableIdent(Seq("db"), "statsfact"))
    fact.append((0L until 5000L).map(i => (i % 50, i)).toDF("id", "x").coalesce(4))

    // optimizer sees manifest-derived stats, not "unknown = huge"
    val dimDf = spark.sql(s"SELECT * FROM $cat.db.statsdim")
    val sz = dimDf.queryExecution.optimizedPlan.stats.sizeInBytes
    assert(sz < 10L * 1024 * 1024, s"dim stats should be file-sized, got $sz")

    val joined = spark.sql(
      s"""SELECT f.x, d.name FROM $cat.db.statsfact f
         |JOIN $cat.db.statsdim d ON f.id = d.id""".stripMargin)
    assert(joined.count() === 4900L) // id 49 deleted from dim
    def allNodes(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.execution.SparkPlan] = p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        p +: allNodes(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        p +: allNodes(q.plan)
      case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec =>
        p +: allNodes(r.child)
      case _ => p +: p.children.flatMap(allNodes)
    }
    val bhj = allNodes(joined.queryExecution.executedPlan).collect {
      case b: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec => b
    }
    assert(bhj.nonEmpty,
      "small MoR dim table was not auto-broadcast — stats missing?")
  }

  test("partition-disjoint churn never loads other partitions' delete sets") {
    import spark.implicits._
    // SAME surrogate-id range in both partitions: key bounds on id
    // alone cannot separate them — only the partition column's bounds
    // keep partition-b tasks from loading partition-a's delete sets
    spark.sql(s"CREATE TABLE $cat.db.pdisj (id BIGINT, cat STRING, v STRING) " +
      "PARTITIONED BY (cat)")
    val t = new GraftTable(client, prefix, TableIdent(Seq("db"), "pdisj"))
    t.append((0L until 1000L).map(i => (i, "a", s"a$i")).toDF("id", "cat", "v").coalesce(1))
    t.append((0L until 1000L).map(i => (i, "b", s"b$i")).toDF("id", "cat", "v").coalesce(1))
    // churn scoped to partition a via composite (id, cat) keys
    t.deleteByKeys(spark, Seq("id", "cat"),
      (0L until 100L by 10).map(i => (i, "a")).toDF("id", "cat"))

    GraftDeleteCache.loads.set(0L)
    assert(spark.sql(s"SELECT count(*) FROM $cat.db.pdisj WHERE cat = 'b'")
      .collect().head.getLong(0) === 1000L)
    assert(GraftDeleteCache.loads.get() === 0L,
      "partition-b scan loaded partition-a's delete set")

    // the full scan loads the set (once) and applies it
    assert(spark.sql(s"SELECT count(*) FROM $cat.db.pdisj")
      .collect().head.getLong(0) === 1990L)
    assert(GraftDeleteCache.loads.get() === 1L)
  }

  test("equality deletes apply across splits; pushed filters stay correct") {
    import spark.implicits._
    spark.sql(s"CREATE TABLE $cat.db.eqbig (id BIGINT, grp STRING)")
    val t = new GraftTable(client, prefix, TableIdent(Seq("db"), "eqbig"))
    t.append(spark.range(0, 20000)
      .selectExpr("id", "concat('g', id % 7) as grp").coalesce(2).toDF())
    t.deleteByKeys(spark, Seq("id"), (0L until 20000L by 40).toDF("id"))

    spark.conf.set("spark.sql.files.maxPartitionBytes", "65536")
    try {
      assert(spark.sql(s"SELECT count(*) FROM $cat.db.eqbig")
        .collect().head.getLong(0) === 19500L)
      // a pushed residual filter composes with the eq-delete sets
      assert(spark.sql(s"SELECT count(*) FROM $cat.db.eqbig WHERE id < 1000")
        .collect().head.getLong(0) === 975L)
      // re-insert AFTER the delete: higher sequence, keys survive
      t.append(Seq((0L, "revived")).toDF("id", "grp"))
      assert(spark.sql(s"SELECT grp FROM $cat.db.eqbig WHERE id = 0")
        .collect().map(_.getString(0)).toSeq === Seq("revived"))
    } finally spark.conf.unset("spark.sql.files.maxPartitionBytes")
  }

  test("fileKey matches full scheme-stripped paths, not name suffixes") {
    // same path under divergent URI forms → one key
    assert(GraftDeleteCache.fileKey("file:/wh/t/data/part-0-1.parquet") ===
      GraftDeleteCache.fileKey("/wh/t/data/part-0-1.parquet"))
    assert(GraftDeleteCache.fileKey("file:///wh/t/data/part-0-1.parquet") ===
      GraftDeleteCache.fileKey("/wh/t/data/part-0-1.parquet"))
    assert(GraftDeleteCache.fileKey("s3://bkt/wh/t/data/part-0-1.parquet") ===
      "/wh/t/data/part-0-1.parquet")
    // SAME file name under different parents must NOT collide (nested
    // layouts / cross-job name reuse would mis-apply position deletes)
    assert(GraftDeleteCache.fileKey("/wh/t/p=1/data/part-0-1.parquet") !==
      GraftDeleteCache.fileKey("/wh/t/p=2/data/part-0-1.parquet"))
  }

  test("pushFilters declines nested (dotted) and non-table references") {
    import org.apache.spark.sql.sources.{EqualTo, Filter}
    val coreSchema = graft.core.Schema(0, Seq(
      graft.core.NestedField(1, "id", required = true, graft.core.IType.TLong)))
    val b = new GraftScanBuilder(coreSchema, Nil)
    val dotted: Filter = EqualTo("s.x", 1)
    val meta: Filter = EqualTo(GraftTable.FileCol, "f")
    val ok: Filter = EqualTo("id", 1L)
    val residual = b.pushFilters(Array(dotted, meta, ok))
    // accepted filters are removed from Spark's post-scan evaluation, so
    // anything the residual predicate can't bind must come back
    assert(residual.toSet === Set(dotted, meta))
    assert(b.pushedFilters().toSeq === Seq(ok))
  }
}
