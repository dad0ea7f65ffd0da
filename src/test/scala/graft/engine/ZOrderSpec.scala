package graft.engine

import graft.SparkTestSession
import graft.catalog._
import graft.server.CatalogServer
import org.apache.spark.sql.execution.datasources.GraftFileIndex
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files
import java.util.UUID

/** Z-order rewrite: after `CALL system.rewrite_data_files(..., zorder
  * => 'x,y')`, each data file covers a small hyper-rectangle of (x, y),
  * so manifest-stats pruning skips files for selective predicates on
  * EITHER column — the property a one-column sort cannot give. */
class ZOrderSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkTestSession.spark
  private val project = UUID.randomUUID()
  private val store = new InMemoryCatalogStore
  private var server: CatalogServer = _
  private val cat = "zo_cat"

  override def beforeAll(): Unit = {
    server = new CatalogServer(store, project).start()
    val whLoc = Files.createTempDirectory("graft-zo").toUri.toString.stripSuffix("/")
    store.createWarehouse(project, "wh", whLoc).fold(e => fail(e.message), identity)
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[GraftSparkCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.uri", server.baseUri)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", "wh")
    spark.sql(s"CREATE NAMESPACE $cat.db")
  }

  override def afterAll(): Unit = server.stop()

  test("zvalue: quantile buckets interleave; nulls cluster low; skew balances") {
    import graft.functions.{ZOrder, ZOrderHelper}
    // bucket = #cuts <= v over the DISTINCT sorted cut array
    val cuts = Array(10.0, 20.0, 30.0)
    assert(ZOrderHelper.bucket(cuts, 5.0) === 0)
    assert(ZOrderHelper.bucket(cuts, 10.0) === 1) // cut value itself steps up
    assert(ZOrderHelper.bucket(cuts, 25.0) === 2)
    assert(ZOrderHelper.bucket(cuts, 99.0) === 3)

    val s = spark
    import s.implicits._
    // pathological skew: 99% of x mass at one value — quantile cuts
    // still split the heavy value's complement; z stays computable
    val df = (1 to 1000).map(i => (if (i <= 990) 7L else i.toLong, i.toLong))
      .toDF("x", "y")
    val z = df.withColumn("z", ZOrder.clusterColumn(df, Seq("x", "y")))
    assert(z.select("z").distinct().count() > 100) // y spreads the code
    // null x lands in bucket 0: z contributed only by y bits
    val zn = df.withColumn("x", org.apache.spark.sql.functions
        .when($"y" === 1L, null).otherwise($"x"))
    val zdf = zn.withColumn("z", ZOrder.clusterColumn(zn, Seq("x", "y")))
    assert(zdf.where($"y" === 1L).select("z").head().getLong(0) >= 0L)
  }

  test("zorder clusters TIMESTAMP columns through their ordinal (r16)") {
    // time is the most common clustering key in practice; the quantile
    // sketch runs over epoch ordinals (order-preserving), so a
    // time-range predicate prunes the rewritten layout
    spark.sql(s"CREATE TABLE $cat.db.zts (ts TIMESTAMP, v BIGINT)")
    spark.sql(
      s"""INSERT INTO $cat.db.zts
         |SELECT timestamp'2024-01-01 00:00:00' + make_interval(0,0,0,0,id,0,0), id
         |FROM range(0, 4096) DISTRIBUTE BY abs(hash(id)) % 16""".stripMargin)
    val before = spark.sql(s"SELECT * FROM $cat.db.zts").collect()
      .map(r => (r.get(0).toString, r.getLong(1))).sorted
    spark.sql(s"CALL $cat.system.rewrite_data_files(" +
      s"table => 'db.zts', target_file_count => 16, zorder => 'ts,v')")
    val after = spark.sql(s"SELECT * FROM $cat.db.zts").collect()
      .map(r => (r.get(0).toString, r.getLong(1))).sorted
    assert(after === before)
    GraftFileIndex.lastPlanned = None
    spark.sql(s"SELECT count(*) FROM $cat.db.zts " +
      "WHERE ts < timestamp'2024-01-08 00:00:00'").collect()
    val p = GraftFileIndex.lastPlanned.get
    assert(p.total === 16)
    assert(p.kept < p.total,
      s"time-range predicate should prune the ts-zordered layout: ${p.kept}/${p.total}")
  }

  test("zorder layout survives write.distribution-mode on a partitioned table") {
    // hash distribution re-clusters ordinary writes by partition tuple;
    // a z-order rewrite must NOT be re-clustered (preserveLayout) or
    // the z-ranges collapse into one file per partition value
    spark.sql(s"CREATE TABLE $cat.db.zo2 (x BIGINT, y BIGINT, p BIGINT) " +
      "PARTITIONED BY (p) " +
      "TBLPROPERTIES ('write.distribution-mode'='hash')")
    spark.sql(
      s"""INSERT INTO $cat.db.zo2
         |SELECT id % 64 AS x, (id DIV 64) % 64 AS y, id % 2 AS p
         |FROM range(0, 4096)""".stripMargin)
    spark.sql(s"CALL $cat.system.rewrite_data_files(" +
      s"table => 'db.zo2', target_file_count => 16, zorder => 'x,y')")

    GraftFileIndex.lastPlanned = None
    spark.sql(s"SELECT count(*) FROM $cat.db.zo2 WHERE y BETWEEN 0 AND 7").collect()
    val planned = GraftFileIndex.lastPlanned.get
    assert(planned.total >= 16, s"z-ranges collapsed: only ${planned.total} files")
    assert(planned.kept < planned.total,
      s"y-pred should prune z-ordered files: ${planned.kept}/${planned.total}")
  }

  test("zorder rewrite prunes on BOTH columns; linear sort only on one") {
    // 64x64 grid, shuffled so pre-rewrite files have no locality at all
    spark.sql(s"CREATE TABLE $cat.db.zo (x BIGINT, y BIGINT, p BIGINT)")
    spark.sql(
      s"""INSERT INTO $cat.db.zo
         |SELECT id % 64 AS x, (id DIV 64) % 64 AS y, id AS p
         |FROM range(0, 4096) DISTRIBUTE BY abs(hash(id)) % 16""".stripMargin)

    val before = spark.sql(s"SELECT * FROM $cat.db.zo").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted

    // --- linear sort rewrite (the strawman): tight x bounds, full-range y
    spark.sql(s"CREATE TABLE $cat.db.lin (x BIGINT, y BIGINT, p BIGINT)")
    spark.sql(
      s"""INSERT INTO $cat.db.lin
         |SELECT x, y, p FROM (SELECT * FROM $cat.db.zo ORDER BY x)
         |DISTRIBUTE BY cast(x / 4 as int)""".stripMargin)

    // --- z-order rewrite through the SQL CALL surface
    spark.sql(s"CALL $cat.system.rewrite_data_files(" +
      s"table => 'db.zo', target_file_count => 16, zorder => 'x,y')")

    // content identical after the rewrite (replace snapshot)
    val after = spark.sql(s"SELECT * FROM $cat.db.zo").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
    assert(after === before)

    def planned(table: String, pred: String): (Int, Int) = {
      GraftFileIndex.lastPlanned = None
      spark.sql(s"SELECT count(*) FROM $cat.db.$table WHERE $pred").collect()
      val p = GraftFileIndex.lastPlanned.get
      (p.kept, p.total)
    }

    // a selective box on x prunes in both layouts
    val (xKeptZ, xTotZ) = planned("zo", "x BETWEEN 0 AND 7")
    assert(xTotZ === 16)
    assert(xKeptZ < xTotZ, s"x-pred should prune zordered files: $xKeptZ/$xTotZ")

    // a selective box on Y: zorder prunes, the x-sorted layout cannot
    // (every x-run spans the full y range)
    val (yKeptZ, yTotZ) = planned("zo", "y BETWEEN 0 AND 7")
    assert(yKeptZ < yTotZ, s"y-pred should prune zordered files: $yKeptZ/$yTotZ")
    val (yKeptL, yTotL) = planned("lin", "y BETWEEN 0 AND 7")
    assert(yKeptL === yTotL, "x-sorted layout has full-range y bounds everywhere")

    // the 2-D box compounds: strictly fewer files than either 1-D cut
    val (boxKept, _) = planned("zo", "x BETWEEN 0 AND 7 AND y BETWEEN 0 AND 7")
    assert(boxKept <= math.min(xKeptZ, yKeptZ))
    assert(boxKept >= 1)
  }
}
