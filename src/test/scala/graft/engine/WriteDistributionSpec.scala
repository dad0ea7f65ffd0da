package graft.engine

import graft.SparkTestSession
import graft.catalog._
import graft.server.CatalogServer
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files
import java.util.UUID

/** `write.distribution-mode=hash`: an unclustered INSERT into a
  * partitioned table produces O(partitions) files, not
  * O(tasks × partitions) — at 1000 executors the difference between a
  * healthy layout and a small-file explosion every commit. */
class WriteDistributionSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkTestSession.spark
  private val project = UUID.randomUUID()
  private val store = new InMemoryCatalogStore
  private var server: CatalogServer = _
  private val cat = "wd_cat"

  override def beforeAll(): Unit = {
    server = new CatalogServer(store, project).start()
    val whLoc = Files.createTempDirectory("graft-wd").toUri.toString.stripSuffix("/")
    store.createWarehouse(project, "wh", whLoc).fold(e => fail(e.message), identity)
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[GraftSparkCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.uri", server.baseUri)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", "wh")
    spark.sql(s"CREATE NAMESPACE $cat.db")
  }

  override def afterAll(): Unit = server.stop()

  private def fileCount(t: String): Long =
    spark.sql(s"SELECT count(*) FROM $cat.db.$t.files").collect().head.getLong(0)

  test("hash distribution writes one file per partition from unclustered input") {
    // interleaved days across 4 input partitions: every task sees every day
    spark.sql(s"CREATE TABLE $cat.db.wd_none (day BIGINT, v BIGINT) " +
      "PARTITIONED BY (day)")
    spark.sql(s"INSERT INTO $cat.db.wd_none " +
      "SELECT /*+ REPARTITION(4, v) */ id % 8 AS day, id AS v FROM range(0, 800)")
    val unclustered = fileCount("wd_none")
    assert(unclustered > 8,
      s"default mode should fan out tasks x partitions, got $unclustered")

    spark.sql(s"CREATE TABLE $cat.db.wd_hash (day BIGINT, v BIGINT) " +
      "PARTITIONED BY (day) " +
      "TBLPROPERTIES ('write.distribution-mode'='hash')")
    spark.sql(s"INSERT INTO $cat.db.wd_hash " +
      "SELECT /*+ REPARTITION(4, v) */ id % 8 AS day, id AS v FROM range(0, 800)")
    assert(fileCount("wd_hash") === 8L,
      "hash mode must land each partition value in exactly one writer")

    // identical content either way
    val a = spark.sql(s"SELECT * FROM $cat.db.wd_none").collect()
      .map(_.toString).sorted
    val b = spark.sql(s"SELECT * FROM $cat.db.wd_hash").collect()
      .map(_.toString).sorted
    assert(a === b)
  }

  test("range distribution also collapses to per-partition files") {
    spark.sql(s"CREATE TABLE $cat.db.wd_range (day BIGINT, v BIGINT) " +
      "PARTITIONED BY (day) " +
      "TBLPROPERTIES ('write.distribution-mode'='range')")
    spark.sql(s"INSERT INTO $cat.db.wd_range " +
      "SELECT /*+ REPARTITION(4, v) */ id % 8 AS day, id AS v FROM range(0, 800)")
    // range exchange: each day's rows are contiguous; allow boundary
    // sharing but still O(partitions), far below tasks x partitions
    val n = fileCount("wd_range")
    assert(n <= 9, s"range mode should cluster partition values, got $n files")
    assert(spark.sql(s"SELECT count(*) FROM $cat.db.wd_range")
      .collect().head.getLong(0) === 800L)
  }
}
