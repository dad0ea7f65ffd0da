package graft.engine

import graft.SparkTestSession
import graft.catalog._
import graft.server.CatalogServer
import org.apache.spark.sql.execution.datasources.GraftFileIndex
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files
import java.util.UUID

/** The IVF inverted lists MATERIALIZED as a cell-partitioned engine
  * table — the layout [[graft.llm.Similarity]]'s docstrings promise at
  * scale: each cell's vectors land in that partition's files, and a
  * probe reading P of K cells plans only those cells' files (observable
  * through the file planner's pruning counters). */
class IvfIndexLayoutSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"
  private val project = UUID.randomUUID()
  private val store = new InMemoryCatalogStore
  private var server: CatalogServer = _
  private val cat = "graftivf"

  override def beforeAll(): Unit = {
    server = new CatalogServer(store, project).start()
    val whLoc = Files.createTempDirectory("graft-ivf").toUri.toString.stripSuffix("/")
    store.createWarehouse(project, "wh", whLoc).fold(e => fail(e.message), identity)
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[GraftSparkCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.uri", server.baseUri)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", "wh")
    spark.sql(s"CREATE NAMESPACE $cat.db")
  }

  override def afterAll(): Unit = server.stop()

  test("cell-partitioned IVF index: probes plan only the probed cells' files") {
    spark.sql(s"CREATE TABLE $cat.db.ivf (vec_id BIGINT, cell INT, e ARRAY<DOUBLE>) " +
      "PARTITIONED BY (cell)")
    val index = graft.llm.Similarity.ivfIndex(spark, sf)
    index.createOrReplaceTempView("ivf_src")
    spark.sql(s"INSERT INTO $cat.db.ivf SELECT vec_id, cell, e FROM ivf_src")

    // layout sanity: several inverted lists, each in its own partition
    val cells = spark.sql(s"SELECT DISTINCT cell FROM $cat.db.ivf")
      .collect().map(_.getInt(0)).sorted
    assert(cells.length > 1, "need multiple cells for pruning to mean anything")
    val occupancy = graft.llm.Similarity.ivfIndex(spark, sf)
      .groupBy("cell").count().collect().map(r => r.getInt(0) -> r.getLong(1)).toMap

    // single-cell read (one inverted list): a strict file subset plans
    GraftFileIndex.lastPlanned = None
    val one = spark.sql(s"SELECT count(*) FROM $cat.db.ivf WHERE cell = ${cells.head}")
      .collect().head.getLong(0)
    assert(one === occupancy(cells.head))
    val planned = GraftFileIndex.lastPlanned.get
    assert(planned.table === "ivf")
    assert(planned.total >= cells.length,
      s"expected at least one file per cell, planned $planned")
    assert(planned.kept < planned.total, s"expected cell pruning, got $planned")

    // multi-probe read (P cells of K, the qIvfTopK access pattern)
    val probes = cells.take(2).mkString(", ")
    GraftFileIndex.lastPlanned = None
    val probed = spark.sql(
      s"SELECT count(*) FROM $cat.db.ivf WHERE cell IN ($probes)")
      .collect().head.getLong(0)
    assert(probed === cells.take(2).map(occupancy).sum)
    val plannedProbe = GraftFileIndex.lastPlanned.get
    assert(plannedProbe.kept < plannedProbe.total,
      s"expected probe pruning, got $plannedProbe")
    assert(plannedProbe.kept >= 2, s"two probed cells plan >= 2 files: $plannedProbe")

    // the embedding payload survives the round trip intact for rerank
    val row = spark.sql(s"SELECT vec_id, e FROM $cat.db.ivf WHERE cell = ${cells.head} " +
      "ORDER BY vec_id LIMIT 1").collect().head
    val direct = index.filter(s"vec_id = ${row.getLong(0)}")
      .select("e").collect().head.getSeq[Double](0)
    assert(row.getSeq[Double](1) === direct)
  }
}
