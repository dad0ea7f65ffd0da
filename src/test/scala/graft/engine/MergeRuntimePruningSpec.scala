package graft.engine

import graft.SparkTestSession
import graft.catalog._
import graft.server.CatalogServer
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files
import java.util.UUID

/** Runtime file pruning on the SQL row-level path: a key-only
  * `MERGE ... ON t.id = s.id` must read CANDIDATE files (those whose
  * manifest stats can hold a source key), not the table — the runtime
  * half of scan planning (Iceberg's SparkBatchQueryScan runtime
  * filtering; the reference's flagship DML is MERGE,
  * test_spark.py:64-81). Static predicates were already pruned at plan
  * time; this covers the case with NO static predicate, where only the
  * source's actual keys — known at execution time — can prune.
  */
class MergeRuntimePruningSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkTestSession.spark
  private val project = UUID.randomUUID()
  private val store = new InMemoryCatalogStore
  private var server: CatalogServer = _
  private var client: RestCatalogClient = _
  private var prefix: String = _
  private val cat = "graftrf"

  override def beforeAll(): Unit = {
    server = new CatalogServer(store, project).start()
    val whLoc = Files.createTempDirectory("graft-rf").toUri.toString.stripSuffix("/")
    store.createWarehouse(project, "wh", whLoc).fold(e => fail(e.message), identity)
    client = new RestCatalogClient(server.baseUri)
    prefix = client.config("wh")
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[GraftSparkCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.uri", server.baseUri)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", "wh")
  }

  override def afterAll(): Unit = server.stop()

  /** Four single-file commits with disjoint id ranges → four data files
    * with disjoint manifest stats bounds. */
  private def mkTable(name: String): GraftTable = {
    import spark.implicits._
    spark.sql(s"CREATE TABLE $cat.db.$name (id INT, v STRING)")
    val t = new GraftTable(client, prefix, TableIdent(Seq("db"), name))
    Seq(1 to 10, 11 to 20, 21 to 30, 31 to 40).foreach { range =>
      t.append(range.map(i => (i, s"v$i")).toDF("id", "v").coalesce(1))
    }
    assert(t.planFiles().count(!_.isDeleteFile) === 4)
    t
  }

  test("key-only SQL MERGE prunes the target scan to candidate files") {
    import spark.implicits._
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.db")
    val t = mkTable("t_rf")
    Seq((3, "up3"), (5, "up5"), (41, "new41")).toDF("id", "v")
      .createOrReplaceTempView("rf_source")

    GraftMorScan.lastRuntimePrune = None
    GraftMorScan.lastPlannedFiles = None
    spark.sql(
      s"""MERGE INTO $cat.db.t_rf t USING rf_source s ON t.id = s.id
         |WHEN MATCHED THEN UPDATE SET v = s.v
         |WHEN NOT MATCHED THEN INSERT *""".stripMargin)

    // the scale property: source keys {3,5,41} overlap ONLY the 1–10
    // file's bounds → the match-finding scan planned 1 of 4 files
    // (captured before any further scan overwrites the counters)
    val prune = GraftMorScan.lastRuntimePrune
    val planned = GraftMorScan.lastPlannedFiles
    assert(prune.isDefined, "runtime filter never reached the MoR scan")
    assert(prune.get.total === 4 && prune.get.kept === 1, prune.toString)
    assert(planned.contains(1))

    // correctness: updates landed, insert landed, rest untouched
    val out = spark.sql(s"SELECT id, v FROM $cat.db.t_rf").collect()
      .map(r => (r.getInt(0), r.getString(1))).toMap
    assert(out(3) === "up3" && out(5) === "up5" && out(41) === "new41")
    assert(out(1) === "v1" && out(40) === "v40" && out.size === 41)
  }

  test("runtime-pruned MERGE stays correct when keys span several files") {
    import spark.implicits._
    val t = mkTable("t_rf2")
    Seq((10, "e10"), (11, "e11"), (35, "e35")).toDF("id", "v")
      .createOrReplaceTempView("rf_source2")

    GraftMorScan.lastRuntimePrune = None
    spark.sql(
      s"""MERGE INTO $cat.db.t_rf2 t USING rf_source2 s ON t.id = s.id
         |WHEN MATCHED THEN UPDATE SET v = s.v
         |WHEN NOT MATCHED THEN INSERT *""".stripMargin)

    val out = spark.sql(s"SELECT id, v FROM $cat.db.t_rf2").collect()
      .map(r => (r.getInt(0), r.getString(1))).toMap
    assert(out(10) === "e10" && out(11) === "e11" && out(35) === "e35")
    assert(out(12) === "v12" && out.size === 40)

    // keys 10,11,35 hit files 1,2,4 — range-based pruning may keep the
    // contiguous span (min..max covers file 3), never fewer than 3
    val prune = GraftMorScan.lastRuntimePrune
    assert(prune.isDefined, "runtime filter never reached the MoR scan")
    assert(prune.get.kept < prune.get.total, prune.toString)
  }
}
