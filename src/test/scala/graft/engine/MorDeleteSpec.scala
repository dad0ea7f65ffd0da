package graft.engine

import graft.SparkTestSession
import graft.catalog._
import graft.core._
import graft.server.CatalogServer
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files
import java.util.UUID

/** Merge-on-read equality deletes: delete files commit O(keys) work,
  * scans subtract them from older-sequence data files, later
  * re-inserts of the same key survive, and compaction materializes the
  * deletes away (the Iceberg v2 delete-file model, re-expressed on our
  * manifest + anti-join scan).
  */
class MorDeleteSpec extends AnyFunSuite with BeforeAndAfterAll {
  import IType._

  private lazy val spark = SparkTestSession.spark
  private val project = UUID.randomUUID()
  private val store = new InMemoryCatalogStore
  private var server: CatalogServer = _
  private var client: RestCatalogClient = _
  private var prefix: String = _

  override def beforeAll(): Unit = {
    server = new CatalogServer(store, project).start()
    val whLoc = Files.createTempDirectory("graft-mor").toUri.toString.stripSuffix("/")
    store.createWarehouse(project, "wh", whLoc).fold(e => fail(e.message), identity)
    client = new RestCatalogClient(server.baseUri)
    prefix = client.config("wh")
    client.createNamespace(prefix, Seq("db"))
  }

  override def afterAll(): Unit = server.stop()

  private val schema = Schema(0, Seq(
    NestedField.required(1, "id", TInt),
    NestedField.optional(2, "v", TString)))

  private def table(name: String): GraftTable = {
    client.createTable(prefix, TableIdent(Seq("db"), name), schema)
    new GraftTable(client, prefix, TableIdent(Seq("db"), name))
  }

  private def rows(t: GraftTable): Set[(Int, String)] =
    t.scan(spark).collect().map(r => (r.getInt(0), r.getString(1))).toSet

  test("equality delete hides matching rows without rewriting data files") {
    import spark.implicits._
    val t = table("t_mor")
    t.append(Seq((1, "a"), (2, "b"), (3, "c")).toDF("id", "v"))
    val dataFilesBefore = t.planFiles().filterNot(_.isDeleteFile).map(_.path).toSet

    t.deleteByKeys(spark, Seq("id"), Seq((2, "x")).toDF("id", "v"))
    assert(rows(t) === Set((1, "a"), (3, "c")))

    // data files untouched; one delete file appeared with the key column
    val after = t.planFiles()
    assert(after.filterNot(_.isDeleteFile).map(_.path).toSet === dataFilesBefore)
    val dels = after.filter(_.isDeleteFile)
    // keys recorded by FIELD ID (rename-safe), not by name
    assert(dels.size === 1 && dels.head.equalityIds === Seq(1))
    assert(t.metadata.currentSnapshot.get.summary("operation") === "delete")
  }

  test("re-inserted keys survive: deletes only reach older sequences") {
    import spark.implicits._
    val t = table("t_seq")
    t.append(Seq((1, "old"), (2, "other")).toDF("id", "v"))
    t.deleteByKeys(spark, Seq("id"), Seq(1).toDF("id"))
    assert(rows(t) === Set((2, "other")))

    // same key written AFTER the delete is visible
    t.append(Seq((1, "new")).toDF("id", "v"))
    assert(rows(t) === Set((1, "new"), (2, "other")))

    // a second delete of the key hides the newer row too
    t.deleteByKeys(spark, Seq("id"), Seq(1).toDF("id"))
    assert(rows(t) === Set((2, "other")))
  }

  test("multi-column keys and time travel across a MoR delete") {
    import spark.implicits._
    val t = table("t_multi")
    t.append(Seq((1, "a"), (1, "b"), (2, "a")).toDF("id", "v"))
    val preDelete = t.metadata.currentSnapshotId.get
    t.deleteByKeys(spark, Seq("id", "v"), Seq((1, "a")).toDF("id", "v"))
    assert(rows(t) === Set((1, "b"), (2, "a")))
    // the pre-delete snapshot still reads everything
    assert(t.scan(spark, t.AtSnapshot(preDelete)).count() === 3)
  }

  test("compaction materializes deletes and drops delete files") {
    import spark.implicits._
    val t = table("t_compact")
    t.append(Seq((1, "a"), (2, "b"), (3, "c")).toDF("id", "v"))
    t.deleteByKeys(spark, Seq("id"), Seq(3).toDF("id"))
    assert(t.planFiles().exists(_.isDeleteFile))

    t.rewriteDataFiles(spark, targetFileCount = 1)
    val files = t.planFiles()
    assert(!files.exists(_.isDeleteFile) && files.size === 1)
    assert(rows(t) === Set((1, "a"), (2, "b")))
  }

  test("MERGE-upsert on a table with outstanding MoR deletes") {
    import spark.implicits._
    val t = table("t_upsert")
    t.append(Seq((1, "a"), (2, "b")).toDF("id", "v"))
    t.deleteByKeys(spark, Seq("id"), Seq(1).toDF("id"))
    t.upsert(spark, Seq((2, "B"), (9, "Z")).toDF("id", "v"), Seq("id"))
    assert(rows(t) === Set((2, "B"), (9, "Z")))
  }

  test("NULL-keyed equality deletes survive the bounds gate (r16 regression)") {
    import spark.implicits._
    val t = table("t_nullkey")
    // one data file whose v stats are min=max='p' with one NULL
    t.append(Seq((1, "p"), (2, null: String)).toDF("id", "v"))
    // one delete file carrying a far-away non-null key AND a NULL key:
    // its v bounds ('zz'..'zz') are provably disjoint from the data
    // file's ('p'..'p') — the bounds gate must still load it, because
    // the NULL delete key is invisible to min/max and matches the
    // data file's NULL row null-safely
    t.deleteByKeys(spark, Seq("v"),
      Seq((9, "zz"), (9, null: String)).toDF("id", "v"))
    assert(rows(t) === Set((1, "p")),
      "the NULL-keyed delete row must retire the NULL-valued data row")
  }

  test("equality deletes on BINARY key columns match by content, not reference") {
    import spark.implicits._
    val binSchema = Schema(0, Seq(
      NestedField.required(1, "k", TBinary),
      NestedField.optional(2, "v", TString)))
    client.createTable(prefix, TableIdent(Seq("db"), "t_bin"), binSchema)
    val t = new GraftTable(client, prefix, TableIdent(Seq("db"), "t_bin"))
    t.append(Seq(
      (Array[Byte](1, 2), "a"), (Array[Byte](3, 4), "b"), (Array[Byte](5), "c"))
      .toDF("k", "v"))
    t.deleteByKeys(spark, Seq("k"), Seq(Array[Byte](3, 4)).toDF("k"))
    // the deleted key's bytes come from a DIFFERENT array instance than
    // the data rows' — content equality must still kill the row
    val left = t.scan(spark).collect().map(_.getString(1)).toSet
    assert(left === Set("a", "c"))
  }

  test("upsert evaluates an expensive source exactly once (persisted)") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, udf}
    val t = table("t_srconce")
    t.append(Seq((1, "a"), (2, "b")).toDF("id", "v"))

    // every per-row evaluation of the source ticks the accumulator:
    // bounds aggregation + match join + data write would otherwise
    // recompute it, tripling the count
    val acc = spark.sparkContext.longAccumulator("src-evals")
    val tick = udf((i: Int) => { acc.add(1L); i })
    val source = Seq((2, "B2"), (3, "C")).toDF("id", "v")
      .withColumn("id", tick(col("id")))

    t.upsert(spark, source, Seq("id"))
    assert(rows(t) === Set((1, "a"), (2, "B2"), (3, "C")))
    assert(acc.value === 2L,
      s"source rows evaluated ${acc.value} times for a 2-row source")
  }
}
