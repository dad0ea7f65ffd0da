package graft.engine

import graft.SparkTestSession
import graft.catalog._
import graft.core.{IType, NestedField, PartitionField, PartitionSpec, Schema, Transform}
import graft.server.CatalogServer
import org.apache.spark.sql.execution.datasources.GraftFileIndex
import org.apache.spark.sql.sources._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files
import java.util.UUID

/** Plan-time file skipping: manifest column stats + partition tuples
  * decide which files a pushed predicate can possibly match
  * ([[StatsPruning]] unit behavior), and the SQL read path actually
  * skips them ([[GraftFileIndex]] end-to-end), including the
  * match-finding scans of row-level operations (upsert). */
class FileSkippingSpec extends AnyFunSuite with BeforeAndAfterAll {

  // ------------------------------------------------- StatsPruning unit
  private val schema = Schema(0, Seq(
    NestedField(1, "id", required = true, IType.TLong),
    NestedField(2, "name", required = false, IType.TString),
    NestedField(3, "d", required = false, IType.TDate),
    NestedField(4, "cat", required = false, IType.TString)))

  private def file(
      stats: Map[Int, Manifests.ColumnStats] = Map.empty,
      partition: Map[String, String] = Map.empty,
      rows: Long = 100L) =
    Manifests.DataFile("/x.parquet", 1L, rows, partition, stats = stats)

  private def cs(min: String, max: String, nulls: Long = 0L) =
    Manifests.ColumnStats(Some(min), Some(max), Some(nulls))

  private def keep(f: Manifests.DataFile, filters: Filter*)(
      parts: Map[String, StatsPruning.PartField] = Map.empty): Boolean =
    StatsPruning.keeper(schema, parts, filters)(f)

  test("equality and range prune by min/max; unknown columns never prune") {
    val f = file(stats = Map(1 -> cs("100", "200")))
    assert(keep(f, EqualTo("id", 150L))())
    assert(!keep(f, EqualTo("id", 99L))())
    assert(!keep(f, EqualTo("id", 201L))())
    assert(keep(f, GreaterThan("id", 199L))())
    assert(!keep(f, GreaterThan("id", 200L))())
    assert(keep(f, GreaterThanOrEqual("id", 200L))())
    assert(!keep(f, LessThan("id", 100L))())
    assert(keep(f, LessThanOrEqual("id", 100L))())
    assert(keep(f, In("id", Array(1L, 150L)))())
    assert(!keep(f, In("id", Array(1L, 99L)))())
    // filters on columns without stats / not in schema: keep
    assert(keep(f, EqualTo("name", "zzz"))())
    assert(keep(f, EqualTo("nope", 1))())
    // And / Or composition
    assert(!keep(f, And(EqualTo("id", 150L), EqualTo("id", 99L)))())
    assert(keep(f, Or(EqualTo("id", 99L), EqualTo("id", 150L)))())
  }

  test("null-count pruning: IsNull / IsNotNull / all-null files") {
    val noNulls = file(stats = Map(2 -> cs("a", "m", nulls = 0)))
    val someNulls = file(stats = Map(2 -> cs("a", "m", nulls = 5)))
    val allNull = file(stats = Map(2 ->
      Manifests.ColumnStats(None, None, Some(100L))), rows = 100L)
    assert(!keep(noNulls, IsNull("name"))())
    assert(keep(someNulls, IsNull("name"))())
    assert(keep(allNull, IsNull("name"))())
    assert(!keep(allNull, IsNotNull("name"))())
    assert(!keep(allNull, EqualTo("name", "b"))())
    assert(!keep(allNull, GreaterThan("name", "a"))())
  }

  test("string bounds: prefix predicates") {
    val f = file(stats = Map(2 -> cs("delta", "hotel")))
    assert(keep(f, StringStartsWith("name", "echo"))())
    assert(keep(f, StringStartsWith("name", "del"))())
    assert(keep(f, StringStartsWith("name", "hot"))())
    assert(!keep(f, StringStartsWith("name", "alpha"))())
    assert(!keep(f, StringStartsWith("name", "zulu"))())
  }

  test("identity partition values act as exact bounds, dates canonicalized") {
    val parts = Map("cat" -> StatsPruning.PartField("cat", 4, Transform.Identity),
      "d" -> StatsPruning.PartField("d", 3, Transform.Identity))
    val f = file(partition = Map("cat" -> "books", "d" -> "2026-08-12"))
    assert(keep(f, EqualTo("cat", "books"))(parts))
    assert(!keep(f, EqualTo("cat", "games"))(parts))
    assert(!keep(f, IsNull("cat"))(parts))
    assert(keep(f, EqualTo("d", java.sql.Date.valueOf("2026-08-12")))(parts))
    assert(!keep(f, EqualTo("d", java.sql.Date.valueOf("2026-08-11")))(parts))
    assert(!keep(f, GreaterThan("d", java.sql.Date.valueOf("2026-08-12")))(parts))
    val nullPart = file(partition = Map("cat" -> StatsPruning.NullSentinel))
    assert(keep(nullPart, IsNull("cat"))(parts))
    assert(!keep(nullPart, IsNotNull("cat"))(parts))
    assert(!keep(nullPart, EqualTo("cat", "books"))(parts))
  }

  test("transform partitions: bucket equality, day/truncate ranges") {
    val bucketParts = Map("id_bucket" ->
      StatsPruning.PartField("id_bucket", 1, Transform.Bucket(8)))
    val b = Transform.Bucket(8).apply(77L)
    val fIn = file(partition = Map("id_bucket" -> b.toString))
    val fOut = file(partition = Map("id_bucket" -> ((b + 1) % 8).toString))
    assert(keep(fIn, EqualTo("id", 77L))(bucketParts))
    assert(!keep(fOut, EqualTo("id", 77L))(bucketParts))
    // bucket is not monotonic: ranges never prune through it
    assert(keep(fOut, GreaterThan("id", 77L))(bucketParts))

    val dayParts = Map("d_day" -> StatsPruning.PartField("d_day", 3, Transform.Day))
    val day = java.time.LocalDate.parse("2026-08-12").toEpochDay
    val fDay = file(partition = Map("d_day" -> day.toString))
    assert(keep(fDay, EqualTo("d", java.sql.Date.valueOf("2026-08-12")))(dayParts))
    assert(!keep(fDay, EqualTo("d", java.sql.Date.valueOf("2026-08-13")))(dayParts))
    assert(!keep(fDay, GreaterThan("d", java.sql.Date.valueOf("2026-08-13")))(dayParts))
    assert(keep(fDay, GreaterThan("d", java.sql.Date.valueOf("2026-08-11")))(dayParts))
    assert(!keep(fDay, LessThan("d", java.sql.Date.valueOf("2026-08-11")))(dayParts))

    val truncParts = Map("name_trunc" ->
      StatsPruning.PartField("name_trunc", 2, Transform.Truncate(3)))
    val fT = file(partition = Map("name_trunc" -> "del"))
    assert(keep(fT, EqualTo("name", "delta"))(truncParts))
    assert(!keep(fT, EqualTo("name", "echo"))(truncParts))
    assert(!keep(fT, GreaterThan("name", "zulu"))(truncParts))
  }

  test("delete files and filterless scans always survive") {
    val del = Manifests.DataFile("/d.parquet", 1L, 10L,
      content = Manifests.ContentPositionDeletes)
    assert(keep(del, EqualTo("id", 1L))())
    val f = file(stats = Map(1 -> cs("100", "200")))
    assert(StatsPruning.keeper(schema, Map.empty, Nil)(f))
  }

  test("partFields drops Void and conflicting names") {
    val s1 = PartitionSpec(0, Seq(
      PartitionField(1, 1000, "id_bucket", Transform.Bucket(4)),
      PartitionField(2, 1001, "v", Transform.Void)))
    val s2 = PartitionSpec(1, Seq(
      PartitionField(1, 1000, "id_bucket", Transform.Bucket(8))))
    val fields = StatsPruning.partFields(Seq(s1, s2))
    assert(!fields.contains("v"))
    assert(!fields.contains("id_bucket")) // bucket[4] vs bucket[8] conflict
    assert(StatsPruning.partFields(Seq(s1)).contains("id_bucket"))
  }

  // --------------------------------------------------------- end-to-end
  private lazy val spark = SparkTestSession.spark
  private val project = UUID.randomUUID()
  private val store = new InMemoryCatalogStore
  private var server: CatalogServer = _
  private var client: RestCatalogClient = _
  private var prefix: String = _
  private val cat = "graftskip"

  override def beforeAll(): Unit = {
    server = new CatalogServer(store, project).start()
    val whLoc = Files.createTempDirectory("graft-skip").toUri.toString.stripSuffix("/")
    store.createWarehouse(project, "wh", whLoc).fold(e => fail(e.message), identity)
    client = new RestCatalogClient(server.baseUri)
    prefix = client.config("wh")
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[GraftSparkCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.uri", server.baseUri)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", "wh")
    spark.sql(s"CREATE NAMESPACE $cat.db")
  }

  override def afterAll(): Unit = server.stop()

  test("selective predicate plans a strict subset of files (footer stats)") {
    spark.sql(s"CREATE TABLE $cat.db.skip (id BIGINT, v DOUBLE)")
    // three commits with disjoint id ranges → disjoint per-file bounds
    spark.sql(s"INSERT INTO $cat.db.skip SELECT id, id * 1.5 FROM range(0, 100)")
    spark.sql(s"INSERT INTO $cat.db.skip SELECT id, id * 1.5 FROM range(100, 200)")
    spark.sql(s"INSERT INTO $cat.db.skip SELECT id, id * 1.5 FROM range(200, 300)")

    GraftFileIndex.lastPlanned = None
    val hit = spark.sql(s"SELECT id, v FROM $cat.db.skip WHERE id = 150").collect()
    assert(hit.map(_.getLong(0)).toSeq === Seq(150L))
    val planned = GraftFileIndex.lastPlanned.get
    assert(planned.table === "skip")
    assert(planned.total > 1)
    assert(planned.kept < planned.total, s"expected pruning, planned $planned")

    // an out-of-range predicate prunes everything
    GraftFileIndex.lastPlanned = None
    assert(spark.sql(s"SELECT * FROM $cat.db.skip WHERE id = 999").collect().isEmpty)
    assert(GraftFileIndex.lastPlanned.get.kept === 0)

    // a range predicate keeps only overlapping commits
    GraftFileIndex.lastPlanned = None
    assert(spark.sql(s"SELECT count(*) FROM $cat.db.skip WHERE id >= 250")
      .collect().head.getLong(0) === 50L)
    val ranged = GraftFileIndex.lastPlanned.get
    assert(ranged.kept < ranged.total)
  }

  test("identity partition predicate skips other partitions' files") {
    spark.sql(s"CREATE TABLE $cat.db.skippart (id BIGINT, cat STRING) " +
      "PARTITIONED BY (cat)")
    spark.sql(s"INSERT INTO $cat.db.skippart SELECT id, 'a' FROM range(0, 50)")
    spark.sql(s"INSERT INTO $cat.db.skippart SELECT id, 'b' FROM range(0, 50)")
    GraftFileIndex.lastPlanned = None
    assert(spark.sql(s"SELECT count(*) FROM $cat.db.skippart WHERE cat = 'a'")
      .collect().head.getLong(0) === 50L)
    val planned = GraftFileIndex.lastPlanned.get
    assert(planned.kept < planned.total, s"expected partition skip, got $planned")
  }

  test("upsert match-finding reads only candidate files") {
    spark.sql(s"CREATE TABLE $cat.db.skipup (id BIGINT, v DOUBLE)")
    spark.sql(s"INSERT INTO $cat.db.skipup SELECT id, 0.0 FROM range(0, 100)")
    spark.sql(s"INSERT INTO $cat.db.skipup SELECT id, 0.0 FROM range(100, 200)")
    spark.sql(s"INSERT INTO $cat.db.skipup SELECT id, 0.0 FROM range(200, 300)")

    import spark.implicits._
    val table = new GraftTable(client, prefix, TableIdent(Seq("db"), "skipup"))
    GraftTable.lastUpsertPlan = None
    table.upsert(spark, Seq((150L, 9.9)).toDF("id", "v"), Seq("id"))
    val plan = GraftTable.lastUpsertPlan.get
    assert(plan.total > 1)
    assert(plan.candidates < plan.total, s"expected candidate pruning, got $plan")

    val after = spark.sql(s"SELECT v FROM $cat.db.skipup WHERE id = 150").collect()
    assert(after.map(_.getDouble(0)).toSeq === Seq(9.9))
    assert(spark.sql(s"SELECT count(*) FROM $cat.db.skipup")
      .collect().head.getLong(0) === 300L)
  }

  test("join-driven runtime filters prune delegate scans through manifest stats") {
    import spark.implicits._
    spark.sql(s"CREATE TABLE $cat.db.skipdpp (id BIGINT, v DOUBLE)")
    spark.sql(s"INSERT INTO $cat.db.skipdpp SELECT /*+ COALESCE(1) */ id, 0.0 FROM range(0, 100)")
    spark.sql(s"INSERT INTO $cat.db.skipdpp SELECT /*+ COALESCE(1) */ id + 100, 0.0 FROM range(0, 100)")
    spark.sql(s"INSERT INTO $cat.db.skipdpp SELECT /*+ COALESCE(1) */ id + 200, 0.0 FROM range(0, 100)")

    // the dim must be file-backed: a literal local relation constant-
    // folds away its Filter and DPP has no selective predicate to see
    spark.sql(s"CREATE TABLE $cat.db.dppdim (id BIGINT, flag STRING)")
    spark.sql(s"INSERT INTO $cat.db.dppdim VALUES (50, 'x'), (150, 'y')")
    org.apache.spark.sql.execution.datasources.GraftFileIndex.lastRuntimePrune = None
    val n = spark.sql(
      s"""SELECT count(*) FROM $cat.db.skipdpp t
         |JOIN $cat.db.dppdim d ON t.id = d.id WHERE d.flag = 'x'""".stripMargin)
      .collect().head.getLong(0)
    assert(n === 1L)
    val pruned = org.apache.spark.sql.execution.datasources.GraftFileIndex.lastRuntimePrune
    assert(pruned.isDefined, "runtime filter never reached the delegate scan")
    assert(pruned.get.total === 3 && pruned.get.kept === 1, pruned.toString)
  }

  test("decimal bounds prune: BETWEEN on a DECIMAL column plans a strict subset") {
    spark.sql(s"CREATE TABLE $cat.db.skipdec (id BIGINT, l_discount DECIMAL(12,2))")
    spark.sql(s"INSERT INTO $cat.db.skipdec " +
      "SELECT /*+ COALESCE(1) */ id, CAST(0.02 AS DECIMAL(12,2)) FROM range(0, 50)")
    spark.sql(s"INSERT INTO $cat.db.skipdec " +
      "SELECT /*+ COALESCE(1) */ id + 50, CAST(0.06 AS DECIMAL(12,2)) FROM range(0, 50)")
    spark.sql(s"INSERT INTO $cat.db.skipdec " +
      "SELECT /*+ COALESCE(1) */ id + 100, CAST(0.11 AS DECIMAL(12,2)) FROM range(0, 50)")

    GraftFileIndex.lastPlanned = None
    assert(spark.sql(s"SELECT count(*) FROM $cat.db.skipdec " +
      "WHERE l_discount BETWEEN 0.05 AND 0.07").collect().head.getLong(0) === 50L)
    val planned = GraftFileIndex.lastPlanned.get
    assert(planned.total === 3)
    assert(planned.kept === 1, s"decimal bounds should keep exactly 1 file: $planned")
  }

  test("DELETE with selective predicate still deletes exactly its rows") {
    spark.sql(s"CREATE TABLE $cat.db.skipdel (id BIGINT, v DOUBLE)")
    spark.sql(s"INSERT INTO $cat.db.skipdel SELECT id, 0.0 FROM range(0, 100)")
    spark.sql(s"INSERT INTO $cat.db.skipdel SELECT id, 0.0 FROM range(100, 200)")
    spark.sql(s"DELETE FROM $cat.db.skipdel WHERE id = 150")
    assert(spark.sql(s"SELECT count(*) FROM $cat.db.skipdel")
      .collect().head.getLong(0) === 199L)
    assert(spark.sql(s"SELECT * FROM $cat.db.skipdel WHERE id = 150")
      .collect().isEmpty)
  }
}
