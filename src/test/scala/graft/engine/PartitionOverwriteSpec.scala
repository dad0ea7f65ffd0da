package graft.engine

import graft.SparkTestSession
import graft.catalog._
import graft.server.CatalogServer
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files
import java.util.UUID

/** Partition-scoped INSERT OVERWRITE: the static `PARTITION (p='v')`
  * clause must replace exactly the matching identity partitions —
  * untouched partitions keep their very FILES — and refuse (rather
  * than half-apply) conditions a file tuple cannot decide. */
class PartitionOverwriteSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkTestSession.spark
  private val project = UUID.randomUUID()
  private val store = new InMemoryCatalogStore
  private var server: CatalogServer = _
  private var client: RestCatalogClient = _
  private var prefix: String = _
  private val cat = "graftpow"

  override def beforeAll(): Unit = {
    server = new CatalogServer(store, project).start()
    val whLoc = Files.createTempDirectory("graft-pow").toUri.toString.stripSuffix("/")
    store.createWarehouse(project, "wh", whLoc).fold(e => fail(e.message), identity)
    client = new RestCatalogClient(server.baseUri)
    prefix = client.config("wh")
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[GraftSparkCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.uri", server.baseUri)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", "wh")
    spark.sql(s"CREATE NAMESPACE $cat.db")
  }

  override def afterAll(): Unit = server.stop()

  private def table(name: String): GraftTable =
    new GraftTable(client, prefix, TableIdent(Seq("db"), name))

  test("static PARTITION clause replaces only the named partition") {
    spark.sql(s"CREATE TABLE $cat.db.po (id BIGINT, region STRING) " +
      "PARTITIONED BY (region)")
    spark.sql(s"INSERT INTO $cat.db.po VALUES (1,'eu'), (2,'us'), (3,'eu'), (4,'ap')")
    val before = table("po").planFiles()
    val usFiles = before.filter(_.partition.get("region").contains("us")).map(_.path).toSet
    val apFiles = before.filter(_.partition.get("region").contains("ap")).map(_.path).toSet
    assert(usFiles.nonEmpty && apFiles.nonEmpty)

    spark.sql(s"INSERT OVERWRITE $cat.db.po PARTITION (region='eu') VALUES (10), (11)")

    val rows = spark.sql(s"SELECT id, region FROM $cat.db.po ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(rows === Seq((2L, "us"), (4L, "ap"), (10L, "eu"), (11L, "eu")))

    // untouched partitions kept their very files (no rewrite)
    val after = table("po").planFiles()
    assert(after.filter(_.partition.get("region").contains("us")).map(_.path).toSet === usFiles)
    assert(after.filter(_.partition.get("region").contains("ap")).map(_.path).toSet === apFiles)
    assert(table("po").metadata.currentSnapshot
      .exists(_.summary.get("operation").contains("overwrite")))
  }

  test("writeTo.overwrite with IN replaces the listed partitions") {
    spark.sql(s"CREATE TABLE $cat.db.poin (id BIGINT, region STRING) " +
      "PARTITIONED BY (region)")
    spark.sql(s"INSERT INTO $cat.db.poin VALUES (1,'eu'), (2,'us'), (3,'ap')")
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    Seq((20L, "eu"), (30L, "ap")).toDF("id", "region")
      .writeTo(s"$cat.db.poin").overwrite(col("region").isin("eu", "ap"))
    val rows = spark.sql(s"SELECT id, region FROM $cat.db.poin ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(rows === Seq((2L, "us"), (20L, "eu"), (30L, "ap")))
  }

  test("non-partition conditions are refused, not half-applied") {
    spark.sql(s"CREATE TABLE $cat.db.pobad (id BIGINT, region STRING) " +
      "PARTITIONED BY (region)")
    spark.sql(s"INSERT INTO $cat.db.pobad VALUES (1,'eu')")
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val e = intercept[Exception] {
      Seq((9L, "eu")).toDF("id", "region")
        .writeTo(s"$cat.db.pobad").overwrite(col("id") > 0)
    }
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: causes(t.getCause)
    assert(causes(e).exists(_.getMessage != null) &&
      causes(e).map(t => Option(t.getMessage).getOrElse("")).mkString
        .contains("partition-scoped"), s"unexpected error: $e")
    // nothing changed
    assert(spark.sql(s"SELECT count(*) FROM $cat.db.pobad")
      .collect().head.getLong(0) === 1L)
  }

  test("files that predate the partition field abort the overwrite") {
    spark.sql(s"CREATE TABLE $cat.db.poev (id BIGINT, region STRING)")
    spark.sql(s"INSERT INTO $cat.db.poev VALUES (1,'eu')")
    spark.sql(s"ALTER TABLE $cat.db.poev ADD PARTITION FIELD region")
    spark.sql(s"INSERT INTO $cat.db.poev VALUES (2,'us')")
    val e = intercept[Exception] {
      spark.sql(s"INSERT OVERWRITE $cat.db.poev PARTITION (region='eu') VALUES (10)")
    }
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: causes(t.getCause)
    assert(causes(e).map(t => Option(t.getMessage).getOrElse("")).mkString
      .contains("rewrite_data_files"), s"unexpected error: $e")
    assert(spark.sql(s"SELECT count(*) FROM $cat.db.poev")
      .collect().head.getLong(0) === 2L)
  }

  test("dynamic mode replaces exactly the partitions present in the data") {
    spark.sql(s"CREATE TABLE $cat.db.pody (id BIGINT, region STRING) " +
      "PARTITIONED BY (region)")
    spark.sql(s"INSERT INTO $cat.db.pody VALUES (1,'eu'), (2,'us'), (3,'ap')")
    val usFiles = table("pody").planFiles()
      .filter(_.partition.get("region").contains("us")).map(_.path).toSet

    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try spark.sql(s"INSERT OVERWRITE $cat.db.pody VALUES (10,'eu'), (30,'ap')")
    finally spark.conf.set("spark.sql.sources.partitionOverwriteMode", "static")

    val rows = spark.sql(s"SELECT id, region FROM $cat.db.pody ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(rows === Seq((2L, "us"), (10L, "eu"), (30L, "ap")))
    // the untouched partition kept its very files
    assert(table("pody").planFiles()
      .filter(_.partition.get("region").contains("us")).map(_.path).toSet === usFiles)
    assert(table("pody").metadata.currentSnapshot
      .exists(_.summary.get("operation").contains("overwrite")))

    // writeTo.overwritePartitions() — the API form of the same plan
    import spark.implicits._
    Seq((99L, "us")).toDF("id", "region")
      .writeTo(s"$cat.db.pody").overwritePartitions()
    val after = spark.sql(s"SELECT id, region FROM $cat.db.pody ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(after === Seq((10L, "eu"), (30L, "ap"), (99L, "us")))
  }

  test("dynamic overwrite of an empty frame replaces nothing") {
    spark.sql(s"CREATE TABLE $cat.db.podye (id BIGINT, region STRING) " +
      "PARTITIONED BY (region)")
    spark.sql(s"INSERT INTO $cat.db.podye VALUES (1,'eu')")
    import spark.implicits._
    spark.emptyDataset[(Long, String)].toDF("id", "region")
      .writeTo(s"$cat.db.podye").overwritePartitions()
    assert(spark.sql(s"SELECT count(*) FROM $cat.db.podye")
      .collect().head.getLong(0) === 1L)
  }

  test("plain INSERT OVERWRITE still replaces the whole table") {
    spark.sql(s"CREATE TABLE $cat.db.pofull (id BIGINT, region STRING) " +
      "PARTITIONED BY (region)")
    spark.sql(s"INSERT INTO $cat.db.pofull VALUES (1,'eu'), (2,'us')")
    spark.sql(s"INSERT OVERWRITE $cat.db.pofull VALUES (9,'ap')")
    val rows = spark.sql(s"SELECT id, region FROM $cat.db.pofull")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(rows === Seq((9L, "ap")))
  }
}
