package graft.engine

import graft.SparkTestSession
import graft.catalog._
import graft.core._
import graft.server.CatalogServer
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files
import java.util.UUID

/** `db.t.stream`: the table as a Structured Streaming source. Offsets
  * are snapshot ids checkpointed by Spark, so a restarted query resumes
  * exactly after the last committed snapshot — appends land exactly
  * once across restarts without any side bookkeeping. */
class StreamReadSpec extends AnyFunSuite with BeforeAndAfterAll {
  import IType._

  private lazy val spark = SparkTestSession.spark
  private val project = UUID.randomUUID()
  private val store = new InMemoryCatalogStore
  private var server: CatalogServer = _
  private var client: RestCatalogClient = _
  private var prefix: String = _
  private val cat = "stream_cat"

  override def beforeAll(): Unit = {
    server = new CatalogServer(store, project).start()
    val whLoc = Files.createTempDirectory("graft-srs").toUri.toString.stripSuffix("/")
    store.createWarehouse(project, "wh", whLoc).fold(e => fail(e.message), identity)
    client = new RestCatalogClient(server.baseUri)
    prefix = client.config("wh")
    client.createNamespace(prefix, Seq("db"))
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[GraftSparkCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.uri", server.baseUri)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", "wh")
  }

  override def afterAll(): Unit = server.stop()

  private val schema = Schema(0, Seq(
    NestedField.required(1, "id", TInt),
    NestedField.optional(2, "v", TString)))

  private def table(name: String): GraftTable = {
    client.createTable(prefix, TableIdent(Seq("db"), name), schema)
    new GraftTable(client, prefix, TableIdent(Seq("db"), name))
  }

  private def df(rows: (Int, String)*) = {
    val s = spark
    import s.implicits._
    rows.toDF("id", "v")
  }

  private def runAvailable(tableName: String, sink: String,
      checkpoint: String, from: String = "earliest"): Unit = {
    val q = spark.readStream
      .option("stream-from", from)
      .table(s"$cat.db.$tableName.stream")
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        val ids = batch.collect().map(_.getInt(0))
        StreamReadSpec.sinks.getOrElseUpdate(sink,
          new scala.collection.mutable.ArrayBuffer[Int]) ++= ids
        (): Unit
      }
      .option("checkpointLocation", checkpoint)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(60000)
    assert(!q.isActive, "AvailableNow query did not finish in 60s")
    q.stop()
  }

  private def sinkIds(sink: String): Seq[Int] =
    StreamReadSpec.sinks.get(sink).map(_.toSeq.sorted).getOrElse(Seq.empty)

  test("earliest + incremental batches, exactly-once across restart") {
    val t = table("t_src")
    t.append(df(1 -> "a", 2 -> "b"))
    t.append(df(3 -> "c"))

    val ckpt = Files.createTempDirectory("graft-srs-ckpt").toString
    runAvailable("t_src", "srs_sink", ckpt)
    assert(sinkIds("srs_sink") === Seq(1, 2, 3)) // full content first

    // new appends between runs; restart from the SAME checkpoint
    t.append(df(4 -> "d"))
    t.append(df(5 -> "e"))
    runAvailable("t_src", "srs_sink", ckpt)
    // rows 1-3 are NOT re-read: the checkpointed snapshot offset
    // resumes after the last processed snapshot
    assert(sinkIds("srs_sink") === Seq(1, 2, 3, 4, 5))

    // an idle restart processes nothing
    runAvailable("t_src", "srs_sink", ckpt)
    assert(sinkIds("srs_sink") === Seq(1, 2, 3, 4, 5))
  }

  test("max-rows-per-trigger bounds batches at snapshot granularity, oversized commits still progress") {
    val t = table("t_src_adm")
    t.append(df(1 -> "a", 2 -> "a"))
    t.append(df(3 -> "a", 4 -> "a"))
    t.append(df(5 -> "a", 6 -> "a"))

    def drain(ckpt: String): Unit = {
      val q = spark.readStream
        .option("stream-from", "earliest")
        .option("max-rows-per-trigger", "3")
        .table(s"$cat.db.t_src_adm.stream")
        .writeStream
        .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
          StreamReadSpec.batches.getOrElseUpdate("adm",
            new scala.collection.mutable.ArrayBuffer[Seq[Int]]) +=
            batch.collect().map(_.getInt(0)).toSeq.sorted
          (): Unit
        }
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination(60000)
      assert(!q.isActive, "AvailableNow query did not finish in 60s")
      q.stop()
    }

    val ckpt = Files.createTempDirectory("graft-srs-ckpt3").toString
    drain(ckpt)
    // cap 3 admits one 2-row snapshot per trigger (2+2 would exceed it)
    assert(StreamReadSpec.batches("adm").toSeq ===
      Seq(Seq(1, 2), Seq(3, 4), Seq(5, 6)))

    // a single commit bigger than the cap is admitted whole (progress
    // is guaranteed; batch granularity is the snapshot)
    t.append(df(7 -> "b", 8 -> "b", 9 -> "b", 10 -> "b", 11 -> "b"))
    drain(ckpt)
    assert(StreamReadSpec.batches("adm").toSeq.last === Seq(7, 8, 9, 10, 11))
    assert(StreamReadSpec.batches("adm").size === 4)
  }

  test("stream-from=latest skips history; compaction in range is transparent") {
    val t = table("t_src_latest")
    t.append(df(1 -> "old"))

    val ckpt = Files.createTempDirectory("graft-srs-ckpt2").toString
    runAvailable("t_src_latest", "srs_sink2", ckpt, from = "latest")
    assert(sinkIds("srs_sink2") === Seq.empty) // history skipped

    t.append(df(2 -> "new"))
    t.rewriteDataFiles(spark) // replace snapshot: must contribute nothing
    t.append(df(3 -> "newer"))
    runAvailable("t_src_latest", "srs_sink2", ckpt, from = "latest")
    assert(sinkIds("srs_sink2") === Seq(2, 3))
  }
}

object StreamReadSpec {
  /** foreachBatch sinks (the memory sink can't recover a checkpoint). */
  val sinks = scala.collection.concurrent.TrieMap
    .empty[String, scala.collection.mutable.ArrayBuffer[Int]]
  val batches = scala.collection.concurrent.TrieMap
    .empty[String, scala.collection.mutable.ArrayBuffer[Seq[Int]]]
}
