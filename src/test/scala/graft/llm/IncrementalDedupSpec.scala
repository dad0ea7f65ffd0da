package graft.llm

import graft.SparkTestSession
import graft.catalog._
import graft.engine.GraftSparkCatalog
import graft.server.CatalogServer
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.SortMergeJoinExec
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files
import java.util.UUID

/** Incremental dedup end-to-end: a corpus's LSH band keys are
  * materialized as a bucket-partitioned graft table, a derived "daily
  * batch" (planted near-copies + genuinely new docs) probes it, and
  *  - every planted near-copy is detected against its source doc,
  *  - no genuinely-new doc is flagged,
  *  - every reported jaccard survives an independent recompute, and
  *  - with the batch's band keys ALSO materialized bucket-partitioned
  *    by k, the probe join is storage-partitioned: ZERO shuffles below
  *    the join — the corpus-sized index never moves, which is the
  *    whole point at 100 TB. */
class IncrementalDedupSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"
  private val project = UUID.randomUUID()
  private val store = new InMemoryCatalogStore
  private var server: CatalogServer = _
  private val cat = "incdedup_cat"

  override def beforeAll(): Unit = {
    server = new CatalogServer(store, project).start()
    val whLoc = Files.createTempDirectory("graft-incdedup").toUri.toString.stripSuffix("/")
    store.createWarehouse(project, "wh", whLoc).fold(e => fail(e.message), identity)
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[GraftSparkCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.uri", server.baseUri)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", "wh")
    spark.sql(s"CREATE NAMESPACE $cat.db")
  }

  override def afterAll(): Unit = server.stop()

  private def corpus: DataFrame =
    graft.Tables.load(spark, sf, "documents")
      .selectExpr("doc_id as id", "split(lower(text), ' ') as toks")

  // planted near-copies: docs with enough tokens that a 1-token
  // truncation preserves the signature's band structure
  private def planted: DataFrame =
    corpus.where("id % 13 = 0 and size(toks) >= 12")
      .selectExpr("id + 5000000 as id",
        "slice(toks, 1, size(toks) - 1) as toks")

  // genuinely-new docs: synthetic unique vocabularies — shingle sets
  // disjoint from the whole corpus, so nothing to find
  private def fresh: DataFrame =
    spark.range(0, 20).selectExpr("id + 6000000 as id",
      "transform(sequence(0, 9), i -> concat('zzz', id, 'w', i)) as toks")

  private def allNodes(p: SparkPlan): Seq[SparkPlan] = p match {
    case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
      p +: allNodes(a.executedPlan)
    case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
      p +: allNodes(q.plan)
    case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec =>
      p +: allNodes(r.child)
    case _ => p +: p.children.flatMap(allNodes)
  }

  test("batch probe finds exactly the planted near-copies, verified") {
    val batch = planted.unionAll(fresh)
    val out = IncrementalDedup.dedupAgainstIndex(
      batch, IncrementalDedup.indexRows(corpus), corpus).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(3)))

    val plantedIds = planted.select("id").collect().map(_.getLong(0)).toSet
    assert(plantedIds.nonEmpty)
    // every planted copy is caught, and against its own source doc
    plantedIds.foreach { pid =>
      val hits = out.filter(_._1 == pid)
      assert(hits.exists(_._2 == pid - 5000000L),
        s"planted $pid not matched to its source")
    }
    // nothing invented: no fresh doc flagged, every hit is a batch doc
    assert(out.forall(h => h._1 < 6000000L))
    // reported jaccard survives an independent shingle-set recompute
    val toksById = corpus.unionAll(planted).collect()
      .map(r => (r.getLong(0), r.getSeq[String](1))).toMap
    def shingles(t: Seq[String]): Set[String] =
      if (t.size < 3) t.mkString(" ") match { case s => Set(s) }
      else t.sliding(3).map(_.mkString(" ")).toSet
    out.take(20).foreach { case (a, b, j) =>
      val (sa, sb) = (shingles(toksById(a)), shingles(toksById(b)))
      val expect = (sa & sb).size.toDouble / (sa | sb).size
      assert(math.abs(j - expect) < 1e-12, s"pair ($a,$b)")
    }
  }

  test("gated decision rows: planted near-copies matched, fresh docs survive as new") {
    val out = IncrementalDedup.qDedupIncremental(spark, sf).collect()
    val planted = out.filter(_.getLong(0) < IncrementalDedup.IncFreshIdOffset)
    val fresh = out.filter(_.getLong(0) >= IncrementalDedup.IncFreshIdOffset)
    assert(planted.nonEmpty)
    // every planted near-copy gets a verified match, and the BEST match
    // of at least the bulk of them is their own source doc
    assert(planted.forall(r => !r.isNullAt(1)), "a planted near-copy survived unmatched")
    assert(planted.count(r =>
      r.getLong(1) == r.getLong(0) - IncrementalDedup.IncBatchIdOffset) >= planted.length / 2)
    assert(planted.forall(r => r.getDouble(2) >= 0.5))
    // genuinely-new docs (disjoint vocabulary) all survive with NULLs
    assert(fresh.length === 20)
    assert(fresh.forall(r => r.isNullAt(1) && r.isNullAt(2)))
  }

  test("index compaction drops buckets that turned hot after increments") {
    // an index built cold, then an increment floods one bucket: the
    // maintenance pass must drop exactly that bucket's rows
    import spark.implicits._
    val base = (1L to 5L).map(i => (i, 0, "cold")) ++ Seq((1L, 1, "warm"))
    val flood = (100L to 300L).map(i => (i, 0, "cold"))
    val index = (base ++ flood).toDF("id", "b", "k")
    val compacted = IncrementalDedup.compactIndex(index, maxBucket = 100)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2)))
    assert(compacted.toSeq === Seq((1L, 1, "warm")),
      "only the still-cold bucket survives")
  }

  test("materialized index + batch keys join storage-partitioned: zero shuffles") {
    // the materialized layout folds (band, key) into ONE column `bk` —
    // the join key IS the bucket-partitioning source column, which is
    // what lets the scan's KeyGroupedPartitioning satisfy the join's
    // distribution directly
    spark.sql(s"CREATE TABLE $cat.db.lsh_index (id BIGINT, bk STRING) " +
      "PARTITIONED BY (bucket(8, bk))")
    spark.sql(s"CREATE TABLE $cat.db.batch_keys (id BIGINT, bk STRING) " +
      "PARTITIONED BY (bucket(8, bk))")
    IncrementalDedup.indexRows(corpus).createOrReplaceTempView("inc_idx_rows")
    Dedup.bandsOf(planted.unionAll(fresh)).createOrReplaceTempView("inc_probe_rows")
    spark.sql(s"INSERT INTO $cat.db.lsh_index " +
      "SELECT id, concat(b, ':', k) FROM inc_idx_rows")
    spark.sql(s"INSERT INTO $cat.db.batch_keys " +
      "SELECT id, concat(b, ':', k) FROM inc_probe_rows")

    def candidates() = spark.sql(
      s"""SELECT p.id AS new_id, i.id AS dup_of, COUNT(*) AS n_shared_bands
         |FROM $cat.db.batch_keys p JOIN $cat.db.lsh_index i ON p.bk = i.bk
         |GROUP BY p.id, i.id ORDER BY new_id, dup_of""".stripMargin)

    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val df = candidates()
      val rows = df.collect()
      assert(rows.nonEmpty)
      val joins = allNodes(df.queryExecution.executedPlan).collect {
        case j: SortMergeJoinExec => j }
      assert(joins.nonEmpty, "expected a sort-merge join")
      val shufflesBelowJoin = allNodes(joins.head).collect {
        case s: ShuffleExchangeExec => s }
      assert(shufflesBelowJoin.isEmpty,
        s"the index side was shuffled:\n${joins.head}")

      // the table-routed candidates are the DataFrame path's candidates
      val direct = Dedup.bandsOf(planted.unionAll(fresh))
        .selectExpr("id as new_id", "b", "k")
        .join(IncrementalDedup.indexRows(corpus)
          .selectExpr("id as dup_of", "b", "k"), Seq("b", "k"))
        .groupBy("new_id", "dup_of").count()
        .orderBy("new_id", "dup_of").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      assert(rows.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
        === direct.toSeq)
    } finally {
      spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "false")
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }
}
