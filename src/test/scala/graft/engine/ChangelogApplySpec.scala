package graft.engine

import graft.SparkTestSession
import graft.catalog._
import graft.server.CatalogServer
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files
import java.util.UUID

/** Incremental materialization from the changelog: a per-key
  * (count, sum) aggregate maintained purely from
  * [[GraftTable.changelogScan]] deltas must equal the full recompute
  * after every checkpoint step — the CDC consumer contract
  * (checkpoint snapshot id → fold delta → repeat). */
class ChangelogApplySpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkTestSession.spark
  private val project = UUID.randomUUID()
  private val store = new InMemoryCatalogStore
  private var server: CatalogServer = _
  private var client: RestCatalogClient = _
  private var prefix: String = _
  private val cat = "graftcdm"

  override def beforeAll(): Unit = {
    server = new CatalogServer(store, project).start()
    val whLoc = Files.createTempDirectory("graft-cdm").toUri.toString.stripSuffix("/")
    store.createWarehouse(project, "wh", whLoc).fold(e => fail(e.message), identity)
    client = new RestCatalogClient(server.baseUri)
    prefix = client.config("wh")
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[GraftSparkCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.uri", server.baseUri)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", "wh")
    spark.sql(s"CREATE NAMESPACE $cat.db")
  }

  override def afterAll(): Unit = server.stop()

  // project to the user-facing columns (the materialization also
  // carries n_vals, its internal null-tracking state); sum_v is
  // nullable — an all-NULL-valued group must read back as SQL NULL
  private def sorted(df: org.apache.spark.sql.DataFrame): Seq[(String, Long, Option[Long])] =
    df.select("k", "n_rows", "sum_v").collect()
      .map(r => (r.getString(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2))))
      .sortBy(_._1).toSeq

  test("changelog-maintained count/sum equals the full recompute at every step") {
    spark.sql(s"CREATE TABLE $cat.db.mat (k STRING, v BIGINT)")
    spark.sql(s"INSERT INTO $cat.db.mat VALUES ('a', 1), ('a', 2), ('b', 10)")
    val t = table("mat")
    val full = () => spark.sql(s"SELECT k, v FROM $cat.db.mat")

    // cold start: materialize from the table head, checkpoint the id
    var mat = ChangelogApply.recomputeCountSum(full(), Seq("k"), "v")
      .persist()
    var checkpoint = t.metadata.currentSnapshotId.get
    assert(sorted(mat) === Seq(("a", 2L, Some(3L)), ("b", 1L, Some(10L))))

    // step 1: appends + a MoR delete, folded incrementally
    spark.sql(s"INSERT INTO $cat.db.mat VALUES ('b', 20), ('c', 5)")
    spark.sql(s"DELETE FROM $cat.db.mat WHERE k = 'a' AND v = 1")
    mat = ChangelogApply.applyCountSum(
      mat, t.changelogScan(spark, checkpoint), Seq("k"), "v").persist()
    checkpoint = t.metadata.currentSnapshotId.get
    assert(sorted(mat) ===
      sorted(ChangelogApply.recomputeCountSum(full(), Seq("k"), "v")))
    assert(sorted(mat) === Seq(("a", 1L, Some(2L)), ("b", 2L, Some(30L)), ("c", 1L, Some(5L))))

    // step 2: MERGE update (delete+insert through the changelog), a
    // group emptied to zero must DROP OUT, and compaction in range
    // must fold to nothing
    spark.sql(s"MERGE INTO $cat.db.mat t USING (SELECT 'c' AS k, 50L AS v) s " +
      "ON t.k = s.k WHEN MATCHED THEN UPDATE SET * " +
      "WHEN NOT MATCHED THEN INSERT *")
    spark.sql(s"DELETE FROM $cat.db.mat WHERE k = 'a'")
    spark.sql(s"CALL $cat.system.rewrite_data_files(table => 'db.mat', " +
      "target_file_count => 1)")
    mat = ChangelogApply.applyCountSum(
      mat, t.changelogScan(spark, checkpoint), Seq("k"), "v")
    checkpoint = t.metadata.currentSnapshotId.get
    assert(sorted(mat) ===
      sorted(ChangelogApply.recomputeCountSum(full(), Seq("k"), "v")))
    assert(sorted(mat) === Seq(("b", 2L, Some(30L)), ("c", 1L, Some(50L))))
    assert(!sorted(mat).exists(_._1 == "a"), "emptied group must drop out")

    // step 3: empty range folds to the identity
    val same = ChangelogApply.applyCountSum(
      mat, t.changelogScan(spark, checkpoint), Seq("k"), "v")
    assert(sorted(same) === sorted(mat))
  }

  private def table(name: String): GraftTable =
    new GraftTable(client, prefix, TableIdent(Seq("db"), name))

  test("runOnce maintains a target TABLE exactly-once across ticks and retries") {
    spark.sql(s"CREATE TABLE $cat.db.src2 (k STRING, v BIGINT)")
    spark.sql(s"CREATE TABLE $cat.db.mat2 (k STRING, n_rows BIGINT, n_vals BIGINT, sum_v BIGINT)")
    spark.sql(s"INSERT INTO $cat.db.src2 VALUES ('a', 1), ('b', 10)")
    val src = table("src2")
    val tgt = table("mat2")

    // cold start: full recompute, checkpoint recorded atomically
    val c1 = ChangelogApply.runOnce(spark, src, "src2", tgt, Seq("k"), "v")
    assert(c1 === src.metadata.currentSnapshotId)
    assert(sorted(spark.sql(s"SELECT k, n_rows, sum_v FROM $cat.db.mat2"))
      === Seq(("a", 1L, Some(1L)), ("b", 1L, Some(10L))))

    // retry with no source change: no-op, no new target snapshot
    val snaps = tgt.metadata.snapshots.size
    assert(ChangelogApply.runOnce(spark, src, "src2", tgt, Seq("k"), "v") === None)
    assert(tgt.metadata.snapshots.size === snaps)

    // steady state: churn folds incrementally, equal to the recompute
    spark.sql(s"INSERT INTO $cat.db.src2 VALUES ('a', 2), ('c', 7)")
    spark.sql(s"DELETE FROM $cat.db.src2 WHERE k = 'b'")
    val c2 = ChangelogApply.runOnce(spark, src, "src2", tgt, Seq("k"), "v")
    assert(c2 === src.metadata.currentSnapshotId)
    assert(sorted(spark.sql(s"SELECT k, n_rows, sum_v FROM $cat.db.mat2"))
      === Seq(("a", 2L, Some(3L)), ("c", 1L, Some(7L))))
    // the tick's WRITE is churn-sized: touched keys a/b/c → ≤ 3 added
    // records (b folds to zero → no replacement row) retired via
    // equality deletes, never an overwrite of the whole target
    val tickSummary = tgt.metadata.currentSnapshot.get.summary
    assert(tickSummary("added-records").toLong <= 3L)
    assert(tickSummary("added-delete-files").toLong >= 1L)
    assert(sorted(spark.sql(s"SELECT k, n_rows, sum_v FROM $cat.db.mat2"))
      === sorted(ChangelogApply.recomputeCountSum(
        spark.sql(s"SELECT k, v FROM $cat.db.src2"), Seq("k"), "v")))
    // and the tick is again idempotent
    assert(ChangelogApply.runOnce(spark, src, "src2", tgt, Seq("k"), "v") === None)
  }

  test("runOnceMinMax maintains a min/max TABLE exactly-once across ticks") {
    spark.sql(s"CREATE TABLE $cat.db.srcm (k STRING, v BIGINT)")
    spark.sql(s"CREATE TABLE $cat.db.matmm (k STRING, n_rows BIGINT, min_v BIGINT, max_v BIGINT)")
    spark.sql(s"INSERT INTO $cat.db.srcm VALUES ('a', 5), ('a', 9), ('b', 10)")
    val src = table("srcm")
    val tgt = table("matmm")
    def mm(): Seq[(String, Long, Long, Long)] =
      spark.sql(s"SELECT k, n_rows, min_v, max_v FROM $cat.db.matmm")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .sortBy(_._1).toSeq

    val c1 = ChangelogApply.runOnceMinMax(spark, src, "srcm", tgt, Seq("k"), "v")
    assert(c1 === src.metadata.currentSnapshotId)
    assert(mm() === Seq(("a", 2L, 5L, 9L), ("b", 1L, 10L, 10L)))
    // idempotent retry
    assert(ChangelogApply.runOnceMinMax(spark, src, "srcm", tgt, Seq("k"), "v") === None)

    // retraction of a max + pure-insert growth, one tick
    spark.sql(s"DELETE FROM $cat.db.srcm WHERE k = 'a' AND v = 9")
    spark.sql(s"INSERT INTO $cat.db.srcm VALUES ('b', 99)")
    val c2 = ChangelogApply.runOnceMinMax(spark, src, "srcm", tgt, Seq("k"), "v")
    assert(c2 === src.metadata.currentSnapshotId)
    assert(mm() === Seq(("a", 1L, 5L, 5L), ("b", 2L, 10L, 99L)))
    assert(ChangelogApply.runOnceMinMax(spark, src, "srcm", tgt, Seq("k"), "v") === None)
  }

  test("runOnceCountDistinct maintains a distinct-count TABLE exactly-once") {
    spark.sql(s"CREATE TABLE $cat.db.srcd (k STRING, v BIGINT)")
    spark.sql(s"CREATE TABLE $cat.db.matdd (k STRING, n_rows BIGINT, n_distinct BIGINT)")
    spark.sql(s"INSERT INTO $cat.db.srcd VALUES ('a', 1), ('a', 1), ('a', 2), ('b', 9)")
    val src = table("srcd")
    val tgt = table("matdd")
    def dd(): Seq[(String, Long, Long)] =
      spark.sql(s"SELECT k, n_rows, n_distinct FROM $cat.db.matdd")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
        .sortBy(_._1).toSeq

    val c1 = ChangelogApply.runOnceCountDistinct(spark, src, "srcd", tgt, Seq("k"), "v")
    assert(c1 === src.metadata.currentSnapshotId)
    assert(dd() === Seq(("a", 3L, 2L), ("b", 1L, 1L)))
    assert(ChangelogApply.runOnceCountDistinct(spark, src, "srcd", tgt, Seq("k"), "v") === None)

    // delete one copy of a duplicated value (distinct count must NOT
    // drop), delete a distinct value's last copy (must drop), insert
    // an already-present value (must not rise) — one tick
    spark.sql(s"DELETE FROM $cat.db.srcd WHERE k = 'a' AND v = 2")
    spark.sql(s"INSERT INTO $cat.db.srcd VALUES ('a', 1), ('b', 9)")
    val c2 = ChangelogApply.runOnceCountDistinct(spark, src, "srcd", tgt, Seq("k"), "v")
    assert(c2 === src.metadata.currentSnapshotId)
    assert(dd() === Seq(("a", 3L, 1L), ("b", 2L, 1L)))
    assert(ChangelogApply.runOnceCountDistinct(spark, src, "srcd", tgt, Seq("k"), "v") === None)
  }

  test("min/max: retraction recomputes touched keys only, equals recompute") {
    spark.sql(s"CREATE TABLE $cat.db.matm (k STRING, v BIGINT)")
    spark.sql(s"INSERT INTO $cat.db.matm VALUES ('a', 5), ('a', 9), ('b', 10), ('n', NULL)")
    val t = table("matm")
    val full = () => spark.sql(s"SELECT k, v FROM $cat.db.matm")
    def mm(df: org.apache.spark.sql.DataFrame): Seq[(String, Long, Option[Long], Option[Long])] =
      df.select("k", "n_rows", "min_v", "max_v").collect()
        .map(r => (r.getString(0), r.getLong(1),
          if (r.isNullAt(2)) None else Some(r.getLong(2)),
          if (r.isNullAt(3)) None else Some(r.getLong(3))))
        .sortBy(_._1).toSeq

    var mat = ChangelogApply.recomputeMinMax(full(), Seq("k"), "v").persist()
    var ckpt = t.metadata.currentSnapshotId.get
    assert(mm(mat) === Seq(
      ("a", 2L, Some(5L), Some(9L)), ("b", 1L, Some(10L), Some(10L)),
      ("n", 1L, None, None)))

    // retraction of a current MAX ('a',9), pure-insert fold on 'b',
    // a brand-new key 'c', and an all-NULL key untouched
    spark.sql(s"DELETE FROM $cat.db.matm WHERE k = 'a' AND v = 9")
    spark.sql(s"INSERT INTO $cat.db.matm VALUES ('b', 3), ('c', 7)")
    mat = ChangelogApply.applyMinMax(
      mat, t.changelogScan(spark, ckpt), full(), Seq("k"), "v").persist()
    ckpt = t.metadata.currentSnapshotId.get
    assert(mm(mat) === mm(ChangelogApply.recomputeMinMax(full(), Seq("k"), "v")))
    assert(mm(mat) === Seq(
      ("a", 1L, Some(5L), Some(5L)), ("b", 2L, Some(3L), Some(10L)),
      ("c", 1L, Some(7L), Some(7L)), ("n", 1L, None, None)))

    // a group emptied by its deletes drops out of the recompute branch
    spark.sql(s"DELETE FROM $cat.db.matm WHERE k = 'a'")
    mat = ChangelogApply.applyMinMax(
      mat, t.changelogScan(spark, ckpt), full(), Seq("k"), "v")
    assert(mm(mat) === mm(ChangelogApply.recomputeMinMax(full(), Seq("k"), "v")))
    assert(!mm(mat).exists(_._1 == "a"))
  }

  test("distinct count: every touched key recomputes, equals recompute") {
    spark.sql(s"CREATE TABLE $cat.db.matd (k STRING, v BIGINT)")
    spark.sql(s"INSERT INTO $cat.db.matd VALUES ('a', 1), ('a', 1), ('a', 2), ('b', 10)")
    val t = table("matd")
    val full = () => spark.sql(s"SELECT k, v FROM $cat.db.matd")
    def dc(df: org.apache.spark.sql.DataFrame): Seq[(String, Long, Long)] =
      df.select("k", "n_rows", "n_distinct").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
        .sortBy(_._1).toSeq

    var mat = ChangelogApply.recomputeCountDistinct(full(), Seq("k"), "v").persist()
    var ckpt = t.metadata.currentSnapshotId.get
    assert(dc(mat) === Seq(("a", 3L, 2L), ("b", 1L, 1L)))

    // the two traps additive arithmetic gets wrong: inserting an
    // ALREADY-PRESENT value must not raise the count, deleting ONE of
    // two copies must not lower it
    spark.sql(s"INSERT INTO $cat.db.matd VALUES ('a', 2), ('b', 10)")
    spark.sql(s"DELETE FROM $cat.db.matd WHERE k = 'a' AND v = 1")
    mat = ChangelogApply.applyCountDistinct(
      mat, t.changelogScan(spark, ckpt), full(), Seq("k"), "v")
    assert(dc(mat) === dc(ChangelogApply.recomputeCountDistinct(full(), Seq("k"), "v")))
    // 'a': the DELETE removed both v=1 copies, the INSERT added a
    // duplicate v=2 → rows {2,2}, distinct {2}; 'b': duplicate insert
    // leaves distinct at 1 while n_rows grows
    assert(dc(mat) === Seq(("a", 2L, 1L), ("b", 2L, 1L)))
  }

  test("top-k: insert-only keys merge O(k) state, retraction resurrects the runner-up") {
    spark.sql(s"CREATE TABLE $cat.db.matk (k STRING, v BIGINT)")
    spark.sql(s"INSERT INTO $cat.db.matk VALUES ('a', 5), ('a', 9), ('a', 7), ('b', 10)")
    val t = table("matk")
    val full = () => spark.sql(s"SELECT k, v FROM $cat.db.matk")
    def tk(df: org.apache.spark.sql.DataFrame): Seq[(String, Long, Seq[Double])] =
      df.select("k", "n_rows", "topk_v").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getSeq[Double](2).toSeq))
        .sortBy(_._1).toSeq

    var mat = ChangelogApply.recomputeTopK(full(), Seq("k"), "v", 2).persist()
    var ckpt = t.metadata.currentSnapshotId.get
    // 'a' holds 3 values but the state keeps only its top-2
    assert(tk(mat) === Seq(
      ("a", 3L, Seq(9.0, 7.0)), ("b", 1L, Seq(10.0))))

    // the retraction trap: delete 'a''s current #1 — its runner-up
    // (5) is NOT in the stored top-2 state and must come back from the
    // base recompute; 'b' folds pure-insert (merge two <=k arrays);
    // 'c' is born from the fold path alone
    spark.sql(s"DELETE FROM $cat.db.matk WHERE k = 'a' AND v = 9")
    spark.sql(s"INSERT INTO $cat.db.matk VALUES ('b', 3), ('b', 20), ('c', 4)")
    mat = ChangelogApply.applyTopK(
      mat, t.changelogScan(spark, ckpt), full(), Seq("k"), "v", 2).persist()
    ckpt = t.metadata.currentSnapshotId.get
    assert(tk(mat) === tk(ChangelogApply.recomputeTopK(full(), Seq("k"), "v", 2)))
    assert(tk(mat) === Seq(
      ("a", 2L, Seq(7.0, 5.0)), ("b", 3L, Seq(20.0, 10.0)),
      ("c", 1L, Seq(4.0))))

    // a group emptied by its deletes drops out; untouched keys verbatim
    spark.sql(s"DELETE FROM $cat.db.matk WHERE k = 'a'")
    mat = ChangelogApply.applyTopK(
      mat, t.changelogScan(spark, ckpt), full(), Seq("k"), "v", 2)
    assert(tk(mat) === tk(ChangelogApply.recomputeTopK(full(), Seq("k"), "v", 2)))
    assert(!tk(mat).exists(_._1 == "a"))
  }

  test("nullable value column: incremental equals recompute, NULL sum preserved") {
    spark.sql(s"CREATE TABLE $cat.db.matn (k STRING, v BIGINT)")
    spark.sql(s"INSERT INTO $cat.db.matn VALUES ('a', 1), ('a', NULL), ('n', NULL)")
    val t = table("matn")
    val full = () => spark.sql(s"SELECT k, v FROM $cat.db.matn")

    var mat = ChangelogApply.recomputeCountSum(full(), Seq("k"), "v").persist()
    var checkpoint = t.metadata.currentSnapshotId.get
    // all-NULL group reports SQL NULL sum (not 0), like sum() would
    assert(sorted(mat) === Seq(("a", 2L, Some(1L)), ("n", 1L, None)))

    // delete 'a''s only non-null value: its sum must RETURN to NULL
    // incrementally, and a new all-NULL group must be born as NULL
    spark.sql(s"DELETE FROM $cat.db.matn WHERE k = 'a' AND v = 1")
    spark.sql(s"INSERT INTO $cat.db.matn VALUES ('m', NULL), ('m', 4)")
    mat = ChangelogApply.applyCountSum(
      mat, t.changelogScan(spark, checkpoint), Seq("k"), "v").persist()
    checkpoint = t.metadata.currentSnapshotId.get
    assert(sorted(mat) ===
      sorted(ChangelogApply.recomputeCountSum(full(), Seq("k"), "v")))
    assert(sorted(mat) ===
      Seq(("a", 1L, None), ("m", 2L, Some(4L)), ("n", 1L, None)))

    // deleting a NULL-valued row moves n_rows but not the sum
    spark.sql(s"DELETE FROM $cat.db.matn WHERE k = 'm' AND v IS NULL")
    mat = ChangelogApply.applyCountSum(
      mat, t.changelogScan(spark, checkpoint), Seq("k"), "v")
    assert(sorted(mat) ===
      sorted(ChangelogApply.recomputeCountSum(full(), Seq("k"), "v")))
    assert(sorted(mat) ===
      Seq(("a", 1L, None), ("m", 1L, Some(4L)), ("n", 1L, None)))
  }

  test("touchedBoundsFilter: keeps touched ranges + NULLs, empty delta reads nothing") {
    import spark.implicits._
    // the read-side narrowing of a churn-sized tick: rows outside the
    // touched keys' min/max(+NULL) bounds cannot be touched, so the
    // previous-state scan skips their files via pushed-down stats
    // pruning; rows INSIDE the range but untouched (k=6 here) ride
    // through and are dropped by the null-safe semi-join — narrowing,
    // never the exactness gate
    val touched = Seq(Some(5L), Some(7L), None).toDF("k")
    val f = ChangelogApply.touchedBoundsFilter(touched, Seq("k"))
    val base = Seq(Some(4L), Some(5L), Some(6L), Some(7L), Some(100L), None).toDF("k")
    assert(base.filter(f).collect()
      .map(r => if (r.isNullAt(0)) None else Some(r.getLong(0))).toSet
      === Set(Some(5L), Some(6L), Some(7L), None))
    // no NULL in the delta: NULL-keyed previous rows are skippable too
    val noNull = ChangelogApply.touchedBoundsFilter(Seq(5L, 7L).toDF("k"), Seq("k"))
    assert(base.filter(noNull).collect().map(_.getLong(0)).toSet === Set(5L, 6L, 7L))
    // empty delta: nothing can be touched, the scan collapses
    val emptyF = ChangelogApply.touchedBoundsFilter(
      Seq.empty[Long].toDF("k"), Seq("k"))
    assert(base.filter(emptyF).count() === 0L)
  }

  test("KEYLESS global group: each family emits EXACTLY one row under all-delete and empty deltas") {
    import spark.implicits._
    // SQL's global-group fixture: `SELECT count(*), agg(v) FROM t` is
    // ONE row even over empty t. The keyless folds must preserve it in
    // both directions — never drop it (all-delete) and never duplicate
    // it (the global aggregate over an empty semi-join still mints a
    // row, which must not union beside the carried fold).
    // additive: all rows deleted → one (0, 0, NULL) row, not zero rows
    val prevCs = Seq((2L, 2L, 30L)).toDF("n_rows", "n_vals", "sum_v")
    val delAll = Seq(("delete", 10L), ("delete", 20L)).toDF("_change_type", "v")
    val foldedCs = ChangelogApply.applyCountSum(prevCs, delAll, Nil, "v").collect()
    assert(foldedCs.length === 1)
    assert(foldedCs.head.getLong(0) === 0L && foldedCs.head.getLong(1) === 0L
      && foldedCs.head.isNullAt(2))
    // min/max, insert-only delta: exactly one folded row, no spurious
    // (0, NULL, NULL) twin from the empty delete-recompute
    val prevMm = Seq((2L, 1L, 5L)).toDF("n_rows", "min_v", "max_v")
    val insDelta = Seq(("insert", 7L)).toDF("_change_type", "v")
    val base3 = Seq(1L, 5L, 7L).toDF("v")
    val foldedMm = ChangelogApply.applyMinMax(prevMm, insDelta, base3, Nil, "v").collect()
    assert(foldedMm.length === 1)
    assert(foldedMm.head.getLong(0) === 3L && foldedMm.head.getLong(1) === 1L
      && foldedMm.head.getLong(2) === 7L)
    // min/max, all-deleted: the one row recomputes from the empty base
    val delAllMm = Seq(("delete", 1L), ("delete", 5L)).toDF("_change_type", "v")
    val foldedMm2 = ChangelogApply.applyMinMax(
      prevMm, delAllMm, base3.limit(0), Nil, "v").collect()
    assert(foldedMm2.length === 1)
    assert(foldedMm2.head.getLong(0) === 0L && foldedMm2.head.isNullAt(1)
      && foldedMm2.head.isNullAt(2))
    // distinct-count, EMPTY delta: the single row carries verbatim
    val prevCd = Seq((3L, 2L)).toDF("n_rows", "n_distinct")
    val foldedCd = ChangelogApply.applyCountDistinct(
      prevCd, delAll.limit(0), base3, Nil, "v").collect()
    assert(foldedCd.length === 1)
    assert(foldedCd.head.getLong(0) === 3L && foldedCd.head.getLong(1) === 2L)
    // distinct-count, all-deleted: one (0, 0) row from the empty base
    val foldedCd2 = ChangelogApply.applyCountDistinct(
      prevCd, delAll, base3.limit(0), Nil, "v").collect()
    assert(foldedCd2.length === 1)
    assert(foldedCd2.head.getLong(0) === 0L && foldedCd2.head.getLong(1) === 0L)
  }
}
