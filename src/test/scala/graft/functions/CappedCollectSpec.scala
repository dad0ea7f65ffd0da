package graft.functions

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** CappedCollect's sentinel contract — `size <= cap` ⇔ the collected
  * list is the group's COMPLETE value set, `size == cap + 1` ⇔ the
  * group exceeded the cap — verified against exact per-group counts,
  * including under forced multi-partition partial/merge paths (the
  * map-side state bound is the whole point of the aggregate). */
class CappedCollectSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  test("longs: under-cap groups collect completely, over-cap groups hit the sentinel") {
    import spark.implicits._
    // group g has g members (1..60); cap 10 → groups 1..10 complete,
    // 11..60 sentinel. 16 input partitions force real partial merges.
    val rows = for { g <- 1 to 60; i <- 1 to g } yield (g.toLong, (g * 1000 + i).toLong)
    val df = rows.toDF("g", "id").repartition(16)
    val cap = 10
    val got = df.groupBy("g")
      .agg(CappedCollect.longs(cap)(col("id")).as("raw"))
      .selectExpr("g", "size(raw) as n", "sort_array(raw) as ids")
      .collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getSeq[Long](2)))
      .toMap
    for (g <- 1 to 60) {
      val (n, ids) = got(g.toLong)
      if (g <= cap) {
        assert(n === g, s"group $g should be complete")
        assert(ids === (1 to g).map(i => (g * 1000 + i).toLong),
          s"group $g complete set mismatch")
      } else {
        assert(n === cap + 1, s"group $g should carry the over-cap sentinel")
        // sentinel members are a subset of the true group
        assert(ids.forall(v => v / 1000 === g))
      }
    }
  }

  test("struct payload: same sentinel, mixed types survive the buffer round-trip") {
    import spark.implicits._
    val rows = for { g <- 1 to 8; i <- 1 to g } yield (g, s"s$g-$i", i * 1.5)
    val df = rows.toDF("g", "name", "score").repartition(7)
    val cap = 4
    val got = df.groupBy("g")
      .agg(CappedCollect.of(cap)(struct(col("name"), col("score"))).as("raw"))
      .selectExpr("g", "size(raw) as n", "raw")
      .collect()
      .map(r => r.getInt(0) -> (r.getInt(1), r.getSeq[org.apache.spark.sql.Row](2)))
      .toMap
    for (g <- 1 to 8) {
      val (n, buf) = got(g)
      if (g <= cap) {
        assert(n === g)
        assert(buf.map(_.getString(0)).sorted === (1 to g).map(i => s"s$g-$i"))
        assert(buf.forall(r => r.getDouble(1) === r.getString(0).split("-")(1).toInt * 1.5))
      } else assert(n === cap + 1)
    }
  }

  test("null inputs are skipped, not collected") {
    import spark.implicits._
    val df = Seq((1, Some(10L)), (1, None), (1, Some(11L)), (2, None))
      .toDF("g", "v")
    val got = df.groupBy("g")
      .agg(CappedCollect.of(5)(col("v")).as("raw"))
      .selectExpr("g", "sort_array(raw) as raw")
      .collect().map(r => r.getInt(0) -> r.getSeq[Long](1)).toMap
    assert(got(1) === Seq(10L, 11L))
    assert(got(2) === Seq.empty)
  }

  test("longs form: nulls skipped, agrees with the generic form on long input") {
    import spark.implicits._
    val df = Seq((1, Some(10L)), (1, None), (1, Some(11L)), (2, None), (3, Some(7L)))
      .toDF("g", "v").repartition(5)
    def sets(c: org.apache.spark.sql.Column): Map[Int, Seq[Long]] =
      df.groupBy("g").agg(c.as("raw"))
        .selectExpr("g", "sort_array(raw) as raw")
        .collect().map(r => r.getInt(0) -> r.getSeq[Long](1)).toMap
    val prim = sets(CappedCollect.longs(5)(col("v")))
    assert(prim === sets(CappedCollect.of(5)(col("v"))))
    assert(prim(1) === Seq(10L, 11L) && prim(2) === Seq.empty && prim(3) === Seq(7L))
  }

  test("sort-based fallback path (threshold 2) agrees with the hash path") {
    import spark.implicits._
    // force ObjectHashAggregate's sort-based fallback after 2 keys so
    // the serialize/deserialize/merge codepaths run; results must be
    // identical to the pure hash-map run
    val rows = for { g <- 1 to 40; i <- 1 to g } yield (g.toLong, (g * 1000 + i).toLong)
    val df = rows.toDF("g", "id").repartition(16)
    def run(): Map[Long, Int] = df.groupBy("g")
      .agg(CappedCollect.longs(7)(col("id")).as("raw"))
      .selectExpr("g", "size(raw) as n")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val hashRun = run()
    val key = "spark.sql.objectHashAggregate.sortBased.fallbackThreshold"
    val prev = spark.conf.get(key)
    try {
      spark.conf.set(key, "2")
      assert(run() === hashRun)
    } finally spark.conf.set(key, prev)
    for (g <- 1 to 40)
      assert(hashRun(g.toLong) === math.min(g, 8), s"group $g")
  }
}
