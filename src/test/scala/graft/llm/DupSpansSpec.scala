package graft.llm

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** Duplicated-span profile ([[Dedup.qDupSpans]]): hand-checked window
  * algebra (cross-doc and in-doc duplication, short-doc exclusion) and
  * equality with an independent STRING-window brute force — which also
  * pins that the 60-bit hash keys behave as the window strings. */
class DupSpansSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  private def run(dir: String): Map[Long, (Long, Long, Double)] =
    Dedup.qDupSpans(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap

  test("window duplication algebra on a hand fixture") {
    val dir = java.nio.file.Files.createTempDirectory("graft-spans").toString
    import spark.implicits._
    val w8 = "a b c d e f g h"                  // one 8-token window
    Seq(
      (1L, s"$w8 i j", "en", "s", 1L),          // 3 windows, first shared with doc 2
      (2L, s"$w8 zz qq", "en", "s", 1L),        // 3 windows, first shared with doc 1
      (3L, "p q r s t u v w", "en", "s", 1L),   // 1 unique window
      (4L, s"$w8 $w8", "en", "s", 1L),          // 9 windows; pos1 == pos9 (in-doc dup, also hits docs 1/2)
      (5L, "too short", "en", "s", 1L))         // < 8 tokens: no row
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = run(dir)
    assert(got.keySet === Set(1L, 2L, 3L, 4L))
    assert(got(1L) === ((3L, 1L, 1.0 / 3)))
    assert(got(2L) === ((3L, 1L, 1.0 / 3)))
    assert(got(3L) === ((1L, 0L, 0.0)))
    // doc 4: 9 windows; only positions 1 and 9 repeat the w8 window
    assert(got(4L) === ((9L, 2L, 2.0 / 9)))
  }

  test("span removal keeps the corpus-first occurrence, cuts the rest, drops emptied docs") {
    val dir = java.nio.file.Files.createTempDirectory("graft-spansclean").toString
    import spark.implicits._
    val w8 = "a b c d e f g h"
    Seq(
      (1L, s"$w8 i j", "en", "s", 1L),         // keeper of w8: doc 1 pos 1 — untouched
      (2L, s"$w8 zz qq", "en", "s", 1L),       // w8 copy removed, tail survives
      (3L, "p q r s t u v w", "en", "s", 1L),  // unique window — untouched
      (4L, s"$w8 $w8", "en", "s", 1L),         // both spans removed -> emptied, no row
      (5L, "too short", "en", "s", 1L))        // < window: passthrough
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = Dedup.qDupSpansClean(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2)))).toMap
    assert(got === Map(
      1L -> ((10L, s"$w8 i j")),
      2L -> ((2L, "zz qq")),
      3L -> ((8L, "p q r s t u v w")),
      5L -> ((2L, "too short"))))
  }

  test("hash-keyed pipeline equals the string-window brute force at sf0.001") {
    val dir = "/root/testdata/sf0.001"
    val got = run(dir)
    val docs = graft.Tables.load(spark, dir, "documents")
      .selectExpr("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ").filter(_.nonEmpty))
    val windows = docs.toSeq.flatMap { case (id, ta) =>
      ta.sliding(Dedup.DupSpanW).filter(_.length == Dedup.DupSpanW)
        .map(w => (id, w.mkString(" "))).toSeq
    }
    val global = windows.groupBy(_._2).view.mapValues(_.size).toMap
    val want = windows.groupBy(_._1).map { case (id, ws) =>
      val nDup = ws.count(w => global(w._2) >= 2).toLong
      id -> ((ws.size.toLong, nDup, nDup.toDouble / ws.size))
    }
    assert(got === want)
    assert(got.nonEmpty)
  }
}
