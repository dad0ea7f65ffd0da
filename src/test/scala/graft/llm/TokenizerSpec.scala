package graft.llm

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** BPE merge induction on a hand-computed corpus: rule selection,
  * lexicographic tie-breaks, self-pair exclusion, non-overlapping
  * rewrite, and the per-round token accounting. */
class TokenizerSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  test("three merge rounds match the hand-derived rules and token counts") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-bpe").toString
    Seq(
      (1L, "x y x y z", "en", "src0", 9L),
      (2L, "x y q", "en", "src0", 5L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val got = Tokenizer.qBpeMerges(spark, dir).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3), r.getLong(4)))
      .toSeq
    assert(got === Seq(
      // round 1: (x,y) appears 3 times; both docs rewrite; 7+5-3 pairs→5 tokens
      (1, "x", "y", 3L, 5L),
      // round 2: ("x y","x y") is a SELF-pair — excluded; the tie
      // between ("x y","q") and ("x y","z") breaks to the smaller b
      (2, "x y", "q", 1L, 4L),
      (3, "x y", "z", 1L, 3L)))

    // determinism: a rerun selects the identical rules
    assert(Tokenizer.qBpeMerges(spark, dir).collect()
      .map(_.toSeq).toSeq === got.map(t => Seq(t._1, t._2, t._3, t._4, t._5)))
  }

  test("encode applies the induced rules; counts and content hashes are exact") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-bpe-enc").toString
    Seq(
      (1L, "x y x y z", "en", "src0", 9L),
      (2L, "x y q", "en", "src0", 5L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    // rules (previous test): (x,y) → ("x y",q) → ("x y",z), so
    // doc 1: [x,y,x,y,z] → [x y, x y, z] → (no q) → [x y, x y z]
    // doc 2: [x,y,q]     → [x y, q]      → [x y q] → (no z match)
    def md5(s: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    val got = Tokenizer.qBpeEncode(spark, dir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSeq
    assert(got === Seq(
      (1L, 2, md5(Seq("x y", "x y z").mkString("\u001f"))),
      (2L, 1, md5("x y q"))))

    // fertility over the same corpus: one source, 8 words -> 3 pieces
    val fert = Tokenizer.qBpeFertility(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(fert.toSeq === Seq(("src0", 8L, 3L, 3.0 / 8.0)))
  }

  test("fertility on the shared corpus: totals consistent, merges only fuse") {
    val sf = "/root/testdata/sf0.001"
    val rows = Tokenizer.qBpeFertility(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(rows.nonEmpty)
    rows.foreach { case (src, w, p, f) =>
      assert(p <= w, s"source $src gained tokens under merges")
      assert(f === p.toDouble / w, s"source $src fertility inconsistent")
      assert(f > 0.0 && f <= 1.0)
    }
    // cross-check the totals against the per-doc encode output
    val encP = Tokenizer.qBpeEncode(spark, sf).collect()
      .map(_.getInt(1).toLong).sum
    assert(rows.map(_._3).sum === encP, "fertility piece total != encode total")
  }
}
