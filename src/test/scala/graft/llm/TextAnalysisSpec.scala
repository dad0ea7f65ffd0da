package graft.llm

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** Text-analysis structural invariants (the DuckDB oracle pins exact
  * values; these pin the metric semantics). */
class TextAnalysisSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("pii redaction: true positives redacted staged, clean text untouched") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      1L -> "contact alice.smith+test@example-corp.co.uk or bob@x.io today",
      2L -> "server at 192.168.0.1 and 10.0.0.255 responded",
      3L -> "call +1 (555) 123-4567 now",
      4L -> "perfectly clean prose with no identifiers at all",
      // an IP must be redacted AS an ip, not re-counted by the phone
      // pattern (digits+dots would match it)
      5L -> "ping 172.16.254.3 then dial 020 7946 0958",
      // FP boundary: decimals and sentence-spanning digit runs survive
      // (no '.' in the phone class, run bounded) ...
      6L -> "pi is 3.14159265 and from 1914. 1918 was the end",
      // ... while dash-grouped digit strings of phone-like length are a
      // KNOWN false-positive class of regex-only detection (pinned —
      // over-redaction is the conservative direction for training data)
      7L -> "released 2020-06-15 in stores").toDF("doc_id", "text")
    val out = TextAnalysis.redactPii(docs).collect()
      .map(r => r.getLong(0) -> r).toMap

    assert(out(1L).getString(1) === "contact <EMAIL> or <EMAIL> today")
    assert(out(1L).getLong(2) === 2L) // n_emails
    assert(out(2L).getString(1) === "server at <IP> and <IP> responded")
    assert(out(2L).getLong(3) === 2L) // n_ips
    assert(out(3L).getString(1) === "call <PHONE> now")
    assert(out(3L).getLong(4) === 1L) // n_phones
    assert(out(4L).getString(1) === "perfectly clean prose with no identifiers at all")
    assert((out(4L).getLong(2), out(4L).getLong(3), out(4L).getLong(4)) === ((0L, 0L, 0L)))
    // staging: the IP is gone before the phone pass ever sees it
    assert(out(5L).getString(1) === "ping <IP> then dial <PHONE>")
    assert((out(5L).getLong(3), out(5L).getLong(4)) === ((1L, 1L)))
    // FP boundary pinned both ways
    assert(out(6L).getString(1) === "pi is 3.14159265 and from 1914. 1918 was the end")
    assert(out(7L).getString(1) === "released <PHONE> in stores")
  }

  test("repetition metrics: bounded, and exact on a hand-checked doc") {
    val out = TextAnalysis.qTextRepetition(spark, sf).collect()
    assert(out.nonEmpty)
    // every doc with >= 2 tokens appears exactly once
    val eligible = graft.Tables.load(spark, sf, "documents")
      .filter("size(split(lower(text), ' ')) >= 2").count()
    assert(out.length.toLong === eligible)
    out.foreach { r =>
      val (dup, top) = (r.getDouble(2), r.getDouble(3))
      assert(dup >= 0.0 && dup < 1.0, s"dup_tok_frac out of range: $r")
      assert(top > 0.0 && top <= 1.0, s"top_bigram_frac out of range: $r")
    }

    // hand-check one row end-to-end against an independent Scala
    // computation over the raw text
    val sample = graft.Tables.load(spark, sf, "documents")
      .selectExpr("doc_id", "text").head()
    val toks = sample.getString(1).toLowerCase.split(" ").toSeq
    val bigrams = toks.sliding(2).map(_.mkString(" ")).toSeq
    val expectedDup = (toks.size - toks.distinct.size).toDouble / toks.size
    val expectedTop =
      bigrams.groupBy(identity).values.map(_.size).max.toDouble / bigrams.size
    val row = out.find(_.getLong(0) == sample.getLong(0)).get
    assert(row.getLong(1) === toks.size.toLong)
    assert(math.abs(row.getDouble(2) - expectedDup) < 1e-12)
    assert(math.abs(row.getDouble(3) - expectedTop) < 1e-12)
  }

  test("quality quantile: threshold semantics — >=25% kept per source, clean cut") {
    val kept = TextAnalysis.qQualityQuantile(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    assert(kept.nonEmpty)
    val all = TextAnalysis.qualityScored(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1),
        r.getDecimal(2).doubleValue()))
    val bySource = all.groupBy(_._2)
    val keptBySource = kept.groupBy(_._2)
    bySource.foreach { case (src, docs) =>
      val k = keptBySource.getOrElse(src, Array.empty[(Long, String, Double)])
      // a threshold cut keeps AT LEAST the quantile's worth (ties at
      // the cut level are all kept, never tie-broken away)
      assert(k.length >= (docs.length + 3) / 4,
        s"source $src kept ${k.length} of ${docs.length}")
      // clean cut: every excluded doc scores strictly below every kept
      // doc's minimum — the defining property of a threshold filter
      val thr = k.map(_._3).min
      val keptIds = k.map(_._1).toSet
      docs.filterNot(d => keptIds.contains(d._1)).foreach { d =>
        assert(d._3 < thr, s"excluded doc ${d._1} at quality ${d._3} >= cut $thr")
      }
    }
  }

  test("chunking: contiguous ids, full windows except the tail, exact coverage") {
    val w = 64
    val stride = 48
    val chunks = TextAnalysis.qDocChunks(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1)
    val nTokens = graft.Tables.load(spark, sf, "documents")
      .selectExpr("doc_id",
        "size(filter(split(lower(text), ' '), t -> length(t) > 0)) as n")
      .collect().map(r => r.getLong(0) -> r.getInt(1).toLong).toMap
    assert(chunks.nonEmpty)
    chunks.foreach { case (doc, cs) =>
      val n = nTokens(doc)
      val sortedCs = cs.sortBy(_._2)
      // ids contiguous from 0; count matches the closed form
      assert(sortedCs.map(_._2).toSeq ===
        (0L until sortedCs.length.toLong).toSeq, s"doc $doc ids not contiguous")
      val expectK = (math.max(n - w, 0) + stride - 1) / stride + 1
      assert(sortedCs.length.toLong === expectK, s"doc $doc chunk count")
      // every chunk but the last is a full window; none is empty
      sortedCs.init.foreach { c =>
        assert(c._3 === w.toLong, s"doc $doc chunk ${c._2} not full") }
      assert(sortedCs.last._3 >= 1L && sortedCs.last._3 <= w.toLong)
      // the last chunk ends exactly at the last token: full coverage
      assert(sortedCs.last._2 * stride + sortedCs.last._3 === n,
        s"doc $doc coverage gap")
    }
  }
}
