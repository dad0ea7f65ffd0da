package graft.functions

import graft.SparkTestSession
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property tests for the native Catalyst expressions: randomized
  * inputs (ScalaCheck generators, fixed seed so failures replay)
  * evaluated through the real DataFrame/codegen path and compared to
  * INDEPENDENT reference models written in this spec from each
  * expression's documented contract — different formulation on
  * purpose (hex-string md5 parse instead of byte folds, linear
  * bucket counts instead of binary search, Scala collection
  * combinators instead of while loops), so a shared bug in
  * implementation + test would have to be invented twice.
  *
  * The unit specs (CappedCollectSpec, PairExpansionSpec, …) pin
  * hand-picked edge cases; this spec pins the bulk of the input
  * space. All rows evaluate in ONE job per family.
  */
class NativeExprPropertySpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  // ---- deterministic generation -----------------------------------
  private val seed = Seed(0x5eedL)
  private def sample[T](g: Gen[T]): T =
    g.pureApply(Gen.Parameters.default, seed)

  /** Small vocab forces repeated tokens/bigrams/shingles; raw strings
    * cover unicode + md5 multi-byte paths; occasional nulls exercise
    * the null-token guards. */
  private val tokenGen: Gen[String] = Gen.frequency(
    6 -> Gen.oneOf("the", "cat", "sat", "on", "a", "mat", "döc", "数据"),
    3 -> Gen.stringOfN(4, Gen.alphaNumChar),
    1 -> Gen.const(null))
  private val docGen: Gen[List[String]] = Gen.chooseNum(0, 24).flatMap(n => Gen.listOfN(n, tokenGen))
  private val docs: Seq[List[String]] =
    sample(Gen.listOfN(300, docGen)) ++
      // explicit boundary docs the generator may miss
      Seq(Nil, List("x"), List("x", "y"), List(null, null, null), List.fill(6)("dup"))

  // ---- independent reference models -------------------------------
  /** Portable 60-bit hash, reformulated: md5 HEX STRING, first 15
    * chars parsed base-16 (the implementation folds raw bytes). */
  private def refH(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val hex = d.map(b => f"$b%02x").mkString
    java.lang.Long.parseLong(hex.take(15), 16)
  }

  /** Distinct word-3-grams (all three tokens non-null), first-occurrence order. */
  private def refShingles(toks: Seq[String]): Seq[String] =
    toks.sliding(3).filter(w => w.size == 3 && w.forall(_ != null))
      .map(_.mkString(" ")).toSeq.distinct

  test("Portable.h agrees with the hex-string formulation on random strings") {
    val strs = sample(Gen.listOfN(500, Gen.frequency(
      4 -> Gen.asciiPrintableStr,
      2 -> Gen.listOfN(4, Gen.oneOf("ä", "€", "数", "🚀", "a", " ")).map(_.mkString),
      1 -> Gen.const(""))))
    strs.foreach { s =>
      assert(graft.llm.Portable.h(s) === refH(s), s"h mismatch on ${s.take(40)}")
    }
  }

  // one frame, one job for the whole token-array family
  private def tokDf: DataFrame = {
    val schema = StructType(Seq(
      StructField("id", IntegerType, nullable = false),
      StructField("toks", ArrayType(StringType, containsNull = true), nullable = false)))
    spark.createDataFrame(
      java.util.Arrays.asList(docs.zipWithIndex.map { case (d, i) => Row(i, d) }: _*),
      schema)
  }

  test("shingle_hashes / shingle_min / simhash60 / repetition_stats match reference models") {
    val rows = tokDf.select(
      col("id"),
      TextHashExprs.shingleHashes(col("toks")).as("sh"),
      TextHashExprs.shingleMin(col("toks")).as("smin"),
      TextHashExprs.simHash60(col("toks")).as("sim"),
      TextHashExprs.repetitionStats(col("toks")).as("rep"))
      .collect()
    assert(rows.length === docs.size)
    rows.foreach { r =>
      val toks = docs(r.getInt(0))
      val shingles = refShingles(toks)
      assert(r.getSeq[Long](1) === shingles.map(refH), s"shingle_hashes doc ${r.getInt(0)}")
      val expectedMin = if (shingles.isEmpty) null else shingles.map(refH).min
      assert((if (r.isNullAt(2)) null else r.getLong(2)) === expectedMin, "shingle_min")
      // simhash: majority vote over distinct non-null tokens
      val distinct = toks.filter(_ != null).distinct
      val expSim = (0 until 60).foldLeft(0L) { (acc, j) =>
        val ones = distinct.count(t => ((refH(t) >> j) & 1L) == 1L)
        if (2 * ones > distinct.size) acc | (1L << j) else acc
      }
      assert(r.getLong(3) === expSim, "simhash60")
      val rep = r.getStruct(4)
      val nonNullPairs = toks.sliding(2).filter(w => w.size == 2 && w.forall(_ != null))
        .map(_.mkString(" ")).toSeq
      assert(rep.getLong(0) === toks.size.toLong, "rep n_toks")
      assert(rep.getLong(1) === toks.filter(_ != null).distinct.size.toLong, "rep n_distinct")
      val expTop = if (nonNullPairs.isEmpty) 0L
        else nonNullPairs.groupBy(identity).values.map(_.size).max.toLong
      assert(rep.getLong(2) === expTop, "rep top_bg")
      assert(rep.getLong(3) === nonNullPairs.size.toLong, "rep total_bg")
    }
  }

  test("minhash_sig matches the universal-hash reference (and is null iff no shingles)") {
    val p = 2147483647L // 2^31-1, any prime > 60-bit-hash mod p works
    val aG = Gen.chooseNum(1L, p - 1)
    val bG = Gen.chooseNum(0L, p - 1)
    val a = sample(Gen.listOfN(8, aG)).toArray
    val b = sample(Gen.listOfN(8, bG)).toArray
    val rows = tokDf.select(col("id"),
      TextHashExprs.minhashSig(col("toks"), a, b, p).as("sig")).collect()
    rows.foreach { r =>
      val shingles = refShingles(docs(r.getInt(0)))
      if (shingles.isEmpty) assert(r.isNullAt(1), "empty doc must give null sig")
      else {
        val exp = (0 until 8).map { i =>
          shingles.map(s => (a(i) * (refH(s) % p) + b(i)) % p).min
        }
        assert(r.getSeq[Long](1) === exp, s"minhash doc ${r.getInt(0)}")
      }
    }
  }

  test("window_hashes matches sliding-window reference for w in {1,2,5}") {
    // contract: callers pass non-null tokens
    val clean = docs.map(_.filter(_ != null))
    val schema = StructType(Seq(
      StructField("id", IntegerType, nullable = false),
      StructField("toks", ArrayType(StringType, containsNull = false), nullable = false)))
    val df = spark.createDataFrame(
      java.util.Arrays.asList(clean.zipWithIndex.map { case (d, i) => Row(i, d) }: _*),
      schema)
    val rows = df.select(col("id"),
      TextHashExprs.windowHashes(col("toks"), 1).as("w1"),
      TextHashExprs.windowHashes(col("toks"), 2).as("w2"),
      TextHashExprs.windowHashes(col("toks"), 5).as("w5")).collect()
    rows.foreach { r =>
      val toks = clean(r.getInt(0))
      Seq(1 -> 1, 2 -> 2, 5 -> 3).foreach { case (w, idx) =>
        val exp =
          if (toks.size < w) Seq.empty[Long]
          else toks.sliding(w).map(win => refH(win.mkString(" "))).toSeq
        assert(r.getSeq[Long](idx) === exp, s"w=$w doc ${r.getInt(0)}")
        // length law: max(0, n - w + 1), positions NOT deduped
        assert(r.getSeq[Long](idx).size === math.max(0, toks.size - w + 1))
      }
    }
  }

  test("shingle_stats matches set reference and is symmetric in the intersection") {
    val pairs = docs.zip(docs.reverse).zipWithIndex
    val schema = StructType(Seq(
      StructField("id", IntegerType, nullable = false),
      StructField("ta", ArrayType(StringType, containsNull = true), nullable = false),
      StructField("tb", ArrayType(StringType, containsNull = true), nullable = false)))
    val df = spark.createDataFrame(
      java.util.Arrays.asList(pairs.map { case ((x, y), i) => Row(i, x, y) }: _*),
      schema)
    val rows = df.select(col("id"),
      TextHashExprs.shingleStats(col("ta"), col("tb")).as("ab"),
      TextHashExprs.shingleStats(col("tb"), col("ta")).as("ba")).collect()
    rows.foreach { r =>
      val (x, y) = pairs(r.getInt(0))._1
      val (sa, sb) = (refShingles(x).toSet, refShingles(y).toSet)
      val ab = r.getStruct(1)
      assert((ab.getLong(0), ab.getLong(1), ab.getLong(2)) ===
        ((sa & sb).size.toLong, sa.size.toLong, sb.size.toLong), s"pair ${r.getInt(0)}")
      assert(r.getStruct(2).getLong(0) === ab.getLong(0), "intersection must be symmetric")
    }
  }

  test("sorted_pair_expand emits exactly the sorted a<b combinations") {
    val listGen = Gen.chooseNum(0, 12).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(Long.MinValue / 2, Long.MaxValue / 2)).map(_.distinct))
    val lists = sample(Gen.listOfN(200, listGen)) ++ Seq(Nil, List(7L))
    val schema = StructType(Seq(
      StructField("id", IntegerType, nullable = false),
      StructField("ids", ArrayType(LongType, containsNull = false), nullable = false)))
    val df = spark.createDataFrame(
      java.util.Arrays.asList(lists.zipWithIndex.map { case (l, i) => Row(i, l) }: _*),
      schema)
    val rows = df.select(col("id"),
      TextHashExprs.sortedPairExpand(col("ids")).as("pairs")).collect()
    rows.foreach { r =>
      val ids = lists(r.getInt(0)).sorted
      val exp = for (i <- ids.indices; j <- 0 until i) yield (ids(j), ids(i))
      val got = r.getSeq[Row](1).map(p => (p.getLong(0), p.getLong(1)))
      assert(got === exp, s"list ${r.getInt(0)}")
      val n = ids.size
      assert(got.size === n * (n - 1) / 2, "pair count law")
    }
  }

  test("vector dot/normSq/cosine/perturb/toDouble match the ascending left-fold reference") {
    val dimGen = Gen.chooseNum(1, 16)
    val vecGen = dimGen.flatMap(d => Gen.listOfN(d,
      Gen.chooseNum(-1000, 1000).map(_ / 64.0f)))
    val vecs = sample(Gen.listOfN(150, Gen.zip(vecGen, vecGen)))
    val schema = StructType(Seq(
      StructField("id", IntegerType, nullable = false),
      StructField("va", ArrayType(FloatType, containsNull = false), nullable = false),
      StructField("vb", ArrayType(FloatType, containsNull = false), nullable = false)))
    val df = spark.createDataFrame(
      java.util.Arrays.asList(vecs.zipWithIndex.map { case ((x, y), i) => Row(i, x, y) }: _*),
      schema)
    val rows = df.select(col("id"),
      VectorExprs.dot(col("va"), col("vb")).as("dot"),
      VectorExprs.normSq(col("va")).as("nsq"),
      VectorExprs.cosine(col("va"), col("vb")).as("cos"),
      VectorExprs.perturb(col("id"), col("va")).as("pert"),
      VectorExprs.toDouble(col("va")).as("dbl")).collect()
    rows.foreach { r =>
      val (x, y) = vecs(r.getInt(0))
      val n = math.min(x.size, y.size)
      val dot = (0 until n).foldLeft(0.0d)((acc, i) => acc + x(i).toDouble * y(i).toDouble)
      val nsqA = x.foldLeft(0.0d)((acc, v) => acc + v.toDouble * v.toDouble)
      val nsqB = y.foldLeft(0.0d)((acc, v) => acc + v.toDouble * v.toDouble)
      assert(r.getDouble(1) === dot, "dot (bit-exact: same IEEE fold)")
      assert(r.getDouble(2) === nsqA, "normSq")
      // bit-compare: a zero vector legitimately yields NaN in both
      assert(java.lang.Double.doubleToLongBits(r.getDouble(3)) ===
        java.lang.Double.doubleToLongBits(dot / (math.sqrt(nsqA) * math.sqrt(nsqB))), "cosine")
      val pert = x.zipWithIndex.map { case (v, i) =>
        v.toDouble * (1.0d + (refH(s"n|${r.getInt(0)}|$i") % 21 - 10).toDouble / 100.0d)
      }
      assert(r.getSeq[Double](4) === pert, "perturb")
      assert(r.getSeq[Double](5) === x.map(_.toDouble), "toDouble")
    }
  }

  test("lsh_signature matches the per-plane sign reference and respects the bit budget") {
    val (tables, bits, dim) = (4, 8, 12)
    val matrix = sample(Gen.listOfN(tables * bits * dim,
      Gen.chooseNum(-1000, 1000).map(_ / 128.0d))).toArray
    val vecGen = Gen.listOfN(dim, Gen.chooseNum(-1000, 1000).map(_ / 64.0f))
    val vecs = sample(Gen.listOfN(120, vecGen))
    val schema = StructType(Seq(
      StructField("id", IntegerType, nullable = false),
      StructField("v", ArrayType(FloatType, containsNull = false), nullable = false)))
    val df = spark.createDataFrame(
      java.util.Arrays.asList(vecs.zipWithIndex.map { case (v, i) => Row(i, v) }: _*),
      schema)
    val rows = df.select(col("id"),
      LshSignature.of(col("v"), matrix, tables, bits).as("sig")).collect()
    rows.foreach { r =>
      val v = vecs(r.getInt(0))
      val exp = (0 until tables).map { t =>
        (0 until bits).foldLeft(0L) { (acc, bit) =>
          val m = t * bits + bit
          val dot = (0 until dim).foldLeft(0.0d)((s, i) => s + matrix(m * dim + i) * v(i).toDouble)
          if (dot >= 0) acc | (1L << bit) else acc
        }
      }
      val got = r.getSeq[Long](1)
      assert(got === exp, s"vec ${r.getInt(0)}")
      assert(got.forall(b => b >= 0 && b < (1L << bits)), "bucket ids within 2^bits")
    }
  }

  test("zvalue matches a linear-scan bucket + bit-interleave reference (nulls -> bucket 0)") {
    val k = 3
    val cutsGen = Gen.chooseNum(1, 20).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(-500, 500).map(_ / 8.0d)).map(_.distinct.sorted.toArray))
    val cuts: Array[Array[Double]] = sample(Gen.listOfN(k, cutsGen)).toArray
    val valGen: Gen[java.lang.Double] = Gen.frequency(
      8 -> Gen.chooseNum(-600, 600).map(v => java.lang.Double.valueOf(v / 8.0d)),
      1 -> Gen.const(null.asInstanceOf[java.lang.Double]))
    val rowsIn = sample(Gen.listOfN(200, Gen.listOfN(k, valGen)))
    val schema = StructType(Seq(
      StructField("id", IntegerType, nullable = false),
      StructField("v", ArrayType(DoubleType, containsNull = true), nullable = false)))
    val df = spark.createDataFrame(
      java.util.Arrays.asList(rowsIn.zipWithIndex.map { case (v, i) => Row(i, v) }: _*),
      schema)
    val zCol = org.apache.spark.sql.GraftShims.column(
      ZValue(org.apache.spark.sql.GraftShims.expression(col("v")), cuts))
    val rows = df.select(col("id"), zCol.as("z")).collect()
    rows.foreach { r =>
      val vals = rowsIn(r.getInt(0))
      val exp = (0 until k).foldLeft(0L) { (acc, j) =>
        val b = if (vals(j) == null) 0 else cuts(j).count(_ <= vals(j).doubleValue())
        (0 until ZOrder.Bits).foldLeft(acc)((a, i) => a | (((b >> i) & 1L) << (i * k + j)))
      }
      assert(r.getLong(1) === exp, s"row ${r.getInt(0)}")
    }
  }
}
