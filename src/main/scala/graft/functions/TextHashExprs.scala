package graft.functions

import org.apache.spark.sql.{Column, GraftShims}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types._

/** Native token/shingle hashing for the dedup and fingerprint
  * operators: one pass per document inside whole-stage codegen,
  * replacing explode → window-lead → distinct → wide-aggregate
  * pipelines that shuffled every token/shingle row.
  *
  * Determinism contract: every hash is the portable 60-bit md5
  * ([[graft.llm.Portable]]) the DuckDB oracles compute, shingles are
  * word 3-grams over the raw token array with string-equality
  * distinctness, and all arithmetic is exact 64-bit integer math — so
  * results agree with the oracle bit-for-bit, same as the relational
  * formulation they replace.
  */
private[functions] object TextHashHelper {
  private val md5 = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Portable.h: first 15 hex chars of md5 as a 60-bit long. */
  def h(s: String): Long = {
    val d = md5.get()
    d.reset()
    val bytes = d.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    // first 15 hex chars = 7.5 bytes: fold the top 60 bits
    var acc = 0L
    var i = 0
    while (i < 7) { acc = (acc << 8) | (bytes(i) & 0xffL); i += 1 }
    (acc << 4) | ((bytes(7) & 0xf0L) >> 4)
  }

  private def tokens(arr: ArrayData): Array[String] = {
    val n = arr.numElements()
    val out = new Array[String](n)
    var i = 0
    while (i < n) {
      out(i) = if (arr.isNullAt(i)) null else arr.getUTF8String(i).toString
      i += 1
    }
    out
  }

  /** Distinct word-3-gram shingles, string equality. */
  def shingleSet(arr: ArrayData): java.util.LinkedHashSet[String] = {
    val toks = tokens(arr)
    val set = new java.util.LinkedHashSet[String]()
    var i = 0
    while (i + 2 < toks.length) {
      if (toks(i) != null && toks(i + 1) != null && toks(i + 2) != null)
        set.add(toks(i) + " " + toks(i + 1) + " " + toks(i + 2))
      i += 1
    }
    set
  }

  /** 60-bit SimHash over DISTINCT unigram tokens: bit j set iff the
    * majority of token hashes have bit j set (2·c_j > n). */
  def simHash60(arr: ArrayData): Long = {
    val seen = new java.util.HashSet[String]()
    val counts = new Array[Long](60)
    var cnt = 0L
    val toks = tokens(arr)
    var i = 0
    while (i < toks.length) {
      val t = toks(i)
      if (t != null && seen.add(t)) {
        val hh = h(t)
        cnt += 1
        var j = 0
        while (j < 60) { counts(j) += (hh >> j) & 1L; j += 1 }
      }
      i += 1
    }
    var sim = 0L
    var j = 0
    while (j < 60) { if (2 * counts(j) > cnt) sim |= 1L << j; j += 1 }
    sim
  }

  /** MinHash signature via universal hashing h_i(s) = (a_i·(H(s) mod p)
    * + b_i) mod p over distinct shingles; null when the doc has no
    * 3-grams (mirrors the relational pipeline dropping those docs). */
  def minhashSig(arr: ArrayData, a: Array[Long], b: Array[Long], p: Long): ArrayData = {
    val set = shingleSet(arr)
    if (set.isEmpty) return null
    val k = a.length
    val mins = Array.fill(k)(Long.MaxValue)
    val it = set.iterator()
    while (it.hasNext) {
      val x = h(it.next()) % p
      var i = 0
      while (i < k) {
        val v = (a(i) * x + b(i)) % p
        if (v < mins(i)) mins(i) = v
        i += 1
      }
    }
    new GenericArrayData(mins)
  }

  /** Distinct-shingle portable hashes (the inverted-index keys for
    * direct n-gram Jaccard dedup); empty array when no shingles. */
  def shingleHashes(arr: ArrayData): ArrayData = {
    val set = shingleSet(arr)
    val out = new Array[Long](set.size)
    var i = 0
    val it = set.iterator()
    while (it.hasNext) { out(i) = h(it.next()); i += 1 }
    new GenericArrayData(out)
  }

  /** Minimum portable hash over distinct shingles (bottom-1 sketch);
    * null when no shingles. */
  def shingleMin(arr: ArrayData): Any = {
    val set = shingleSet(arr)
    if (set.isEmpty) return null
    var m = Long.MaxValue
    val it = set.iterator()
    while (it.hasNext) { val v = h(it.next()); if (v < m) m = v }
    m
  }

  /** Per-document repetition statistics in one pass: token count,
    * distinct-token count, the top bigram's multiplicity, and the
    * bigram total — the inputs of the Gopher-style repetition filters.
    * Doc-local exact string counting (no hashing, no collision
    * caveat); memory is bounded by the document's own length. */
  def repetitionStats(arr: ArrayData): InternalRow = {
    val toks = tokens(arr)
    val distinct = new java.util.HashSet[String]()
    var i = 0
    while (i < toks.length) {
      if (toks(i) != null) distinct.add(toks(i))
      i += 1
    }
    val bg = new java.util.HashMap[String, Long]()
    var topBg = 0L
    var totalBg = 0L
    i = 0
    while (i + 1 < toks.length) {
      if (toks(i) != null && toks(i + 1) != null) {
        val key = toks(i) + " " + toks(i + 1)
        val c = bg.merge(key, 1L, (x, y) => x + y)
        if (c > topBg) topBg = c
        totalBg += 1
      }
      i += 1
    }
    InternalRow(toks.length.toLong, distinct.size.toLong, topBg, totalBg)
  }

  /** (|A ∩ B|, |A|, |B|) over the two docs' distinct shingle sets. */
  def shingleStats(a: ArrayData, b: ArrayData): InternalRow = {
    val sa = shingleSet(a)
    val sb = shingleSet(b)
    var inter = 0L
    val it = sa.iterator()
    while (it.hasNext) if (sb.contains(it.next())) inter += 1
    InternalRow(inter, sa.size.toLong, sb.size.toLong)
  }

  /** Per-POSITION w-token window hashes (NON-distinct — element i is
    * the window starting at token i, so the array length is
    * `len - w + 1`); empty when the doc is shorter than w. One pass,
    * one h() per window, a reused builder for the join. Input contract:
    * non-null tokens (callers filter empties first). */
  def windowHashes(arr: ArrayData, w: Int): ArrayData = {
    val toks = tokens(arr)
    val n = toks.length - w + 1
    if (n <= 0) return new GenericArrayData(Array.emptyLongArray)
    val sb = new java.lang.StringBuilder()
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      sb.setLength(0)
      var j = 0
      while (j < w) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      out(i) = h(sb.toString)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Row-local grouping of a LONG array (r20): one struct per DISTINCT
    * value, carrying its ASCENDING 1-based positions — i.e. exactly the
    * `posexplode → groupBy(row_id, value) → sort_array(collect_list)`
    * result, computed inside the row. The dup-spans family's first
    * aggregation grouped by (doc_id, window-hash) — a key that embeds
    * the row's own id, so the groups never cross rows and the
    * occurrence-scale exchange + object hash aggregate it paid were
    * pure overhead (guide §2.4 "remove shuffles outright"). Value order
    * is first occurrence (deterministic; consumers aggregate or join by
    * value, never by list position). Empty input → empty array. */
  def longGroupPositions(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    if (n == 0) return new GenericArrayData(Array.empty[Any])
    val vals = arr.toLongArray()
    val order = new java.util.ArrayList[java.lang.Long](math.min(n, 16))
    val pos = new java.util.HashMap[java.lang.Long, java.util.ArrayList[java.lang.Integer]]()
    var i = 0
    while (i < n) {
      val v = java.lang.Long.valueOf(vals(i))
      var l = pos.get(v)
      if (l == null) {
        l = new java.util.ArrayList[java.lang.Integer](4)
        pos.put(v, l)
        order.add(v)
      }
      l.add(Integer.valueOf(i + 1))
      i += 1
    }
    val m = order.size()
    val out = new Array[Any](m)
    var k = 0
    while (k < m) {
      val v = order.get(k)
      val l = pos.get(v)
      val is = new Array[Int](l.size())
      var j = 0
      while (j < is.length) { is(j) = l.get(j).intValue(); j += 1 }
      out(k) = InternalRow(v.longValue(), new GenericArrayData(is))
      k += 1
    }
    new GenericArrayData(out)
  }

  /** All a<b pairs of a (distinct-id) posting list, sorted internally
    * — ONE primitive loop per list. Total: n ≤ 1 yields the empty
    * array (the same contract that makes the SQL form safe under
    * InferFiltersFromGenerate's eval-before-guard). */
  def sortedPairs(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    if (n < 2) return new GenericArrayData(Array.empty[Any])
    val ids = arr.toLongArray()
    java.util.Arrays.sort(ids)
    val out = new Array[Any](n * (n - 1) / 2)
    var k = 0
    var i = 1
    while (i < n) {
      var j = 0
      while (j < i) {
        out(k) = InternalRow(ids(j), ids(i))
        k += 1
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }
}

private[functions] trait TokArrayInput { self: Expression =>
  protected def tokOk(dt: DataType): Boolean = dt match {
    case ArrayType(StringType, _) => true
    case _ => false
  }
  protected val helperRef: String =
    TextHashHelper.getClass.getName.stripSuffix("$")
}

/** 60-bit SimHash of a token array. */
final case class SimHash60(child: Expression)
    extends UnaryExpression with TokArrayInput {
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash60"
  override def checkInputDataTypes(): TypeCheckResult =
    if (tokOk(child.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"simhash60 expects array<string>, got ${child.dataType.catalogString}")
  override protected def nullSafeEval(a: Any): Any =
    TextHashHelper.simHash60(a.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"$helperRef.simHash60($a)")
  override protected def withNewChildInternal(c: Expression): SimHash60 = copy(child = c)
}

/** MinHash signature (array of k mins) of a token array's 3-gram
  * shingles; null for docs with no 3-grams. */
final case class MinhashSig(
    child: Expression, a: Array[Long], b: Array[Long], p: Long)
    extends UnaryExpression with TokArrayInput {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "minhash_sig"
  override def checkInputDataTypes(): TypeCheckResult =
    if (tokOk(child.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"minhash_sig expects array<string>, got ${child.dataType.catalogString}")
  override protected def nullSafeEval(x: Any): Any =
    TextHashHelper.minhashSig(x.asInstanceOf[ArrayData], a, b, p)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("minhashA", a, "long[]")
    val bRef = ctx.addReferenceObj("minhashB", b, "long[]")
    nullSafeCodeGen(ctx, ev, x => {
      s"""
         |${ev.value} = $helperRef.minhashSig($x, $aRef, $bRef, ${p}L);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin
    })
  }
  override protected def withNewChildInternal(c: Expression): MinhashSig = copy(child = c)
}

/** Distinct-shingle portable hashes of a token array — one codegen'd
  * pass per document; the long keys feed keyed joins (no string
  * shuffles, no window n-gram assembly). */
final case class ShingleHashes(child: Expression)
    extends UnaryExpression with TokArrayInput {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "shingle_hashes"
  override def checkInputDataTypes(): TypeCheckResult =
    if (tokOk(child.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"shingle_hashes expects array<string>, got ${child.dataType.catalogString}")
  override protected def nullSafeEval(a: Any): Any =
    TextHashHelper.shingleHashes(a.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"$helperRef.shingleHashes($a)")
  override protected def withNewChildInternal(c: Expression): ShingleHashes = copy(child = c)
}

/** Bottom-1 shingle sketch: min portable hash over distinct 3-grams;
  * null when the doc has no 3-grams. */
final case class ShingleMin(child: Expression)
    extends UnaryExpression with TokArrayInput {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "shingle_min"
  override def checkInputDataTypes(): TypeCheckResult =
    if (tokOk(child.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"shingle_min expects array<string>, got ${child.dataType.catalogString}")
  override protected def nullSafeEval(a: Any): Any =
    TextHashHelper.shingleMin(a.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val tmp = ctx.freshName("shingleMin")
      s"""
         |Object $tmp = $helperRef.shingleMin($a);
         |if ($tmp == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = ((Long) $tmp).longValue(); }
       """.stripMargin
    })
  override protected def withNewChildInternal(c: Expression): ShingleMin = copy(child = c)
}

/** Per-position w-token window hashes — the duplicated-span profile's
  * index keys ([[graft.llm.Dedup.qDupSpans]]): one codegen'd pass per
  * document, long keys only (no window-string shuffle, and no
  * HOF-built array under an explode — Generate would re-evaluate the
  * lambda per OUTPUT row). */
final case class WindowHashes(child: Expression, w: Int)
    extends UnaryExpression with TokArrayInput {
  require(w >= 1, s"window width must be positive, got $w")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "window_hashes"
  override def checkInputDataTypes(): TypeCheckResult =
    if (tokOk(child.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"window_hashes expects array<string>, got ${child.dataType.catalogString}")
  override protected def nullSafeEval(a: Any): Any =
    TextHashHelper.windowHashes(a.asInstanceOf[ArrayData], w)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"$helperRef.windowHashes($a, $w)")
  override protected def withNewChildInternal(c: Expression): WindowHashes =
    copy(child = c)
}

/** Per-document repetition statistics (token count, distinct tokens,
  * top-bigram multiplicity, bigram total) in one codegen'd pass — the
  * whole Gopher-repetition metric without exploding a single token row
  * (an interpreted-HOF bigram transform measured ~6 µs/element; this
  * is the native replacement). */
final case class RepetitionStats(child: Expression)
    extends UnaryExpression with TokArrayInput {
  override def dataType: DataType = StructType(Seq(
    StructField("n_toks", LongType, nullable = false),
    StructField("n_distinct", LongType, nullable = false),
    StructField("top_bg", LongType, nullable = false),
    StructField("total_bg", LongType, nullable = false)))
  override def prettyName: String = "repetition_stats"
  override def checkInputDataTypes(): TypeCheckResult =
    if (tokOk(child.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"repetition_stats expects array<string>, got ${child.dataType.catalogString}")
  override protected def nullSafeEval(a: Any): Any =
    TextHashHelper.repetitionStats(a.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"$helperRef.repetitionStats($a)")
  override protected def withNewChildInternal(c: Expression): RepetitionStats =
    copy(child = c)
}

/** (intersection, |A|, |B|) of two docs' distinct shingle sets — the
  * exact-Jaccard verify in one pass over a candidate pair. */
final case class ShingleStats(left: Expression, right: Expression)
    extends BinaryExpression with TokArrayInput {
  override def dataType: DataType = StructType(Seq(
    StructField("inter", LongType, nullable = false),
    StructField("na", LongType, nullable = false),
    StructField("nb", LongType, nullable = false)))
  override def prettyName: String = "shingle_stats"
  override def checkInputDataTypes(): TypeCheckResult =
    if (tokOk(left.dataType) && tokOk(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"shingle_stats expects array<string> inputs, got ${left.dataType.catalogString}, ${right.dataType.catalogString}")
  override protected def nullSafeEval(a: Any, b: Any): Any =
    TextHashHelper.shingleStats(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"$helperRef.shingleStats($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): ShingleStats =
    copy(left = l, right = r)
}

/** a<b pair expansion of a LONG posting list (sorts a private copy,
  * emits the n(n-1)/2 ordered pairs): the native replacement for the
  * nested `transform`/`flatten` SQL form — higher-order functions run
  * INTERPRETED (per-element lambda contexts, per-pair named_struct
  * eval), measured at ~2× the candidate stage's expansion cost on the
  * dedup family; this is one primitive loop inside codegen. Input ids
  * must be distinct (every posting-list producer here is a grouped
  * key); n ≤ 1 yields the empty array. */
final case class SortedPairExpand(child: Expression)
    extends UnaryExpression with TokArrayInput {
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("a", LongType, nullable = false),
    StructField("b", LongType, nullable = false))), containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "sorted_pair_expand"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"sorted_pair_expand expects array<bigint>, got ${other.catalogString}")
  }
  override protected def nullSafeEval(a: Any): Any =
    TextHashHelper.sortedPairs(a.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"$helperRef.sortedPairs($a)")
  override protected def withNewChildInternal(c: Expression): SortedPairExpand =
    copy(child = c)
}

/** Row-local (value → ascending 1-based positions) grouping of a long
  * array — the native replacement for the dup-spans family's
  * `posexplode → groupBy(doc_id, wh) → sort_array(collect_list(i))`
  * stage, whose group key embeds the row id and therefore never needed
  * an exchange (see [[TextHashHelper.longGroupPositions]]). */
final case class LongGroupPositions(child: Expression)
    extends UnaryExpression with TokArrayInput {
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("v", LongType, nullable = false),
    StructField("is", ArrayType(IntegerType, containsNull = false),
      nullable = false))), containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "long_group_positions"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"long_group_positions expects array<bigint>, got ${other.catalogString}")
  }
  override protected def nullSafeEval(a: Any): Any =
    TextHashHelper.longGroupPositions(a.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"$helperRef.longGroupPositions($a)")
  override protected def withNewChildInternal(c: Expression): LongGroupPositions =
    copy(child = c)
}

object TextHashExprs {
  private def c(e: Expression): Column = GraftShims.column(e)
  private def x(col: Column): Expression = GraftShims.expression(col)
  def simHash60(toks: Column): Column = c(SimHash60(x(toks)))
  def minhashSig(toks: Column, a: Array[Long], b: Array[Long], p: Long): Column =
    c(MinhashSig(x(toks), a, b, p))
  def shingleHashes(toks: Column): Column = c(ShingleHashes(x(toks)))
  def windowHashes(toks: Column, w: Int): Column = c(WindowHashes(x(toks), w))
  def shingleMin(toks: Column): Column = c(ShingleMin(x(toks)))
  def shingleStats(a: Column, b: Column): Column = c(ShingleStats(x(a), x(b)))
  def repetitionStats(toks: Column): Column = c(RepetitionStats(x(toks)))
  def sortedPairExpand(ids: Column): Column = c(SortedPairExpand(x(ids)))
  def longGroupPositions(vals: Column): Column = c(LongGroupPositions(x(vals)))
}
