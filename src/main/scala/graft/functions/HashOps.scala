package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodegenFallback, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

import graft.ops.Dedup

/** Primitive-loop hashing kernels for the MinHash hot path.
  *
  * The declarative forms — `transform(sh, s => conv(substring(md5(s),1,15),
  * 16,10))` and per-seed `transform(hs, h => rotate-xor)` — run interpreted
  * inside lambda bodies with per-element boxing and (for conv) BigInteger
  * parsing. These expressions compute the SAME values (md5 of the UTF-8
  * bytes, first 60 bits; rotate-left-then-xor per seed) with one loop per
  * row: bit-identical results, spec-asserted, oracle-portable.
  */
object HashOps {

  /** First 60 bits of an md5 digest == parsing its first 15 hex digits. */
  private[graft] def prefix60(d: Array[Byte]): Long = {
    var acc = 0L
    var i = 0
    while (i < 7) { acc = (acc << 8) | (d(i) & 0xffL); i += 1 }
    (acc << 4) | ((d(7) >> 4) & 0xfL)
  }

  private[graft] val mdLocal = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  def md5Prefix60Array(a: Column): Column =
    GraftBridge.column(Md5Prefix60ArrayExpr(GraftBridge.expression(a)))

  /** Seeded variant: element-wise md5("<seed>|<element>") prefix60 ==
    * `Dedup.seededHash(seed, _)` element-wise. */
  def md5Prefix60Array(a: Column, seed: Int): Column =
    GraftBridge.column(Md5Prefix60SeededArrayExpr(GraftBridge.expression(a), seed))

  /** SimHash from per-token hashes: one loop over the array maintaining
    * `bits` counters (== Dedup.simhash's 48 aggregate lambdas, which
    * re-walk the array per bit in interpreted HOF eval). */
  def simhashFast(hashes: Column, bits: Int): Column =
    GraftBridge.column(SimhashFromHashesExpr(GraftBridge.expression(hashes), bits))

  def minhashSigFast(hashes: Column, numHashes: Int): Column =
    GraftBridge.column(MinhashSigExpr(GraftBridge.expression(hashes), numHashes))

  /** |A ∩ B| of two SORTED-DISTINCT long arrays (two-pointer merge). */
  def sortedIntersectCount(a: Column, b: Column): Column =
    GraftBridge.column(SortedIntersectCountExpr(
      GraftBridge.expression(a), GraftBridge.expression(b)))

  /** Two-pointer distinct-intersection size over SORTED long arrays —
    * replaces `size(array_intersect(a, b))` in the pair-verify hot path
    * (array_intersect builds an OpenHashSet AND materializes the
    * intersection array per pair; the merge touches each element once and
    * allocates nothing). Inputs must be sorted ascending with distinct
    * elements (the producer sorts once per document, not per pair).
    * `doGenCode`, so verify projections stay in whole-stage codegen. */
  case class SortedIntersectCountExpr(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = LongType
    override def prettyName: String = "sorted_intersect_count"

    override def nullSafeEval(a: Any, b: Any): Any =
      SortedIntersect.count(
        a.asInstanceOf[ArrayData].toLongArray(),
        b.asInstanceOf[ArrayData].toLongArray())

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) =>
        // top-level object → static forwarder Janino can resolve (a
        // HashOps-nested object has no static path in generated Java)
        s"${ev.value} = graft.functions.SortedIntersect.count(" +
          s"$a.toLongArray(), $b.toLongArray());")

    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(left = l, right = r)
  }

  /** array<string> → array<long>: 60-bit md5 prefix of each element
    * (== Dedup.baseHash element-wise). */
  case class Md5Prefix60ArrayExpr(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "md5_prefix60_array"

    override def nullSafeEval(input: Any): Any = {
      val arr = input.asInstanceOf[ArrayData]
      val n = arr.numElements()
      val out = new Array[Long](n)
      val md = mdLocal.get()
      var i = 0
      while (i < n) {
        md.reset()
        out(i) = prefix60(md.digest(arr.getUTF8String(i).getBytes))
        i += 1
      }
      new GenericArrayData(out)
    }
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** array<string> → array<long>: 60-bit md5 prefix of
    * "<seed>|<element>" per element (== Dedup.seededHash element-wise). */
  case class Md5Prefix60SeededArrayExpr(child: Expression, seed: Int)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "md5_prefix60_seeded_array"

    @transient private lazy val prefixBytes =
      (seed.toString + "|").getBytes(java.nio.charset.StandardCharsets.UTF_8)

    override def nullSafeEval(input: Any): Any = {
      val arr = input.asInstanceOf[ArrayData]
      val n = arr.numElements()
      val out = new Array[Long](n)
      val md = mdLocal.get()
      var i = 0
      while (i < n) {
        md.reset()
        md.update(prefixBytes)
        out(i) = prefix60(md.digest(arr.getUTF8String(i).getBytes))
        i += 1
      }
      new GenericArrayData(out)
    }
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** array<long> token hashes → `bits`-bit SimHash long: bit k set when
    * the majority of hashes have bit k set (== Dedup.simhash, which walks
    * the array once per bit through interpreted aggregate lambdas; this
    * is one walk total with `bits` counters). Null in → null out; callers
    * wanting the declarative form's null→0 coalesce at the call site.
    * `doGenCode` so signature projections stay in whole-stage codegen. */
  case class SimhashFromHashesExpr(child: Expression, bits: Int)
      extends UnaryExpression {
    require(bits > 0 && bits <= 60, s"bits=$bits out of (0, 60]")
    override def dataType: DataType = LongType
    override def prettyName: String = "simhash_from_hashes"

    override def nullSafeEval(input: Any): Any =
      SimhashKernel.fromHashes(input.asInstanceOf[ArrayData].toLongArray(), bits)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a =>
        s"${ev.value} = graft.functions.SimhashKernel.fromHashes(" +
          s"$a.toLongArray(), $bits);")

    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** array<long> → array<long>(numHashes): per-seed min of the rotate-xor
    * mixed hashes (== Dedup.minhashSignatureFromHashes; empty input → 0s). */
  case class MinhashSigExpr(child: Expression, numHashes: Int)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "minhash_sig"
    // Total like the declarative twin: minhashSignatureFromHashes wraps each
    // per-seed array_min in coalesce(_, 0L), so a null hash array yields the
    // all-zero signature, same as an empty one.
    override def nullable: Boolean = false

    override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
      val v = child.eval(input)
      if (v == null) new GenericArrayData(new Array[Long](numHashes))
      else nullSafeEval(v)
    }

    @transient private lazy val rots = Array.tabulate(numHashes)(Dedup.mixRot)
    @transient private lazy val consts = Array.tabulate(numHashes)(Dedup.mixConst)

    override def nullSafeEval(input: Any): Any = {
      val arr = input.asInstanceOf[ArrayData]
      val n = arr.numElements()
      val out = new Array[Long](numHashes)
      var s = 0
      while (s < numHashes) {
        val r = rots(s)
        val lowMask = (1L << (60 - r)) - 1
        val c = consts(s)
        var min = Long.MaxValue
        var i = 0
        while (i < n) {
          val h = arr.getLong(i)
          val mixed = (((h & lowMask) << r) | (h >>> (60 - r))) ^ c
          if (mixed < min) min = mixed
          i += 1
        }
        out(s) = if (n == 0) 0L else min
        s += 1
      }
      new GenericArrayData(out)
    }
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }
}

/** Shared by SimhashFromHashesExpr's interpreted eval and generated code.
  * Top-level so generated Java sees a static method. */
object SimhashKernel {
  def fromHashes(hs: Array[Long], bits: Int): Long = {
    val counts = new Array[Int](bits)
    var i = 0
    while (i < hs.length) {
      val h = hs(i)
      var k = 0
      while (k < bits) {
        counts(k) += ((h >>> k) & 1L).toInt
        k += 1
      }
      i += 1
    }
    var sig = 0L
    var k = 0
    while (k < bits) {
      if (2L * counts(k) > hs.length) sig |= (1L << k)
      k += 1
    }
    sig
  }
}

/** Shared by SortedIntersectCountExpr's interpreted eval and generated
  * code — one merge. Top-level so generated Java sees a static method. */
object SortedIntersect {
  def count(x: Array[Long], y: Array[Long]): Long = {
    var i = 0; var j = 0; var n = 0L
    while (i < x.length && j < y.length) {
      if (x(i) == y(j)) { n += 1; i += 1; j += 1 }
      else if (x(i) < y(j)) i += 1
      else j += 1
    }
    n
  }
}
