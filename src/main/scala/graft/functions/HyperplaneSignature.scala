package graft.functions

import graft.util.Determinism
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.types._

/** Native Catalyst expression: the full nBits-bit random-hyperplane LSH
  * signature of a float/double array in ONE pass over the vector.
  *
  * bit i = sign(dot(v, h_i)) with h_i a deterministic pseudo-random ±1
  * hyperplane derived from splitmix64(i, j) parity. Replaces the round-1
  * builtin composition that built nBits separate `aggregate(zip_with(...))`
  * expression trees — 32 boxed higher-order passes per row, duplicated again
  * per band projection, which made the LSH "scale path" 120× slower than the
  * brute-force baseline it exists to beat (q_ann_lsh 64.8 s vs q_ann_brute
  * 0.53 s at sf0.1). Here the ±1 table is materialized once per (nBits, dim)
  * per executor and the kernel is a primitive multiply-add loop.
  *
  * The reference delegates this work to its vector index
  * (ref:scripts/create_vector_index.py:66-116 cosine semantics); this is the
  * index-free, shuffle-join-friendly equivalent.
  */
case class HyperplaneSignature(child: Expression, nBits: Int)
    extends UnaryExpression {

  require(nBits >= 1 && nBits <= 64, s"nBits must be in [1,64], got $nBits")

  override def nullIntolerant: Boolean = true
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"hyperplane_sig expects array<float|double> input, got $t")
  }

  private lazy val isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  // ±1 hyperplane table in [j][i] layout (sequential inner-loop access),
  // rebuilt only when the vector dimension changes (constant in practice).
  @transient private var signs: Array[Double] = _
  @transient private var cachedDim: Int = -1

  private def table(dim: Int): Array[Double] = {
    if (signs == null || cachedDim != dim) {
      signs = Array.tabulate(dim * nBits) { k =>
        val j = k / nBits
        val i = k % nBits
        if ((Determinism.mix(i.toLong, j.toLong) & 1L) == 0L) 1.0 else -1.0
      }
      cachedDim = dim
    }
    signs
  }

  /** The kernel — shared by interpreted eval and codegen. */
  def compute(a: ArrayData): Long = {
    val n = a.numElements()
    val s = table(n)
    val acc = new Array[Double](nBits)
    var j = 0
    while (j < n) {
      val v = if (isFloat) a.getFloat(j).toDouble else a.getDouble(j)
      val base = j * nBits
      var i = 0
      while (i < nBits) { acc(i) += v * s(base + i); i += 1 }
      j += 1
    }
    var sig = 0L
    var i = 0
    while (i < nBits) { if (acc(i) >= 0) sig |= (1L << i); i += 1 }
    sig
  }

  override def nullSafeEval(a: Any): Any = compute(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("hpsig", this, classOf[HyperplaneSignature].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.compute($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object HyperplaneSignature {

  /** Column-level API. */
  def signature(emb: Column, nBits: Int): Column =
    GraftBridge.column(HyperplaneSignature(GraftBridge.expression(emb), nBits))
}
