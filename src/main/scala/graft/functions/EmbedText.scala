package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression wrapping the deterministic feature-hash
  * embedder ([[Embeddings.embed]]) — replaces the registered `udf()` that was
  * the one UDF in the hot construction pipeline (SURVEY §2.11 specifies a
  * typed per-partition function; an expression composes better: it stays a
  * column inside the chunk projection, needs no encoder round-trip, and the
  * surrounding projection stays in whole-stage codegen with a single opaque
  * call instead of a UDF boundary).
  */
case class EmbedText(child: Expression, dim: Int) extends UnaryExpression {

  require(dim > 0, s"dim must be positive, got $dim")

  override def nullIntolerant: Boolean = true
  override def dataType: DataType = ArrayType(FloatType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"embed_text expects string input, got $t")
  }

  def compute(s: UTF8String): ArrayData = {
    val floats = Embeddings.embed(s.toString, dim)
    new GenericArrayData(floats.map(f => f: Any))
  }

  override def nullSafeEval(a: Any): Any = compute(a.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("embedText", this, classOf[EmbedText].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.compute($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object EmbedText {
  def embedText(text: Column, dim: Int): Column =
    GraftBridge.column(EmbedText(GraftBridge.expression(text), dim))
}
