package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.types.{DataType, DoubleType, LongType}

/** Native Catalyst expression for the similarity-search hot path.
  *
  * `aggregate(zip_with(a, b, _*_), 0d, _+_)` is correct but runs as an
  * interpreted higher-order function per row — at 2M candidate pairs ×
  * 64 dims that dominates the ANN scan. This expression compiles the
  * dot product into whole-stage codegen as a tight loop.
  *
  * Accumulation is a strict left-to-right double sum — bit-identical
  * to both the HOF fold it replaces and DuckDB's `list_reduce`, so
  * oracle hash-parity is preserved.
  */
case class ArrayDotProduct(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "array_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArrayDotProduct =
    copy(left = newLeft, right = newRight)
}

/** Squared L2 distance between two ARRAY<BIGINT> columns (the
  * fixed-point-quantized vectors the k-means family compares):
  * Σ (aᵢ−bᵢ)² as a codegen'd tight loop. Replaces the interpreted
  * `aggregate(zip_with(q, c, (a,b) => (a−b)²), 0L, _+_)` fold, which
  * allocates an intermediate ArrayData per row per centroid — with k
  * centroids × 64 dims that allocation dominated the assignment scan.
  * Integer arithmetic: exact, order-free, oracle-identical. */
case class QuantSquaredL2(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "quant_l2sq"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0L
    var i = 0
    while (i < n) {
      val d = x.getLong(i) - y.getLong(i)
      acc += d * d
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val d = ctx.freshName("d")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $acc = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  long $d = $a.getLong($i) - $b.getLong($i);
         |  $acc += $d * $d;
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): QuantSquaredL2 =
    copy(left = newLeft, right = newRight)
}

object VectorExpressions {
  /** Column form: dot product of two ARRAY<DOUBLE> columns. */
  def arrayDot(a: Column, b: Column): Column =
    GraftSqlBridge.column(ArrayDotProduct(
      GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))

  /** Column form: squared L2 distance of two ARRAY<BIGINT> columns. */
  def quantL2Sq(a: Column, b: Column): Column =
    GraftSqlBridge.column(QuantSquaredL2(
      GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))
}
