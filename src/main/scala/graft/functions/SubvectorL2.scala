package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, QuaternaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType}

/** Native Catalyst expression for squared L2 distance over a float-vector
  * SUBRANGE — the inner loop of product quantization and IVF residual
  * scoring, where each distance touches one subspace of the vector
  * (`graft_l2sq(a, b, offset, length)`).
  *
  * Same design rules as [[CosineSimilarity]]: a codegen'd tight loop over
  * ArrayData, accumulation element-ascending in double, bit-identical to
  * the `aggregate(transform(sequence(...)))` fold it replaces (pinned by
  * VectorFunctionsSpec), so the same DuckDB oracles verify both.
  */
case class SubvectorL2Sq(first: Expression, second: Expression,
    third: Expression, fourth: Expression) extends QuaternaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult = {
    def vec(dt: DataType) = dt match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    if (vec(first.dataType) && vec(second.dataType) &&
      third.dataType == IntegerType && fourth.dataType == IntegerType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_l2sq expects (array<float>, array<float>, int, int), got " +
        children.map(_.dataType.simpleString).mkString("(", ", ", ")"))
  }

  override def nullSafeEval(a: Any, b: Any, off: Any, len: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val lo = off.asInstanceOf[Int]
    val hi = math.min(lo + len.asInstanceOf[Int],
      math.min(x.numElements(), y.numElements()))
    var acc = 0.0
    var i = lo
    while (i < hi) {
      val d = x.getFloat(i).toDouble - y.getFloat(i).toDouble
      acc += d * d
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b, off, len) => {
      val hi = ctx.freshName("hi")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val d = ctx.freshName("d")
      s"""
        int $hi = Math.min($off + $len, Math.min($a.numElements(), $b.numElements()));
        double $acc = 0.0;
        for (int $i = $off; $i < $hi; $i++) {
          double $d = (double) $a.getFloat($i) - (double) $b.getFloat($i);
          $acc += $d * $d;
        }
        ${ev.value} = $acc;
      """
    })

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression, q: Expression): Expression =
    copy(first = f, second = s, third = t, fourth = q)
}
