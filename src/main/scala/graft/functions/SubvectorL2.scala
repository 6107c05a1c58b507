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
    // Clamp both ends: a negative offset would otherwise index ArrayData
    // below zero, which on UnsafeArrayData is an unchecked out-of-bounds
    // read (silent garbage), and the function is reachable from arbitrary
    // user SQL once registered.
    // hi clamps in LONG space on both ends before narrowing: o+len can
    // underflow below Int.MinValue (off=Int.MinValue, len<0), where a bare
    // .toInt would wrap to a large positive and re-open the OOB read.
    val o = off.asInstanceOf[Int]
    val lo = math.max(0, o)
    val hi = math.max(0L, math.min(o.toLong + len.asInstanceOf[Int],
      math.min(x.numElements(), y.numElements()).toLong)).toInt
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
      val lo = ctx.freshName("lo")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val d = ctx.freshName("d")
      s"""
        int $lo = Math.max(0, $off);
        int $hi = (int) Math.max(0L, Math.min((long) $off + (long) $len,
          (long) Math.min($a.numElements(), $b.numElements())));
        double $acc = 0.0;
        for (int $i = $lo; $i < $hi; $i++) {
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
