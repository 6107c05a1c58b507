package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expression for cosine similarity over float vectors —
  * the hot inner loop of ANN/near-dup at 100 TB. A codegen'd tight loop
  * over ArrayData (no per-element lambda dispatch, no boxing), ~the fastest
  * shape Spark can execute short of vectorized columnar UDFs.
  *
  * Accumulation order is element-ascending in double, exactly matching the
  * declarative `aggregate(transform(...))` fold it replaces and the DuckDB
  * oracle's `list_sum(list_transform(...))` — results are bit-identical, so
  * the same oracles verify both implementations (pinned by VectorFunctionsSpec).
  *
  * The reference has no vector surface at all; this is north-star scope
  * (SURVEY §7.2-8), done at preference level (b) "custom Expression" per
  * the build rules.
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_cosine expects (array<float>, array<float>), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val xi = x.getFloat(i).toDouble
      val yi = y.getFloat(i).toDouble
      dot += xi * yi; na += xi * xi; nb += yi * yi
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      s"""
        int $n = Math.min($a.numElements(), $b.numElements());
        double $dot = 0.0, $na = 0.0, $nb = 0.0;
        for (int $i = 0; $i < $n; $i++) {
          double $xi = (double) $a.getFloat($i);
          double $yi = (double) $b.getFloat($i);
          $dot += $xi * $yi; $na += $xi * $xi; $nb += $yi * $yi;
        }
        ${ev.value} = $dot / (Math.sqrt($na) * Math.sqrt($nb));
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object VectorFunctions {
  /** Register `graft_cosine` + `graft_l2sq` for SQL/expr use (idempotent).
    * Skips names already present: createOrReplaceTempFunction logs a
    * "replaced a temporary function" WARN on every re-registration, which
    * spammed each bench/test session 6+ times. */
  def ensureRegistered(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    def registerIfAbsent(name: String, builder: Seq[Expression] => Expression): Unit = {
      val id = org.apache.spark.sql.catalyst.FunctionIdentifier(name)
      if (!reg.functionExists(id))
        reg.createOrReplaceTempFunction(name, builder, "built-in")
    }
    registerIfAbsent("graft_cosine", exprs => CosineSimilarity(exprs(0), exprs(1)))
    registerIfAbsent("graft_l2sq",
      exprs => SubvectorL2Sq(exprs(0), exprs(1), exprs(2), exprs(3)))
    registerIfAbsent("graft_dot", exprs => DotProduct(exprs(0), exprs(1)))
  }
}
