package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{CosineSimilarity, DotProduct, SubvectorL2Sq}

/** Library entry point for Spark's extension mechanism — the Spark-native
  * analog of the reference's jar-level integration (a user adds the engine
  * to an existing runtime without code changes; reference surface:
  * docs/contents/introduction/commandline.md app-submission flow).
  *
  * {{{
  * spark-submit --conf spark.sql.extensions=graft.plans.GraftExtensions ...
  * // then, with no imports:
  * SELECT graft_cosine(a.embedding, b.embedding) FROM ...
  * }}}
  *
  * Injects the native functions permanently into the session catalog
  * (every new session of the builder), unlike
  * [[graft.functions.VectorFunctions.ensureRegistered]] which patches one
  * live session. Both routes register the identical Expression, so plans
  * and results cannot differ.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  /** The injected inventory, exposed so specs can drive the exact builders
    * Spark will call (SparkSessionExtensions' own accessors are private[sql]). */
  val functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("graft_cosine"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "graft_cosine"),
      (exprs: Seq[Expression]) => CosineSimilarity(exprs(0), exprs(1))),
    (FunctionIdentifier("graft_l2sq"),
      new ExpressionInfo(classOf[SubvectorL2Sq].getName, "graft_l2sq"),
      (exprs: Seq[Expression]) =>
        SubvectorL2Sq(exprs(0), exprs(1), exprs(2), exprs(3))),
    (FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      (exprs: Seq[Expression]) => DotProduct(exprs(0), exprs(1))))

  override def apply(ext: SparkSessionExtensions): Unit = {
    functions.foreach(ext.injectFunction)
    // optimizer rules: proximity theta-joins become binned equi-joins
    ext.injectOptimizerRule(_ => ProximityJoin)
  }
}
