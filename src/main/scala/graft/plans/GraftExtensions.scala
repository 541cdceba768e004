package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** SparkSessionExtensions entry point: registers the engine's custom
  * Catalyst expressions on every session — the spark-submit path
  * (`--conf spark.sql.extensions=graft.plans.GraftExtensions`) and the
  * builder path (`SparkSession.builder.withExtensions(new GraftExtensions)`)
  * both work; `CosineSim.register(spark)` remains the per-session form.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      new FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSim].getName, "cosine_sim"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        CosineSim(exprs.head, exprs(1))))
    e.injectFunction((
      new FunctionIdentifier("gorilla_explode"),
      new ExpressionInfo(classOf[GorillaExplode].getName, "gorilla_explode"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        GorillaExplode(exprs.head)))
  }
}
