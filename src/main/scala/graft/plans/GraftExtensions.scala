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

  /** Arity-checked argument access: a wrong-arity SQL call must fail with
    * a clear message at plan time, not an IndexOutOfBoundsException from
    * the builder lambda. */
  private def arg(
      exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression],
      i: Int, fn: String, arity: Int): org.apache.spark.sql.catalyst.expressions.Expression = {
    require(exprs.length == arity,
      s"$fn expects $arity argument(s), got ${exprs.length}")
    exprs(i)
  }

  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      new FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSim].getName, "cosine_sim"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        CosineSim(arg(exprs, 0, "cosine_sim", 2), arg(exprs, 1, "cosine_sim", 2))))
    e.injectFunction((
      new FunctionIdentifier("gorilla_explode"),
      new ExpressionInfo(classOf[GorillaExplode].getName, "gorilla_explode"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        GorillaExplode(arg(exprs, 0, "gorilla_explode", 1))))
    e.injectFunction((
      new FunctionIdentifier("quant_cosine"),
      new ExpressionInfo(classOf[QuantCosine].getName, "quant_cosine"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        QuantCosine(arg(exprs, 0, "quant_cosine", 2), arg(exprs, 1, "quant_cosine", 2))))
    e.injectFunction((
      new FunctionIdentifier("char_shingle_hashes"),
      new ExpressionInfo(classOf[TextHashes.CharShingleHashes].getName, "char_shingle_hashes"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        TextHashes.CharShingleHashes(arg(exprs, 0, "char_shingle_hashes", 2),
          TextHashes.intArg(arg(exprs, 1, "char_shingle_hashes", 2), "char_shingle_hashes"))))
    e.injectFunction((
      new FunctionIdentifier("word_shingle_hashes"),
      new ExpressionInfo(classOf[TextHashes.WordShingleHashes].getName, "word_shingle_hashes"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        TextHashes.WordShingleHashes(arg(exprs, 0, "word_shingle_hashes", 2),
          TextHashes.intArg(arg(exprs, 1, "word_shingle_hashes", 2), "word_shingle_hashes"))))
    e.injectFunction((
      new FunctionIdentifier("minhash_sig"),
      new ExpressionInfo(classOf[TextHashes.MinHashSig].getName, "minhash_sig"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        TextHashes.MinHashSig(arg(exprs, 0, "minhash_sig", 2),
          TextHashes.intArg(arg(exprs, 1, "minhash_sig", 2), "minhash_sig"))))
    e.injectFunction((
      new FunctionIdentifier("simhash_text"),
      new ExpressionInfo(classOf[TextHashes.SimHashText].getName, "simhash_text"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        TextHashes.SimHashText(arg(exprs, 0, "simhash_text", 1))))
  }
}
