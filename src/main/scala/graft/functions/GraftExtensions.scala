package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions entry point: makes graft's native functions
  * available in ANY session started with
  * `--conf spark.sql.extensions=graft.functions.GraftExtensions`
  * (the idiomatic library hook — no code call needed, works for pure-SQL
  * users and thrift/connect servers).
  *
  * [[VectorExpressions.register]] remains for programmatic per-session
  * registration.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  import VectorExpressions._

  private def info(name: String, usage: String) =
    new ExpressionInfo("graft.functions.VectorExpressions", null, name, usage, "")

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((FunctionIdentifier("vec_dot"),
      info("vec_dot", "vec_dot(a, b) - dot product of two float arrays"),
      (es: Seq[Expression]) => { arity("vec_dot", 2, es); VecDot(es(0), es(1)) }))
    ext.injectFunction((FunctionIdentifier("vec_norm"),
      info("vec_norm", "vec_norm(a) - L2 norm of a float array"),
      (es: Seq[Expression]) => { arity("vec_norm", 1, es); VecNorm(es.head) }))
    ext.injectFunction((FunctionIdentifier("vec_cosine"),
      info("vec_cosine", "vec_cosine(a, b) - cosine similarity of two float arrays"),
      (es: Seq[Expression]) => { arity("vec_cosine", 2, es); VecCosine(es(0), es(1)) }))
    ext.injectFunction((FunctionIdentifier("vec_agree"),
      info("vec_agree", "vec_agree(a, b) - count of equal slots in two bigint arrays"),
      (es: Seq[Expression]) => { arity("vec_agree", 2, es); VecAgree(es(0), es(1)) }))
    ext.injectOptimizerRule(_ => DictDecodeFilterRewrite)
  }
}
