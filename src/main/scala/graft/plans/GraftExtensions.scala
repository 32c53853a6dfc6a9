package graft.plans

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** `SparkSessionExtensions` hook registering graft's native expressions as
  * SQL functions, so `spark.sql("SELECT graft_dot(a, b) ...")` works for SQL
  * users and the expressions participate in Catalyst exactly like builtins.
  *
  * Use via `SparkSession.builder().withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.plans.GraftExtensions`; `GraftExtensions
  * .register(spark)` installs the same functions on a live session.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  import GraftExtensions._

  override def apply(e: SparkSessionExtensions): Unit =
    functions.foreach { case (name, info, builder) =>
      e.injectFunction((FunctionIdentifier(name), info, builder))
    }
}

object GraftExtensions {
  private def info(name: String, usage: String) =
    new ExpressionInfo("graft", null, name, usage, "")

  private def arity(name: String, n: Int)(b: Seq[Expression] => Expression)
      : Seq[Expression] => Expression = es => {
    // a proper analysis error, not an IndexOutOfBoundsException mid-analysis
    if (es.length != n) throw new org.apache.spark.sql.AnalysisException(
      errorClass = "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
      messageParameters = Map("functionName" -> name, "expectedNum" -> n.toString,
        "actualNum" -> es.length.toString, "docroot" -> ""))
    b(es)
  }

  val functions: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    ("graft_dot", info("graft_dot", "graft_dot(a, b) - dot product of two double arrays"),
      arity("graft_dot", 2)(es => DotProduct(es(0), es(1)))),
    ("graft_l2norm", info("graft_l2norm", "graft_l2norm(a) - L2 norm of a double array"),
      arity("graft_l2norm", 1)(es => L2Norm(es(0))))
  )

  /** Register on an existing session (tests, REPL). */
  def register(spark: SparkSession): Unit =
    functions.foreach { case (name, i, builder) =>
      spark.sessionState.functionRegistry.registerFunction(
        FunctionIdentifier(name), i, builder)
    }
}
