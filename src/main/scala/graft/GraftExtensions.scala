package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.graftnative.DotI64

/** Library entry point for SQL users: registers graft's native Catalyst
  * expressions with the session's FunctionRegistry, so
  * `spark.sql("SELECT dot_i64(a, b) ...")` works the same as the
  * Column-API `graftnative.functions.dot_i64`.
  *
  * Wire it with `.config("spark.sql.extensions", "graft.GraftExtensions")`
  * at session build time (the standard third-party extension mechanism —
  * works on any cluster without code changes to the application).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("dot_i64"),
      new ExpressionInfo(
        classOf[DotI64].getName,
        null,
        "dot_i64",
        "dot_i64(a, b) - integer dot product of two array<bigint> columns",
        ""),
      (args: Seq[Expression]) => {
        require(args.length == 2,
          s"dot_i64 expects 2 arguments, got ${args.length}")
        DotI64(args(0), args(1))
      }))
  }
}
