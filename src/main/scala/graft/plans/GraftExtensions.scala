package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Divide, Expression, ExpressionInfo, Multiply, Sqrt}

/** SparkSessionExtensions entry point: registers graft's native
  * expressions with the SQL function registry, so `spark.sql` users get
  * them too (`SELECT graft_dot(a.embedding, b.embedding) ...`).
  *
  * Installed by `graft.Session` via `.withExtensions`; third-party apps
  * can use `--conf spark.sql.extensions=graft.plans.GraftExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 2, "graft_dot(arrayA, arrayB) takes two arguments")
        DotProduct(exprs.head, exprs(1))
      }))
    e.injectFunction((
      FunctionIdentifier("graft_simhash60"),
      new ExpressionInfo(classOf[SimHash60].getName, "graft_simhash60"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 1,
          "graft_simhash60(array<string>) takes one argument")
        SimHash60(exprs.head)
      }))
    // cosine as a pure composition over the native dot — all three dot
    // products run codegen'd; no separate expression to maintain
    e.injectFunction((
      FunctionIdentifier("graft_cosine"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_cosine"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 2, "graft_cosine(arrayA, arrayB) takes two arguments")
        val (a, b) = (exprs.head, exprs(1))
        Divide(DotProduct(a, b),
          Multiply(Sqrt(DotProduct(a, a)), Sqrt(DotProduct(b, b))))
      }))
  }
}
