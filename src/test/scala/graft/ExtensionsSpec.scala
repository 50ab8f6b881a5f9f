package graft

import org.apache.spark.sql.{GraftInternal, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.SimpleFunctionRegistry
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.util.ArrayData

/** The spark.sql.extensions entry point must inject working function
  * builders: apply [[GraftExtensions]] to a fresh extensions object,
  * materialize its registrations into an empty FunctionRegistry, and
  * build + evaluate the functions from it — no session involved, so the
  * injection (not GraftSession's imperative registration) is what is
  * observed. */
class ExtensionsSpec extends SparkSpec {

  test("GraftExtensions injects buildable vec_dot/vec_norm/collect_top_k") {
    val ext = new SparkSessionExtensions
    new GraftExtensions().apply(ext)
    val reg = new SimpleFunctionRegistry
    GraftInternal.registerFunctions(ext, reg)

    for (name <- Seq("vec_dot", "vec_norm", "collect_top_k"))
      assert(reg.functionExists(FunctionIdentifier(name)), s"$name not injected")

    val arr = (xs: Seq[Float]) =>
      Literal.create(ArrayData.toArrayData(xs.toArray),
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType, false))
    val dot = reg.lookupFunction(
      FunctionIdentifier("vec_dot"),
      Seq(arr(Seq(1.0f, 2.0f)), arr(Seq(3.0f, 4.0f))))
    assert(dot.eval(InternalRow.empty) == 11.0)

    val norm = reg.lookupFunction(FunctionIdentifier("vec_norm"), Seq(arr(Seq(3.0f, 4.0f))))
    assert(norm.eval(InternalRow.empty) == 5.0)
  }
}
