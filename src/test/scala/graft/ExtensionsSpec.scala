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

  test("GraftExtensions injects the ann_search table function; it expands to the engine's search plan") {
    val ext = new SparkSessionExtensions
    new GraftExtensions().apply(ext)
    val treg = new org.apache.spark.sql.catalyst.analysis.SimpleTableFunctionRegistry
    GraftInternal.registerTableFunctions(ext, treg)
    assert(treg.functionExists(FunctionIdentifier("ann_search")), "ann_search not injected")
    assert(treg.functionExists(FunctionIdentifier("cosine_topk")), "cosine_topk not injected")
    // the builder resolves SparkSession.active — set for this thread as
    // any real SQL analysis thread would have it
    org.apache.spark.sql.SparkSession.setActiveSession(
      spark.asInstanceOf[org.apache.spark.sql.SparkSession])
    // expand with literal args against the fixture and run the produced
    // plan end to end
    val plan = treg.lookupFunction(
      FunctionIdentifier("ann_search"),
      Seq(Literal(org.apache.spark.unsafe.types.UTF8String.fromString(sf0001)),
        Literal(20), Literal(10), Literal(4)))
    val rows = GraftInternal.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.SparkSession], plan).count()
    assert(rows == 200L, s"ann_search TVF plan returned $rows rows, expected 20 queries x 10")
    // the exact-search companion expands to the planned CosineTopK
    // operator — its candidate node must appear in the expanded plan
    val ctPlan = treg.lookupFunction(
      FunctionIdentifier("cosine_topk"),
      Seq(Literal(org.apache.spark.unsafe.types.UTF8String.fromString(sf0001)),
        Literal(20), Literal(10)))
    assert(ctPlan.collectFirst { case c: graft.plans.CosineCandidates => c }.isDefined,
      "cosine_topk TVF did not expand to the CosineCandidates plan node")
    val ctRows = GraftInternal.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.SparkSession], ctPlan).count()
    assert(ctRows == 200L, s"cosine_topk TVF plan returned $ctRows rows")
    // non-literal args must be rejected loudly
    intercept[IllegalArgumentException] {
      treg.lookupFunction(
        FunctionIdentifier("ann_search"),
        Seq(org.apache.spark.sql.catalyst.expressions.AttributeReference(
          "dir", org.apache.spark.sql.types.StringType)(),
          Literal(20), Literal(10), Literal(4)))
    }
    // the radius companion: injected, expands, and accepts a DECIMAL tau
    // (SQL `0.3` parses as Decimal, not Double — regression pin)
    assert(treg.functionExists(FunctionIdentifier("range_search")), "range_search not injected")
    val rsPlan = treg.lookupFunction(
      FunctionIdentifier("range_search"),
      Seq(Literal(org.apache.spark.unsafe.types.UTF8String.fromString(sf0001)),
        Literal(10), Literal(org.apache.spark.sql.types.Decimal(0.3),
          org.apache.spark.sql.types.DecimalType(2, 1))))
    val rsRows = GraftInternal.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.SparkSession], rsPlan).count()
    assert(rsRows > 0L, "range_search TVF plan returned no rows on the fixture")
    // the extension path must inject the SAME table-function set as
    // Functions.register (graph_search was missing from it until r12)
    assert(treg.functionExists(FunctionIdentifier("graph_search")), "graph_search not injected")
    assert(treg.functionExists(FunctionIdentifier("parent_search")), "parent_search not injected")
    assert(treg.functionExists(FunctionIdentifier("ivfpq_search")), "ivfpq_search not injected")
    val pqPlan = treg.lookupFunction(
      FunctionIdentifier("ivfpq_search"),
      Seq(Literal(org.apache.spark.unsafe.types.UTF8String.fromString(sf0001)),
        Literal(10), Literal(10), Literal(4)))
    val pqRows = GraftInternal.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.SparkSession], pqPlan).count()
    assert(pqRows == 100L, s"ivfpq_search TVF plan returned $pqRows rows, expected 10 x 10")
    // the last two tiers to gain a TVF surface (VERDICT r12 next #7):
    // binary and IVF+SQ8, through the SAME injection path
    assert(treg.functionExists(FunctionIdentifier("binary_search")), "binary_search not injected")
    val binPlan = treg.lookupFunction(
      FunctionIdentifier("binary_search"),
      Seq(Literal(org.apache.spark.unsafe.types.UTF8String.fromString(sf0001)),
        Literal(10), Literal(10), Literal(50)))
    val binRows = GraftInternal.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.SparkSession], binPlan).count()
    assert(binRows == 100L, s"binary_search TVF plan returned $binRows rows, expected 10 x 10")
    assert(treg.functionExists(FunctionIdentifier("ivfsq_search")), "ivfsq_search not injected")
    val sqPlan = treg.lookupFunction(
      FunctionIdentifier("ivfsq_search"),
      Seq(Literal(org.apache.spark.unsafe.types.UTF8String.fromString(sf0001)),
        Literal(10), Literal(10), Literal(4)))
    val sqRows = GraftInternal.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.SparkSession], sqPlan).count()
    assert(sqRows == 100L, s"ivfsq_search TVF plan returned $sqRows rows, expected 10 x 10")
  }
}
