package graft

/** Pins the per-pass stage-telemetry window (VERDICT r15 next #3): the
  * graph-slope adjudication reads these numbers to separate "same work,
  * ran slower" from "the work grew" — so the window must actually
  * capture its own stages (async listener bus drained before the
  * snapshot) and must not capture a neighboring window's.
  */
class BenchTelemetrySpec extends SparkSpec {

  test("measure() captures the window's stages, shuffle bytes, and executor time") {
    val sc = spark.sparkContext
    val (result, json) = BenchTelemetry.measure(sc) {
      spark.range(200000L).selectExpr("id % 97 AS k", "id AS v")
        .groupBy("k").count().collect().length
    }
    assert(result == 97)
    val node = new com.fasterxml.jackson.databind.ObjectMapper().readTree(json)
    assert(node.get("stages").asInt >= 2, json) // map + reduce at minimum
    assert(node.get("tasks").asInt > 0)
    // a groupBy over 200k rows shuffles real bytes; MB rounding can
    // floor small exchanges to 0, so assert on run time instead — it is
    // the field the adjudication's stall-vs-work split actually reads
    assert(node.get("executor_run_ms").asLong > 0, json)
    assert(node.get("executor_cpu_ms").asLong >= 0)
    assert(node.get("gc_ms").asLong >= 0)
  }

  test("windows are isolated: a second measure() does not inherit the first's stages") {
    val sc = spark.sparkContext
    val (_, first) = BenchTelemetry.measure(sc) {
      spark.range(100000L).selectExpr("id % 13 AS k").groupBy("k").count().collect()
    }
    val (_, second) = BenchTelemetry.measure(sc) {
      // no Spark work at all
      42
    }
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    assert(mapper.readTree(first).get("stages").asInt > 0)
    assert(mapper.readTree(second).get("stages").asInt == 0,
      s"empty window captured foreign stages: $second")
  }
}
