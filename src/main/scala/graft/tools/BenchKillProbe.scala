package graft.tools

import java.nio.file.Paths

/** Spec-only subprocess that exercises the REAL kill path of
  * [[graft.BenchEmitter]] (VERDICT r14 next #1's done-criterion: "kill
  * a run mid-section, assert the on-disk JSON parses and
  * self-describes"): installs the same shutdown hook [[graft.Bench]]
  * installs, completes one section, prints a sync line, then blocks —
  * BenchSpec sends it SIGTERM mid-second-section and asserts the
  * artifact file parses with the completed section's data plus
  * `{"killed":true}` stamps, and that the hook printed the JSON line
  * to stdout (the driver's bounded-tail parse channel). No Spark — the
  * emitter is the unit under test; Bench wires the identical object.
  */
object BenchKillProbe {
  def main(args: Array[String]): Unit = {
    require(args.length == 1, "usage: BenchKillProbe <out.json>")
    val emitter = new graft.BenchEmitter(
      Paths.get(args(0)),
      Seq(
        "metric" -> "\"probe\"",
        "killed" -> "false",
        "section_one" -> "null",
        "section_two" -> "null",
        "errors" -> "{}"),
      Set("section_one", "section_two"))
    emitter.installShutdownHook()
    emitter.set("section_one", """{"value":1.0}""")
    // the per-section delivery channel (VERDICT r15 next #1): the
    // trailer is printed after EVERY completed section, exactly as
    // Bench does, so a kill that silences the shutdown hook (SIGKILL,
    // or a captured-tail race) still leaves the newest trailer in
    // stdout carrying every completed section's headline
    emitter.setCompact("s1_ms", "1.0")
    emitter.emitTrailer()
    println("SECTION_ONE_DONE")
    System.out.flush()
    Thread.sleep(600000) // killed mid-"section_two" by the spec
  }
}
