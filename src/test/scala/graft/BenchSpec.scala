package graft

import java.nio.file.{Files, Path}

import org.scalatest.funsuite.AnyFunSuite

/** Pins the bench artifact's DELIVERY contract (VERDICT r14 wrong #1:
  * the engine was 147/147 green and the round still failed because the
  * artifact itself — written only after ALL sections — died with the
  * driver's wall-clock kill). Three layers:
  *
  *  - [[BenchEmitter]] unit: every set() leaves a parseable, complete
  *    artifact on disk; pending sections self-describe;
  *  - the kill path in-JVM: onKill stamps `{"killed":true}` and the
  *    artifact still parses;
  *  - the kill path FOR REAL: a subprocess running the same emitter +
  *    shutdown hook ([[tools.BenchKillProbe]]) is SIGTERM'd
  *    mid-section and must leave a parseable on-disk artifact AND
  *    print the JSON line to stdout (the driver's bounded-tail parse
  *    channel).
  */
class BenchSpec extends AnyFunSuite {

  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  private def parse(s: String): com.fasterxml.jackson.databind.JsonNode =
    mapper.readTree(s)

  private def tmpJson(): Path = {
    val f = Files.createTempFile("graft_bench_spec", ".json")
    Files.delete(f)
    f
  }

  private def emitter(out: Path): BenchEmitter =
    new BenchEmitter(out,
      Seq("metric" -> "\"total\"", "value" -> "-1.000", "killed" -> "false",
        "s1" -> "null", "s2" -> "null", "errors" -> "{}"),
      Set("s1", "s2"))

  test("incremental write: every set() leaves a complete parseable artifact on disk") {
    val out = tmpJson()
    val em = emitter(out)
    // sections start pending, not null — a consumer of a mid-run file
    // can tell "not reached" from "returned null"
    em.set("metric", "\"total\"")
    val afterFirst = parse(Files.readString(out))
    assert(afterFirst.get("s1").get("pending").asBoolean, afterFirst.toString)
    assert(afterFirst.get("s2").get("pending").asBoolean)
    assert(!afterFirst.get("killed").asBoolean)
    em.set("s1", """{"ms":12.5}""")
    val afterS1 = parse(Files.readString(out))
    assert(afterS1.get("s1").get("ms").asDouble == 12.5)
    assert(afterS1.get("s2").get("pending").asBoolean)
    // field order is construction order (the artifact shape is stable
    // across partial states)
    val keys = {
      val it = afterS1.fieldNames()
      val b = Seq.newBuilder[String]
      while (it.hasNext) b += it.next()
      b.result()
    }
    assert(keys == Seq("metric", "value", "killed", "s1", "s2", "errors"), keys)
    Files.deleteIfExists(out)
  }

  test("kill path: onKill stamps pending sections killed:true, keeps completed data, parses") {
    val out = tmpJson()
    val em = emitter(out)
    em.set("s1", """{"ms":3.0}""")
    em.onKill() // what the SIGTERM shutdown hook runs
    val j = parse(Files.readString(out))
    assert(j.get("killed").asBoolean, j.toString)
    assert(j.get("s1").get("ms").asDouble == 3.0, "completed section lost by the kill stamp")
    assert(j.get("s2").get("killed").asBoolean, "pending section not stamped killed")
    // line() returns the same artifact the file holds
    assert(parse(em.line()) == j)
    Files.deleteIfExists(out)
  }

  test("finish() silences the kill hook; onKill after finish never overstamps") {
    val out = tmpJson()
    val em = emitter(out)
    em.set("s1", """{"ms":1.0}""")
    em.set("s2", """{"ms":2.0}""")
    val line = em.finish()
    em.onKill() // the hook still fires on normal exit — must be a no-op
    val j = parse(Files.readString(out))
    assert(!j.get("killed").asBoolean, "finished artifact stamped killed by the exit hook")
    assert(parse(line) == j)
    Files.deleteIfExists(out)
  }

  test("compact trailer: mirrors top-level scalars, carries headlines, fits the driver tail") {
    // BENCH_r4..r14 all have parsed:null even on rc 0 — the driver
    // parses the LAST line of a ~2000-char stdout tail and the full
    // artifact line outgrew it rounds ago. The trailer is the line that
    // actually parses.
    val out = tmpJson()
    val em = emitter(out)
    em.set("value", "12.345")
    em.setCompact("bf_ms", "18.783")
    em.setCompact("ivf_r", "0.9995")
    val t = parse(em.compactLine())
    assert(t.get("metric").asText == "total")
    assert(t.get("value").asDouble == 12.345)
    assert(!t.get("killed").asBoolean)
    assert(t.get("bf_ms").asDouble == 18.783)
    assert(t.get("detail").asText == "bench_result.json")
    assert(em.compactLine().length <= 1900)
    // overgrowth is loud, never a silently unparseable tail
    (1 to 200).foreach(i => em.setCompact(s"pad_$i", "1.234567"))
    intercept[IllegalArgumentException](em.compactLine())
    Files.deleteIfExists(out)
  }

  test("emitTrailer: prints a parseable line even when the compact trailer overflows") {
    // ADVICE r15 (medium): the success path called compactLine() bare —
    // an overgrown trailer would throw AFTER finished=true had silenced
    // the hook, so a fully successful run printed NO JSON. emitTrailer
    // must degrade to a minimal parseable line, never throw.
    val out = tmpJson()
    val em = emitter(out)
    em.set("s1", """{"ms":1.0}""")
    (1 to 200).foreach(i => em.setCompact(s"pad_$i", "1.234567"))
    intercept[IllegalArgumentException](em.compactLine()) // still loud in tests
    val buf = new java.io.ByteArrayOutputStream()
    Console.withOut(buf)(em.emitTrailer())
    val printed = buf.toString("UTF-8").trim
    val j = parse(printed)
    assert(j.get("trailer_overflow").asBoolean, printed)
    assert(j.get("detail").asText == "bench_result.json")
    assert(printed.length <= 1900)
    Files.deleteIfExists(out)
  }

  test("final trailer covers every section's headline after a full run and fits the tail") {
    // VERDICT r15 next #6: with per-section prints the trailer is
    // emitted ~7×; each must fit the driver tail and the LAST one must
    // carry every section's headline keys.
    val out = tmpJson()
    val sections = Seq("queries", "kernel_1m_384", "kernel_cold_scan",
      "graph_build_slope", "kernel_2m_384", "kernel_4m_384")
    val em = new BenchEmitter(out,
      Seq("metric" -> "\"total\"", "value" -> "-1.000", "unit" -> "\"sec\"",
        "killed" -> "false", "bench_seq_today" -> "1", "host_factor" -> "1.250") ++
        sections.map(_ -> "null") :+ ("errors" -> "{}"),
      sections.toSet)
    // realistic per-section headline loads (k1m is the widest: ~16 keys)
    val headlines = Map(
      "queries" -> Seq("reg_can_r", "reg_can_sh_r", "reg_can_end_sh_r"),
      "kernel_1m_384" -> Seq("k1m_bf_ms", "k1m_ivf_ms", "k1m_ivf_r", "k1m_sq_ms",
        "k1m_sq_r", "k1m_pq_ms", "k1m_pq_r", "k1m_bin_ms", "k1m_g_ms",
        "k1m_g_build_s", "k1m_ivf_build_s", "k1m_pq_build_s", "k1m_can_r",
        "k1m_can_sh_r", "k1m_can_end_sh_r"),
      "kernel_cold_scan" -> Seq("cold_float_ms", "cold_sq8_ms", "cold_pq_ms",
        "cold_bin_ms", "cold_can_end_sh_r"),
      "graph_build_slope" -> Seq("slope_loglog", "slope_can_sh_r", "slope_can_end_sh_r"),
      "kernel_2m_384" -> Seq("m2_bf_ms", "m2_ivf_ms", "m2_pq_ms"),
      "kernel_4m_384" -> Seq("m4_bf_ms", "m4_ivf_ms", "m4_pq_ms"))
    val trailers = sections.map { s =>
      em.set(s, """{"ok":true}""")
      headlines(s).foreach(k => em.setCompact(k, "123.456"))
      val t = em.compactLine()
      assert(t.length <= 1900, s"trailer after $s: ${t.length} chars")
      t
    }
    em.setCompact("n_err", "0")
    em.finish()
    val last = parse(em.compactLine())
    headlines.values.flatten.foreach(k =>
      assert(last.has(k), s"final trailer missing headline $k"))
    assert(last.get("host_factor").asDouble == 1.25)
    // every intermediate trailer parsed too
    trailers.foreach(parse)
    Files.deleteIfExists(out)
  }

  test("SIGKILL mid-section: no hooks run, yet the tail's last line is a parseable trailer") {
    // the per-section print channel (VERDICT r15 next #1): r15 proved
    // the SIGTERM hook's trailer can miss the driver's captured tail —
    // SIGKILL is the limit case where NO exit path runs at all. The
    // trailer printed after the last COMPLETED section must already be
    // the final stdout line, carrying that section's headline.
    val out = tmpJson()
    val stdoutFile = Files.createTempFile("graft_bench_spec_stdout9", ".log")
    val javaBin = java.nio.file.Paths.get(
      System.getProperty("java.home"), "bin", "java").toString
    val cmd = java.util.Arrays.asList(javaBin, "-cp",
      System.getProperty("java.class.path"),
      "graft.tools.BenchKillProbe", out.toString)
    val pb = new ProcessBuilder(cmd)
    pb.redirectOutput(stdoutFile.toFile)
    pb.redirectError(ProcessBuilder.Redirect.DISCARD)
    val p = pb.start()
    try {
      val deadline = System.nanoTime() + 60L * 1000000000L
      while (!Files.readString(stdoutFile).contains("SECTION_ONE_DONE")) {
        assert(p.isAlive, "probe exited before section one")
        assert(System.nanoTime() < deadline, "probe never completed section one")
        Thread.sleep(50)
      }
      p.destroyForcibly() // SIGKILL — no shutdown hooks
      assert(p.waitFor(60, java.util.concurrent.TimeUnit.SECONDS))
      val jsonLines = Files.readString(stdoutFile).linesIterator.toSeq
        .filter(_.startsWith("{"))
      assert(jsonLines.nonEmpty, "no trailer reached stdout before SIGKILL")
      val trailer = parse(jsonLines.last)
      assert(trailer.get("s1_ms").asDouble == 1.0,
        "per-section trailer does not carry the completed section's headline")
      assert(trailer.get("detail").asText == "bench_result.json")
      assert(!trailer.get("killed").asBoolean, "no hook ran — killed must still read false")
      // the incrementally-written on-disk artifact survived the SIGKILL
      val onDisk = parse(Files.readString(out))
      assert(onDisk.get("section_one").get("value").asDouble == 1.0)
      assert(onDisk.get("section_two").get("pending").asBoolean)
    } finally {
      p.destroyForcibly()
      Files.deleteIfExists(stdoutFile)
      Files.deleteIfExists(out)
      ()
    }
  }

  test("unknown field and undeclared section are loud") {
    val out = tmpJson()
    val em = emitter(out)
    intercept[IllegalArgumentException](em.set("nope", "1"))
    intercept[IllegalArgumentException](
      new BenchEmitter(out, Seq("killed" -> "false"), Set("ghost")))
    Files.deleteIfExists(out)
  }

  test("SIGTERM mid-section: the on-disk artifact parses and the line reaches stdout") {
    // the r14 failure mode, reproduced for real: a subprocess running
    // the SAME emitter + shutdown hook Bench installs is killed between
    // sections; rc != 0 must no longer mean parsed: null
    val out = tmpJson()
    // stdout goes to a FILE, not a pipe: Process.destroy() closes the
    // parent's pipe ends, which would lose exactly the shutdown-hook
    // line this test exists to assert on
    val stdoutFile = Files.createTempFile("graft_bench_spec_stdout", ".log")
    val javaBin = java.nio.file.Paths.get(
      System.getProperty("java.home"), "bin", "java").toString
    val cmd = java.util.Arrays.asList(javaBin, "-cp",
      System.getProperty("java.class.path"),
      "graft.tools.BenchKillProbe", out.toString)
    val pb = new ProcessBuilder(cmd)
    pb.redirectOutput(stdoutFile.toFile)
    pb.redirectError(ProcessBuilder.Redirect.DISCARD)
    val p = pb.start()
    try {
      // wait for section one to complete (the probe prints a sync line)
      val deadline = System.nanoTime() + 60L * 1000000000L
      while (!Files.readString(stdoutFile).contains("SECTION_ONE_DONE")) {
        assert(p.isAlive, "probe exited before section one")
        assert(System.nanoTime() < deadline, "probe never completed section one")
        Thread.sleep(50)
      }
      p.destroy() // SIGTERM — the driver's `timeout` sends exactly this
      assert(p.waitFor(60, java.util.concurrent.TimeUnit.SECONDS), "probe ignored SIGTERM")
      // the shutdown hook printed the artifact line AND the compact
      // trailer to stdout — the trailer LAST, because the driver parses
      // a ~2000-char stdout tail whose final line must be a whole JSON
      // object (the full line outgrew that tail rounds ago)
      val rest = Files.readString(stdoutFile).linesIterator.toSeq
      val jsonLines = rest.filter(_.startsWith("{"))
      assert(jsonLines.length >= 2, s"expected full line + compact trailer; got: $rest")
      val trailer = parse(jsonLines.last)
      assert(trailer.get("killed").asBoolean)
      assert(jsonLines.last.length <= 1900,
        s"compact trailer too long for the driver tail: ${jsonLines.last.length}")
      val printed = parse(jsonLines(jsonLines.length - 2))
      assert(printed.get("killed").asBoolean)
      // the on-disk artifact parses and self-describes
      val onDisk = parse(Files.readString(out))
      assert(onDisk.get("section_one").get("value").asDouble == 1.0,
        "completed section lost")
      assert(onDisk.get("section_two").get("killed").asBoolean,
        "mid-flight section not stamped")
      assert(onDisk.get("killed").asBoolean)
      assert(printed == onDisk, "stdout line and on-disk artifact diverge")
    } finally {
      p.destroyForcibly()
      Files.deleteIfExists(stdoutFile)
      Files.deleteIfExists(out)
      ()
    }
  }
}
