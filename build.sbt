ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "insidevectordbspark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
run / fork := true
// Pass forked-run stdout through unprefixed so the Bench/Verify JSON line
// stays machine-parseable (sbt's default logger wraps it in "[info] ").
run / outputStrategy := Some(StdoutOutput)
// Spark 4.x on JDK 17 needs these when SparkSession is created outside
// spark-submit (which normally injects them). Matches
// org.apache.spark.launcher.JavaModuleOptions.defaultModuleOptions().
val jdk17AddOpens = Seq(
  "java.base/java.lang", "java.base/java.lang.invoke",
  "java.base/java.lang.reflect", "java.base/java.io",
  "java.base/java.net", "java.base/java.nio",
  "java.base/java.util", "java.base/java.util.concurrent",
  "java.base/java.util.concurrent.atomic",
  "java.base/sun.nio.ch", "java.base/sun.nio.cs",
  "java.base/sun.security.action", "java.base/sun.util.calendar",
).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
)
// Heap is scoped per task kind (ADVICE r8: a blanket 12g pushed small
// machines toward swap for toy-scale test runs):
//  - run/runMain (Bench, Verify, tools): 24g — the 1M-scale kernel bench
//    caches four structures at once (float blocks, indexed blocks, SQ8 +
//    PQ partition indexes ≈ 4.1 GB; at 8g the storage pool evicted the
//    MEMORY_ONLY pq index and the timed passes silently re-encoded the
//    corpus — measured: 3.3 → 71.6 ms/query). The 2M scale-slope section
//    doubles the float structures (~7.8 GB cached): at 12g an executor
//    task OOMed the whole JVM (which no try/catch survives), and at 16g
//    the working set out-sized the storage pool — the disk tier turned
//    every probed-method slope superlinear (sq build 0.5 → 18.6 s).
//    24g keeps the 2M set resident. The r10 4M rung (~15.6 GB cached)
//    exposed the UPPER bound too: a 40g heap crosses the ~32g
//    compressed-oops cliff and the scan kernels lose ~35% throughput
//    (measured 1M bf 15 → 20 ms/query; 4M slope 1.36 vs 1.05 on the
//    same code) — so the bench heap is 31g, the largest coops-intact
//    size, and Bench raises spark.memory.fraction to 0.75 instead
//    (GraftSession.build's sizing note) so the 4M working set plus
//    build-time execution fits the unified pool without eviction.
//    Bench skips the 2M section below 14g and the 4M section below 28g
//    with inline notes (SPARK_DRIVER_MEM=8g keeps small machines
//    usable).
//  - tests: fixture-scale data, 8g is ample.
run / javaOptions += s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "31g")}"
// opt-in madvise-THP for the heap (SPARK_GRAFT_THP=1): the host exposes
// THP in madvise mode only, so without this flag the 31g heap sits on
// 4 KB pages and the multi-GB block scans pay TLB misses that GROW as
// the heap ages (measured: 4M bf 40 ms/query in a fresh JVM -> 66 after
// one 1M section -> 150 after the full bench, all fully memory-resident)
run / javaOptions ++=
  (if (sys.env.get("SPARK_GRAFT_THP").contains("1"))
    Seq("-XX:+UseTransparentHugePages") else Seq.empty)
Test / javaOptions += s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}"
