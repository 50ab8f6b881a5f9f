package graft.tools

import graft.{GraftSession, SparkEntry}

/** Dumps one registry query's result (and its oracle SQL, if any) for a
  * targeted single-query oracle check at an arbitrary SF — the surgical
  * companion to tools/check.py's full sweep. Usage:
  * `SPARK_GRAFT_SF_DIR=… runMain graft.tools.DumpQuery <name> <outDir>`. */
object DumpQuery {
  def main(args: Array[String]): Unit = {
    val Array(name, outDir) = args.take(2)
    val spark = GraftSession.build(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    SparkEntry.queries(name)(spark, sfDir)
      .write.mode("overwrite").parquet(s"$outDir/$name")
    SparkEntry.oracleSql.get(name).foreach { sql =>
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$outDir/${name}_oracle.sql"), sql)
    }
    println(s"DUMPED $name -> $outDir")
    spark.stop()
  }
}
