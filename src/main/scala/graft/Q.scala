package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One registered engine query: a Spark implementation plus (when the
  * semantics are SQL-expressible) an equivalent DuckDB oracle SQL used by
  * the driver's correctness gate. Column names/types must match exactly
  * between `fn`'s output and the oracle result (driver sorts columns by
  * name and hash-compares values).
  */
final case class Q(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String] = None)

trait QModule { def all: Seq[Q] }

/** Loaders for the driver-provided parquet tables (TESTDATA.md). */
object Tables {
  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") events(spark, dir)
    else spark.read.parquet(s"$dir/$name.parquet")

  /** The events table stores TIMESTAMP(NANOS) which Spark's parquet reader
    * rejects by default; read nanos as long, expose both an exact `ts_ns`
    * (for total ordering) and a micros `ts` TimestampType (for date math).
    * Requires `spark.sql.legacy.parquet.nanosAsLong=true`, set once at
    * session build ([[GraftSession.build]]) — not here as a read side
    * effect (VERDICT r1, wrong #5).
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    spark.read
      .parquet(s"$dir/events.parquet")
      .withColumn("ts_ns", col("ts"))
      .withColumn("ts", timestamp_micros((col("ts_ns") / 1000L).cast("long")))
  }
}
