package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Base for specs needing a SparkSession: one shared local session for the
  * whole forked test JVM, built exactly like production entry points
  * ([[GraftSession.build]]) so tests see identical session config. */
trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSpec.shared
  val sf0001 = "/root/testdata/sf0.001"
  val sf001 = "/root/testdata/sf0.01"
}

object SparkSpec {
  lazy val shared: SparkSession = GraftSession.build("4")
}
