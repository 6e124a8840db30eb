package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared test base: one lazily-created local SparkSession per suite,
  * configured identically to the Verify/Bench sessions (ANSI off, UTC,
  * AQE on) so tests exercise the same semantics the driver gate does.
  */
trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSpec.session
  def sf0001 = "/root/testdata/sf0.001"
  def sf001 = "/root/testdata/sf0.01"
}

object SparkSpec {
  // One session for the whole forked test JVM — suites share it.
  lazy val session: SparkSession = Sessions.local("graft-test", cores = 8)
}
