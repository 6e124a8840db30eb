package graft

import org.scalatest.funsuite.AnyFunSuite

/** The driver's t1 smoke may call SparkEntry.entry with a session WE did
  * not configure (Spark 4 defaults: ANSI on, no nanosAsLong). entry()
  * must work there regardless — this pins that contract.
  */
class RawSessionSmokeSpec extends AnyFunSuite {

  test("entry() runs under an ANSI-on session without our configs") {
    val s = SparkSpec.session.newSession()
    s.conf.set("spark.sql.ansi.enabled", "true")
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "false")
    try {
      val n = SparkEntry.entry(s).count()
      assert(n > 0)
    } finally {
      s.conf.set("spark.sql.ansi.enabled", "false")
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    }
  }
}
