package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Semantic anchor for the q83 anti-entropy checksum: identical content
  * gives identical digests regardless of physical layout, and a single
  * changed row flips exactly its own bucket — the property that makes
  * bucket-diff-then-rescan work on a 100 TB replica pair.
  */
class ChecksumSpec extends SparkSpec {
  import spark.implicits._

  private def frame(rows: Seq[(Long, Long, String, java.sql.Date)]) =
    rows.toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_orderdate")

  private def sums(df: org.apache.spark.sql.DataFrame) =
    ExtendedQueries.tableChecksum(df, col("o_orderkey"), buckets = 8)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap

  private val d0 = java.sql.Date.valueOf("2024-01-05")
  private lazy val base = (0L until 200L).map(i =>
    (i, i % 17, if (i % 3 == 0) "O" else "F", d0))

  test("checksums are layout-independent: repartition/shuffle changes nothing") {
    val a = sums(frame(base))
    val b = sums(frame(scala.util.Random.shuffle(base)).repartition(13))
    assert(a == b)
    assert(a.keySet == (0L until 8L).toSet)
    assert(a.values.map(_._1).sum == 200L)
  }

  test("a single changed row flips exactly its own bucket, both sum and xor") {
    val a = sums(frame(base))
    val mutated = base.updated(42, base(42).copy(_2 = 9999L))
    val b = sums(frame(mutated))
    val diff = (0L until 8L).filter(k => a(k) != b(k))
    assert(diff == Seq(42L % 8), s"only bucket ${42 % 8} may differ: $diff")
    val k = 42L % 8
    assert(a(k)._1 == b(k)._1, "row count unchanged")
    assert(a(k)._2 != b(k)._2 && a(k)._3 != b(k)._3,
      "both digests must catch the mutation")
  }

  test("digest arithmetic matches a hand computation") {
    // one row, bucket 0: digest = first 40 bits of md5('1|2|O|2024-01-05')
    val df = frame(Seq((8L, 2L, "O", d0)))
    val out = sums(df)(0L)
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest("8|2|O|2024-01-05".getBytes("UTF-8"))
    val hex = md.map("%02x".format(_)).mkString.substring(0, 10)
    val want = java.lang.Long.parseLong(hex, 16)
    assert(out == ((1L, want, want)))
  }

  test("sum capacity: 2^23 worst-case digests cannot wrap int64") {
    // design bound cited in the operator doc: 40-bit max * 2^23 < 2^63
    assert(BigInt(0xFFFFFFFFFFL) * BigInt(1L << 23) < BigInt(Long.MaxValue))
  }

  test("real orders table: buckets partition the row count") {
    val orders = graft.Tables.orders(spark, sf001).select(
      col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
      col("o_orderdate"))
    val out = sums(orders)
    assert(out.values.map(_._1).sum == orders.count())
  }
}
