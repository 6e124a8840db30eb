package graft.operators

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.functions._

/** q229 semantic anchor: the closed-form waterfill equals an
  * independent level-search derivation on the real corpus, the
  * max-min invariants hold, and — because the real corpus is too
  * balanced to saturate anything — a skewed synthetic frame exercises
  * the saturation branch and the remainder distribution. */
class WaterfillSpec extends SparkSpec {
  import spark.implicits._

  /** Independent derivation: search the water level L such that
    * sum(min(avail, L)) <= T < sum(min(avail, L+1)), then give the
    * leftover +1s to the unsaturated domains in (avail, source) order. */
  private def brute(avail: Seq[(String, Long)]): Map[String, Long] = {
    val t = avail.map(_._2).sum / 2
    def filled(l: Long) = avail.map { case (_, a) => math.min(a, l) }.sum
    // level candidates: exact division points bounded by max avail
    val lo = Iterator.iterate(0L)(_ + 1)
      .take(1 << 20) // corpus levels are small; guard anyway
      .find(l => filled(l) <= t && t < filled(l + 1))
    val l = lo.getOrElse(sys.error("no level found"))
    var rem = t - filled(l)
    val sorted = avail.sortBy { case (s, a) => (a, s) }
    sorted.map { case (s, a) =>
      if (a <= l) s -> a
      else {
        val extra = if (rem > 0) { rem -= 1; 1L } else 0L
        s -> (l + extra)
      }
    }.toMap
  }

  test("q229: real-corpus rows equal the level-search derivation; invariants hold") {
    val rows = SparkEntry.queries("q229_token_waterfill")(spark, sf0001)
      .collect()
    val avail = rows.map(r =>
      (r.getAs[String]("source"), r.getAs[Long]("avail_tokens"))).toSeq
    val expect = brute(avail)
    val t = avail.map(_._2).sum / 2
    assert(rows.map(_.getAs[Long]("alloc_tokens")).sum == t, "sum != T")
    rows.foreach { r =>
      val s = r.getAs[String]("source")
      assert(r.getAs[Long]("alloc_tokens") == expect(s), s"alloc($s)")
      assert(r.getAs[Long]("alloc_tokens") <= r.getAs[Long]("avail_tokens"))
      assert(r.getAs[Long]("budget_tokens") == t)
      assert(r.getAs[Boolean]("saturated")
        == (r.getAs[Long]("alloc_tokens") == r.getAs[Long]("avail_tokens")
          && r.getAs[Long]("avail_tokens") <= r.getAs[Long]("water_level")
          + 1L))
    }
  }

  test("q229: skewed synthetic frame exercises saturation + remainder") {
    // token counts 1, 2, 4, 10, 100: T = 58, tiny domains saturate
    val mk = Seq("a" -> 1, "b" -> 2, "c" -> 4, "d" -> 10, "e" -> 100)
    val docs = mk.map { case (s, n) => (s, Seq.fill(n)("tok").mkString(" ")) }
      .toDF("source", "text")
    val rows = TextQueries.tokenWaterfill(docs).collect()
    val got = rows.map(r => r.getAs[String]("source")
      -> r.getAs[Long]("alloc_tokens")).toMap
    val expect = brute(mk.map { case (s, n) => (s, n.toLong) })
    assert(got == expect, s"$got vs $expect")
    assert(rows.map(_.getAs[Long]("alloc_tokens")).sum == 117 / 2)
    // the small domains actually saturated, the big one is capped at level
    assert(rows.filter(_.getAs[Boolean]("saturated")).nonEmpty,
      "synthetic corpus failed to exercise saturation")
    val e = rows.find(_.getAs[String]("source") == "e").get
    assert(!e.getAs[Boolean]("saturated")
      && e.getAs[Long]("alloc_tokens") < 100L)
  }
}
