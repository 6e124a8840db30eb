package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Salted join: result-equivalent to the plain join, and the skewed key's
  * rows actually spread across the salt domain. */
class SaltingSpec extends SparkSpec {
  import spark.implicits._

  test("salted join equals plain join on a skewed dataset") {
    // 10k rows of one hot key + a long tail
    val large = spark.range(0, 10000).select(
      when(col("id") < 9000, lit(1L)).otherwise(col("id") % 50 + 2).as("k"),
      col("id").as("payload"))
    val small = Seq((1L, "hot"), (2L, "a"), (3L, "b"), (10L, "c")).toDF("k", "v")

    val plain = large.join(small, Seq("k")).groupBy("k", "v")
      .agg(count(lit(1)).as("n"), sum("payload").as("s"))
      .orderBy("k").collect().toSeq
    val salted = Salting.saltedEquiJoin(large, small, "k", salts = 8)
      .groupBy("k", "v")
      .agg(count(lit(1)).as("n"), sum("payload").as("s"))
      .orderBy("k").collect().toSeq
    assert(salted == plain)
  }

  test("hot key spreads across multiple salt values") {
    val large = spark.range(0, 5000).select(lit(1L).as("k"), col("id").as("payload"))
    val saltCol = pmod(xxhash64(col("k"), col("payload")), lit(8))
    val n = large.withColumn("salt", saltCol).select("salt").distinct().count()
    assert(n == 8, s"expected hot key across 8 salts, got $n")
  }

  test("left join preserves unmatched large-side rows") {
    val large = spark.range(0, 100).select((col("id") % 5).as("k"), col("id").as("payload"))
    val small = Seq((0L, "x")).toDF("k", "v")
    val out = Salting.saltedEquiJoin(large, small, "k", 4, "left")
    assert(out.count() == 100)
    assert(out.where(col("v").isNull).count() == 80)
  }
}
