package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The portable sampling/splitting hash: CRT resolution (the r4 review
  * finding — one limb caps distinct assignments at `prime` ids),
  * engine-side agreement, and gate uniformity. */
class DeterministicHashSpec extends SparkSpec {
  import spark.implicits._
  import DeterministicHash._

  test("ids differing by one limb's prime do not collide (CRT resolution)") {
    // With the single-limb hash every id and id+1000003 collided by
    // construction — whole residue classes moved as one unit past 1e6
    // docs. Two coprime limbs resolve ids up to prime1*prime2 ~ 1e12.
    val collisionsP1 = (0L until 1000L).count(id =>
      knuth32Local(id, 0L) == knuth32Local(id + prime1, 0L))
    val collisionsP2 = (0L until 1000L).count(id =>
      knuth32Local(id, 0L) == knuth32Local(id + prime2, 0L))
    assert(collisionsP1 == 0, s"$collisionsP1 collisions at stride prime1")
    assert(collisionsP2 == 0, s"$collisionsP2 collisions at stride prime2")
    // and distinct values over a window wider than one prime
    val distinct = (0L until 2000000L by 97L).map(knuth32Local(_, 0L)).toSet
    assert(distinct.size > 20000, s"only ${distinct.size} distinct hashes")
  }

  test("the Spark column computes exactly the local reference") {
    val ids = spark.range(0, 5000).select(col("id"))
    val got = ids.select(col("id"), knuth32(col("id"), sampleSalt).as("h"))
      .as[(Long, Long)].collect()
    got.foreach { case (id, h) =>
      assert(h == knuth32Local(id, sampleSalt), s"id $id: $h")
    }
  }

  test("all salts and shard multipliers are pairwise distinct") {
    // Twice now a new salt silently duplicated an existing one
    // (foldSalt==conformalSalt until r11, passSalt==conformalSalt until
    // r13). Equal salts make the two streams they separate identical
    // the moment a consumer hashes shared ids — so pin distinctness by
    // value over the full constant set, not by comment.
    val dupes = allSalts.groupBy(_._2).filter(_._2.size > 1)
    assert(dupes.isEmpty,
      s"duplicate salt values: ${dupes.values.map(_.map(_._1)).mkString(", ")}")
  }

  test("hash stays in [0, 2^32) and gates are near-uniform") {
    val hs = (0L until 100000L).map(knuth32Local(_, 0L))
    assert(hs.forall(h => h >= 0 && h < modulus))
    val share = hs.count(_ % 1000 < 300).toDouble / hs.size
    assert(math.abs(share - 0.3) < 0.01, s"gate share $share")
    val share100 = hs.count(_ % 100 < 80).toDouble / hs.size
    assert(math.abs(share100 - 0.8) < 0.01, s"split share $share100")
  }
}
