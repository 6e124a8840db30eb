package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** THE deterministic row-hash for reproducible sampling/splitting (q56,
  * q62): Knuth multiplicative hash in pure int64 arithmetic — no engine
  * RNG, no xxhash dialect — so assignments are portable across engines
  * and oracle-exact. One definition per dialect; the Spark Column and the
  * oracle SQL string are generated from the same constants, so the two
  * sides (and every consumer) cannot drift independently.
  *
  * The id is reduced mod a prime BEFORE the multiply so the product
  * (< 1e6 * 2.7e9 ~ 2.7e15) can never overflow int64 at any corpus size —
  * an unreduced id > ~3.5e9 would wrap negative in Spark and error in
  * DuckDB. Different consumers pass different SALTS (added before the
  * prime reduction): q62's split stream (salt 0) and q56's sample stream
  * (salt 7919) must be independent — a shared stream would make sample
  * membership a function of split assignment.
  */
object DeterministicHash {
  val prime: Long = 1000003L
  val multiplier: Long = 2654435761L // Knuth's 2^32 * golden ratio
  val modulus: Long = 4294967296L    // 2^32

  /** h(id) in [0, 2^32): the Spark side. */
  def knuth32(id: Column, salt: Long): Column =
    (((id + lit(salt)) % lit(prime)) * lit(multiplier)) % lit(modulus)

  /** The identical computation as oracle SQL over an id expression. */
  def knuth32Sql(expr: String, salt: Long): String =
    s"((($expr + $salt) % $prime) * $multiplier) % $modulus"

  /** Salt for q56's sample stream (q62's split stream uses 0). */
  val sampleSalt: Long = 7919L
}
