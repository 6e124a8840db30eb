package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** THE deterministic row-hash for reproducible sampling/splitting (q56,
  * q62): multiplicative hashing in pure int64 arithmetic — no engine
  * RNG, no xxhash dialect — so assignments are portable across engines
  * and oracle-exact. One definition per dialect; the Spark Column and the
  * oracle SQL string are generated from the same constants, so the two
  * sides (and every consumer) cannot drift independently.
  *
  * TWO CRT LIMBS, not one: each limb reduces the id mod a (distinct)
  * prime BEFORE its multiply so no product can overflow int64 at any id
  * (an unreduced id > ~3.5e9 would wrap negative in Spark and error in
  * DuckDB) — but a single reduction would cap the hash at `prime`
  * distinct values, making ids that differ by exactly the prime collide
  * in every assignment (review r4: at 1e9+ docs whole residue classes
  * would move as one unit). XORing two limbs with coprime moduli makes
  * the input resolution their product, prime1*prime2 ~ 1e12 ids — 2.5x
  * past the ~4e11 rows of a 100 TB corpus (a third limb would extend to
  * ~1e18 if exabyte id spaces ever demand it).
  *
  * Different consumers pass different SALTS (added before the
  * reductions): q62's split stream (salt 0) and q56's sample stream
  * (salt 7919) must be independent — a shared stream would make sample
  * membership a function of split assignment.
  */
object DeterministicHash {
  val prime1: Long = 1000003L
  val prime2: Long = 999983L          // distinct prime, coprime to prime1
  val multiplier1: Long = 2654435761L // Knuth's 2^32 * golden ratio
  val multiplier2: Long = 2246822519L // xxhash32 prime2 — odd, well-mixed
  val modulus: Long = 4294967296L     // 2^32

  /** h(id) in [0, 2^32): the Spark side. */
  def knuth32(id: Column, salt: Long): Column = {
    val a = (((id + lit(salt)) % lit(prime1)) * lit(multiplier1)) % lit(modulus)
    val b = (((id + lit(salt)) % lit(prime2)) * lit(multiplier2)) % lit(modulus)
    a.bitwiseXOR(b)
  }

  /** The identical computation as oracle SQL over an id expression. */
  def knuth32Sql(expr: String, salt: Long): String =
    s"xor(((($expr + $salt) % $prime1) * $multiplier1) % $modulus, " +
      s"((($expr + $salt) % $prime2) * $multiplier2) % $modulus)"

  /** Reference implementation for tests (same arithmetic, plain Scala). */
  def knuth32Local(id: Long, salt: Long): Long =
    ((((id + salt) % prime1) * multiplier1) % modulus) ^
      ((((id + salt) % prime2) * multiplier2) % modulus)

  /** Salt for q62's train/val/test split stream (and q138's
    * cluster-canonical split, which must reproduce q62's assignment on
    * singleton docs by construction). Named so the uniqueness guard in
    * allSalts checks the value the call sites actually use — a literal
    * 0L at the use sites could drift from a stale guard entry. */
  val splitSalt: Long = 0L

  /** Salt for q56's sample stream (q62's split stream uses splitSalt). */
  val sampleSalt: Long = 7919L

  /** Salt for q71's domain-mixture stream — a third independent stream,
    * so mixture membership is uncorrelated with both split assignment
    * (salt 0) and stratified-sample membership (salt 7919). */
  val mixtureSalt: Long = 104729L

  /** Salt for q212's conformal train/calibration/test stream — a fourth
    * independent stream: conformal validity rests on the calibration
    * split being exchangeable with test, which a stream correlated with
    * any other sampling decision would silently break. */
  val conformalSalt: Long = 15485863L

  /** Salt for q123's weighted-sample stream — independent of the other
    * three for the same reason. */
  val weightedSalt: Long = 1299709L

  /** Salt for q215/q216's permutation-test streams: the B re-labelings
    * hash (user_id * (B + 1) + b), so every permutation is a fresh
    * stream, and the salt keeps the whole family independent of every
    * sampling/split stream above (a permutation correlated with the
    * observed assignment would bias the null distribution). Consumers
    * follow the q56/q62/q212 RANGE rule: arm = (h % 1000) < 500 —
    * never a low-bit extraction. */
  val permSalt: Long = 32452843L

  /** Salt for q225's Poisson-bootstrap replicate stream: replicate b
    * hashes (user_id * (B + 1) + b) like the q215 permutation family,
    * but under its own salt so resample weights are independent of the
    * permutation re-labelings (a shared stream would make every
    * bootstrap replicate a deterministic function of a permutation
    * draw and bias the CI). Consumers map the hash to a Poisson(1)
    * weight through FIXED integer CDF thresholds on h % 1000000 —
    * pure integer compares, the libm rule. */
  val bootSalt: Long = 86028121L

  /** Salt + per-worker multipliers for q228's rendezvous-sharding
    * stream: worker w's score for a doc hashes doc_id *
    * shardMultipliers(w). The multiplier must enter MULTIPLICATIVELY —
    * an additive slot (doc_id * 16 + w) gives every worker a constant
    * per-limb offset from worker 0 (the limb is affine in its input),
    * and the argmax election inherits that structure: measured on the
    * ~sf1 corpus, additive slots skewed the 9-worker assignment
    * 8.6-13.6% per worker (18 sigma); distinct prime multipliers are
    * residue-field permutations per worker and land every cell within
    * noise of 1/9. Products stay under int64 up to ~9e13 doc ids. */
  val shardSalt: Long = 104395301L
  val shardMultipliers: Seq[Long] = Seq(100003L, 100019L, 100043L,
    100057L, 100069L, 100103L, 100109L, 100129L, 100151L, 100153L,
    100169L, 100183L, 100189L, 100193L, 100207L, 100213L)

  /** Salts for q227's negative sampler: the doc-side RING stream
    * (position r = knuth32(doc_id, negRingSalt); pool = r % B) and the
    * probe-side stream (p = knuth32(anchor * (K+1) + slot,
    * negProbeSalt)) must be independent — a shared stream would place
    * every anchor's probe exactly on its own ring position and bias
    * election toward hash-adjacent documents. */
  val negRingSalt: Long = 122949823L
  val negProbeSalt: Long = 256203161L

  /** Salt for q136/q218's k-fold stream — a genuinely independent
    * stream, so fold membership is uncorrelated with split/sample/
    * mixture/weighted/conformal membership. (Until round 11 this
    * constant DUPLICATED conformalSalt — harmless only because the two
    * streams hash disjoint id domains (event_id vs vec_id/o_custkey);
    * a future consumer hashing the same ids with both salts would have
    * collided silently, so the constant is now distinct by value, not
    * by luck.) */
  val foldSalt: Long = 198491317L

  /** Salt for q233's training-shuffle ORDER stream (the order whose
    * run structure the Wald-Wolfowitz audit measures). Independent of
    * every sampling/split stream above: if the shuffle order shared a
    * stream with, say, the q62 split, the audited order would be
    * correlated with split membership and the runs z-score would
    * measure the split, not the shuffle. */
  val shuffleSalt: Long = 49979687L

  /** Salts for q247's two discrete-Laplace geometric draws (noise =
    * G1 - G2 with G = LEADING zeros of the hash word within the
    * 32-bit window — trailing zeros are the parity-degenerate
    * counter-example DpReleaseSpec pins). The TWO draws
    * must be independent of each other — equal salts would make the
    * noise identically zero — and of every stream above (a shared
    * stream would correlate the released noise with split/sample
    * membership, a real privacy leak, not a cosmetic one). Distinct
    * primes, distinct by value from all constants in this file. */
  val dpSaltA: Long = 479001599L
  val dpSaltB: Long = 275604541L

  /** Salt for q249's per-sample pass/fail stream. Independent of every
    * stream above: pass@k is an unbiased estimator only if sample
    * outcomes are exchangeable within a task, so sharing a stream with
    * any split/sample/shuffle assignment would correlate "correct"
    * with pipeline membership and bias the estimate the query audits.
    * Distinct prime, distinct by value from all constants here. (Until
    * round 13 this constant DUPLICATED conformalSalt — the same
    * duplication class foldSalt's comment records fixing in round 11.
    * Harmless only because the two streams hash disjoint id domains;
    * now distinct by value AND guarded by the uniqueness test in
    * DeterministicHashSpec, so the class can't recur silently.) */
  val passSalt: Long = 17624813L

  /** Every salt/multiplier constant in this object, for the uniqueness
    * guard: any two equal constants would silently correlate the two
    * streams they separate the moment a consumer hashes shared ids. */
  val allSalts: Seq[(String, Long)] = Seq(
    "splitSalt" -> splitSalt, "sampleSalt" -> sampleSalt,
    "mixtureSalt" -> mixtureSalt, "conformalSalt" -> conformalSalt,
    "weightedSalt" -> weightedSalt, "permSalt" -> permSalt,
    "bootSalt" -> bootSalt, "shardSalt" -> shardSalt,
    "negRingSalt" -> negRingSalt, "negProbeSalt" -> negProbeSalt,
    "foldSalt" -> foldSalt, "shuffleSalt" -> shuffleSalt,
    "dpSaltA" -> dpSaltA, "dpSaltB" -> dpSaltB,
    "passSalt" -> passSalt) ++
    shardMultipliers.zipWithIndex.map { case (m, i) => s"shardMult$i" -> m }
}
