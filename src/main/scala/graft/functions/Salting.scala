package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for joins: salt the skewed (large) side, replicate the
  * small side across the salt domain, join on (key, salt). AQE's runtime
  * skew-join split handles sort-merge skew automatically; explicit
  * salting remains the tool when (a) AQE can't help (e.g. the skewed
  * aggregation feeding a join) or (b) the skew is known up front and the
  * replication factor should be bounded deliberately.
  *
  * The salt is derived deterministically from the large side's row
  * content (xxhash64 of all columns mod `salts`) — no rand(), so plans
  * stay reproducible and re-executable (important for task retries:
  * rand() salts can double-count rows across stage retries).
  */
object Salting {

  def saltedEquiJoin(
      large: DataFrame,
      small: DataFrame,
      key: String,
      salts: Int,
      joinType: String = "inner"): DataFrame = {
    // right/full would preserve the salts-1 unmatched replicas of every
    // small-side row as spurious null-padded output; swap the sides and
    // use left instead.
    val jt = joinType.toLowerCase.replace("_", "")
    require(!Set("right", "rightouter", "full", "fullouter", "outer").contains(jt),
      s"saltedEquiJoin: joinType '$joinType' would emit unmatched salt replicas " +
        "of the small side; swap sides and use a left join")
    val saltCol = pmod(xxhash64(large.columns.map(col): _*), lit(salts))
    val saltedLarge = large.withColumn("__graft_salt", saltCol)
    val replicated = small.withColumn(
      "__graft_salt", explode(sequence(lit(0L), lit((salts - 1).toLong))))
    saltedLarge
      .join(replicated, Seq(key, "__graft_salt"), joinType)
      .drop("__graft_salt")
  }
}
