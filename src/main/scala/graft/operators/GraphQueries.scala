package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Graph operators over the purchase graph (customer <-> supplier edges
  * derived from orders x lineitem).
  *
  * PageRank here is FIXED-POINT: ranks live in integer units of 1e-12
  * (total mass S = 10^12), damping 0.85 applied as *17 DIV 20, and
  * per-edge contributions as integer division by out-degree. Two wins
  * at once:
  *   - parity: every operation is exact int64 arithmetic, so Spark and
  *     DuckDB agree bit-for-bit with no rounding rules, no ordered
  *     folds, no float summation-order caveats;
  *   - scale: per-iteration work is ONE equi-join (ranks x edges) and
  *     ONE map-side-combinable long sum per destination — the shape
  *     that survives 10^11 edges, unlike collect_list folds (giant
  *     skewed rows) or float sums (order-nondeterministic). Truncation
  *     drops < (20 + outdeg) units (< 1e-10 of mass) per node per
  *     iteration — identically on both engines, so it is a documented
  *     semantic, not an error source.
  */
object GraphQueries {

  private val S = 1000000000000L // total rank mass, 1e12 units

  // -------------------------------------------------------------------
  // Node-id codec (r15 optimization, guide §2.3 "narrower types"):
  // the purchase-graph family (q95/q144/q145/q165/q226) used to build
  // STRING node ids ('c'||custkey, 's'||suppkey) at the scan and carry
  // them through every shuffle, join and aggregate — ~16+ bytes of
  // UnsafeRow payload plus a byte-wise hash/compare per row per
  // operator, in the two most iteration-heavy plans in the catalog.
  // The ids now ride as ONE int64 whose ordering is ISOMORPHIC to the
  // byte-lexicographic order of the old strings, so min()/orderBy()/
  // tie-breaks commute with the encoding and the decoded output is
  // bit-identical; the strings are materialized only in the final
  // (node-count-sized) projection.
  //
  // Encoding: enc = [bit62: 1 if supplier] | fracEnc(key), where
  //   fracEnc(k) = k * 10^(15 - digits(k)) * 16 + digits(k)
  // i.e. the decimal digits LEFT-ALIGNED in a fixed 15-digit field
  // (compares like a string prefix scan), with the digit count as the
  // low-nibble tie-break (a shorter string that is a prefix of a
  // longer one sorts first — "1" < "10", exactly byte-lex order).
  // Proof of order isomorphism for no-leading-zero decimals a, b:
  //   - padded(a) != padded(b): the first differing aligned digit
  //     decides both comparisons identically (trailing zero-padding
  //     only extends a with digits that are <= any continuation of b
  //     exactly when the length tie-break would agree);
  //   - padded(a) == padded(b): b extends a with zeros (or vice
  //     versa), and byte-lex order puts the shorter first — as does
  //     the digit-count low nibble.
  // 'c' < 's' maps to bit 62 clear < set. Bounds: key < 10^15 (15
  // decimal digits — TPC-H keys reach ~11 digits at SF 1e5), so
  // fracEnc < 1.6e16 and enc < 2^62 + 1.6e16 < 2^63. Both engines
  // never see the encoding: DuckDB's oracle SQL still computes over
  // the strings, and the decoded Spark output matches it hash-exact
  // (proved by the driver gate + NodeCodecSpec's order-isomorphism
  // property).
  private[operators] val SuppBit = 1L << 62

  private def fracEnc(key: Column): Column = {
    val k = key.cast("long")
    val len = length(k.cast("string"))
    // 10^(15-len) as long: exact for len in [1, 15] (10^14 < 2^53)
    (k * pow(lit(10.0), (lit(15) - len).cast("double")).cast("long") * 16
      + len.cast("long"))
  }

  private[operators] def custEnc(k: Column): Column = fracEnc(k)
  private[operators] def suppEnc(k: Column): Column =
    fracEnc(k) + lit(SuppBit)

  /** Inverse of the codec: the original 'c<key>' / 's<key>' string.
    * padded = key * 10^(15-len) exactly, and both operands are < 2^53,
    * so the IEEE double division is exact (correctly rounded quotient
    * of exactly representable operands with an integer result). */
  private[operators] def decodeNode(e: Column): Column = {
    val body = e.bitwiseAND(lit(SuppBit - 1))
    val len = body.bitwiseAND(lit(15L))
    val padded = shiftright(body, 4)
    val key = (padded / pow(lit(10.0), (lit(15) - len).cast("double")))
      .cast("long")
    concat(when(e >= lit(SuppBit), lit("s")).otherwise(lit("c")),
      key.cast("string"))
  }

  /** Directed edge list of the purchase graph: c<id> <-> s<id> both
    * ways for every distinct (customer, supplier) purchase pair.
    *
    * The distinct-pair projection (the lineitem⋈orders + distinct — the
    * expensive part) is served from [[graft.plans.SharedFrames]] for the
    * single-pass family members (q144/q145): before round 9 each rebuilt
    * it from the fact tables — ReuseExchange dedups within a query,
    * never across queries — and a session-scoped persisted copy is the
    * 100 TB answer (materialize the hot derived projection once per
    * family). q95 deliberately does NOT consume the cache — see
    * [[purchaseEdgesLazy]]. The symmetric union stays lazy per-call (a
    * narrow doubling over the cached pairs, cheaper than caching the
    * doubled frame). */
  private[operators] def purchaseEdges(s: org.apache.spark.sql.SparkSession,
      d: String): DataFrame =
    symmetrize(graft.plans.SharedFrames(s, d, "purchase_pairs") {
      purchasePairs(s, d)
    })

  /** The UNCACHED edge list — q95's input. MEASURED (rounds 8 AND 9):
    * feeding the PageRank iteration loop from a persisted copy is a
    * LOSS (~9-12 s vs ~4-7 s full-catalog) — Catalyst's ReuseExchange
    * already computes the edge subtree's shuffle exactly once across
    * all iterations in the lazy plan, so the cache adds a
    * materialization job + row-format conversion for reuse the plan
    * already had. The cache exists for the NON-iterative family
    * members (q144/q145: one aggregate pass each), where build-once
    * genuinely replaces rebuild-per-query. */
  private[graft] def purchaseEdgesLazy(
      s: org.apache.spark.sql.SparkSession, d: String): DataFrame =
    symmetrize(purchasePairs(s, d))

  private def purchasePairs(s: org.apache.spark.sql.SparkSession,
      d: String): DataFrame =
    Tables.lineitem(s, d).select("l_orderkey", "l_suppkey")
      .join(Tables.orders(s, d).select("o_orderkey", "o_custkey"),
        col("l_orderkey") === col("o_orderkey"))
      .select(custEnc(col("o_custkey")).as("c"),
        suppEnc(col("l_suppkey")).as("sn"))
      .distinct()

  private def symmetrize(pairs: DataFrame): DataFrame =
    pairs.select(col("c").as("src"), col("sn").as("dst"))
      .unionByName(pairs.select(col("sn").as("src"), col("c").as("dst")))

  /** Shared basket-family projections for q102/q107/q122: the distinct
    * (order, part) membership frame and its support-thresholded
    * co-occurrence edge aggregate (minShared = 2 — all three catalog
    * entries use the same threshold, so the edge list is identical).
    * Same rationale as [[purchaseEdges]]: the per-basket self-join +
    * aggregate is the dominant cost of all three queries and was built
    * three times per catalog run. */
  private def basketOp(s: org.apache.spark.sql.SparkSession,
      d: String): DataFrame =
    graft.plans.SharedFrames(s, d, "baskets_op") {
      Tables.lineitem(s, d)
        .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
        .distinct()
    }

  private def basketCo2(s: org.apache.spark.sql.SparkSession,
      d: String): DataFrame = {
    // resolve the op frame BEFORE entering the co2 build thunk: a
    // SharedFrames lookup inside another's computeIfAbsent would be a
    // recursive update on the same map (JDK throws when the keys share
    // a hash bin)
    val op = basketOp(s, d)
    graft.plans.SharedFrames(s, d, "baskets_co2") {
      coOccurrenceEdgesFromDistinct(op, minShared = 2)
    }
  }

  /** Scale-adaptive shuffle width for the iteration joins (r14 verdict
    * item 3 / guide §2.5): derived from the edge plan's LEAF SCAN bytes
    * — file-relation sizes, the only size statistic that is reliable
    * without CBO or running a job (join-output estimates are
    * multiplicative). Returns None when the session's configured
    * shuffle parallelism already covers the input, which keeps the
    * sf0.1 bench plan unchanged; above that the iteration operators
    * hash-partition the edge frame explicitly so per-task state stays
    * bounded as the graph grows (the 64x Throughput probe measured the
    * heap saturating at ~2.3M edge rows/task under the fixed 32-wide
    * local default, resolved at 256 parts — previously an env-var
    * workaround, now the default plan shape). ~2 MiB of leaf input per
    * task ≈ 100-300k edge rows; env-overridable for cluster tuning and
    * capped at 4096 (a real cluster would raise both with its core
    * count — the point is the DATA derives the width, not a constant
    * tuned to either machine). */
  private[operators] def scalePartsFor(leafBytes: BigInt, default: Int,
      target: Long): Option[Int] = {
    val need = ((leafBytes + target - 1) / target).min(BigInt(4096)).toInt
    if (need > default) Some(need) else None
  }

  private def scaleParts(edges: DataFrame): Option[Int] =
    scalePartsFor(
      edges.queryExecution.analyzed.collectLeaves()
        .map(_.stats.sizeInBytes).sum,
      edges.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt,
      sys.env.getOrElse("SPARK_GRAFT_GRAPH_TASK_BYTES",
        (2L * 1024 * 1024).toString).toLong)

  /** Fixed-point PageRank over an arbitrary directed edge list
    * (src, dst), `iters` synchronous iterations, damping 17/20.
    * Nodes are the distinct edge endpoints (so no dangling handling is
    * needed when the edge list is symmetric, as the purchase graph is).
    * Shared by the catalog entry and PageRankSpec. */
  def pagerank(edges0: DataFrame, iters: Int): DataFrame = {
    // every downstream consumer keys on src (nodes distinct, deg
    // aggregate, the per-iteration contribution join), so one explicit
    // hash partitioning serves them all and ReuseExchange dedups it
    val edges = scaleParts(edges0)
      .map(n => edges0.repartition(n, col("src"))).getOrElse(edges0)
    // Iteration-reuse contract — MEASURED, not guessed (round 8): the edge
    // list feeds every iteration plus nodes/deg, but the LAZY plan already
    // computes its shuffle ONCE — Catalyst's ReuseExchange dedups the
    // identical edge subtree across all `iters`+2 consumers (plan-asserted
    // in PlanChecksSpec). An explicit persist(MEMORY_AND_DISK) + count +
    // eager localCheckpoint variant was benchmarked at sf0.1 and came out
    // ~75% SLOWER steady-state (8.9 s median vs 5.1 s lazy): the extra
    // materialization jobs and cache write cost more than the exchange
    // reuse they replaced. At cluster scale the same reuse applies per
    // stage; if a future exchange-breaking rewrite defeats it, the
    // PlanChecksSpec reuse assert fails loudly rather than silently
    // rescanning the fact table `iters` times.
    val nodes = edges.select(col("src").as("node")).distinct()
    val deg = edges.groupBy(col("src").as("node"))
      .agg(count(lit(1)).as("outdeg"))
    // node count as a broadcast 1-row frame: keeps the constant inside
    // the plan (no driver round trip), exact integer on both engines
    val n = broadcast(nodes.agg(count(lit(1)).as("n")))
    var ranks = nodes.crossJoin(n)
      .select(col("node"), expr(s"${S}L DIV n").as("rank_u"))
    (1 to iters).foreach { _ =>
      val contribs = ranks.join(deg, "node")
        .select(col("node").as("src"),
          expr(s"(rank_u * 17 DIV 20) DIV outdeg").as("cu"))
        .join(edges, "src")
        .groupBy(col("dst").as("node"))
        .agg(sum("cu").as("m"))
      ranks = nodes.crossJoin(n)
        .join(contribs, Seq("node"), "left")
        .select(col("node"),
          (expr(s"(${S}L * 3 DIV 20) DIV n") +
            coalesce(col("m"), lit(0L))).as("rank_u"))
    }
    ranks.orderBy("node")
  }

  val defs: Seq[(String, QueryDef)] = Seq(

    // ---------------------------------------------------------------- q95
    "q95_pagerank" -> QueryDef.sql(
      "Fixed-point PageRank (3 iterations, damping 17/20) over the " +
      "customer<->supplier purchase graph — the distributed-iteration " +
      "graph operator (cf. q65's pointer jumping): ranks are int64 " +
      "units of 1e-12 total mass, damping and out-degree division are " +
      "integer DIV, so the whole computation is exact int64 arithmetic " +
      "-> hash-exact with NO float anywhere, and each iteration is one " +
      "equi-join plus one map-side-combinable long sum per node — the " +
      "shape that survives 10^11 edges (a float PageRank's per-node " +
      "sum is summation-order-nondeterministic; an ordered-fold " +
      "workaround makes giant skewed rows; integer units need " +
      "neither). Truncation loses <1e-10 of mass per node/iteration, " +
      "identically on both engines.",
      """WITH pairs AS (SELECT DISTINCT 'c' || o_custkey AS c,
        |    's' || l_suppkey AS sn
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
        |edges AS (SELECT c AS src, sn AS dst FROM pairs
        |  UNION ALL SELECT sn, c FROM pairs),
        |nodes AS (SELECT DISTINCT src AS node FROM edges),
        |deg AS (SELECT src AS node, count(*)::BIGINT AS outdeg
        |  FROM edges GROUP BY 1),
        |const AS (SELECT count(*)::BIGINT AS n FROM nodes),
        |r0 AS (SELECT node, (1000000000000 // n)::BIGINT AS rank_u
        |  FROM nodes CROSS JOIN const),
        |r1 AS (SELECT n2.node,
        |    ((1000000000000 * 3 // 20) // c.n
        |     + coalesce(m.s, 0))::BIGINT AS rank_u
        |  FROM nodes n2 CROSS JOIN const c LEFT JOIN (
        |    SELECT e.dst AS node,
        |      sum((r.rank_u * 17 // 20) // d.outdeg)::BIGINT AS s
        |    FROM r0 r JOIN deg d ON r.node = d.node
        |      JOIN edges e ON e.src = r.node
        |    GROUP BY e.dst) m ON n2.node = m.node),
        |r2 AS (SELECT n2.node,
        |    ((1000000000000 * 3 // 20) // c.n
        |     + coalesce(m.s, 0))::BIGINT AS rank_u
        |  FROM nodes n2 CROSS JOIN const c LEFT JOIN (
        |    SELECT e.dst AS node,
        |      sum((r.rank_u * 17 // 20) // d.outdeg)::BIGINT AS s
        |    FROM r1 r JOIN deg d ON r.node = d.node
        |      JOIN edges e ON e.src = r.node
        |    GROUP BY e.dst) m ON n2.node = m.node),
        |r3 AS (SELECT n2.node,
        |    ((1000000000000 * 3 // 20) // c.n
        |     + coalesce(m.s, 0))::BIGINT AS rank_u
        |  FROM nodes n2 CROSS JOIN const c LEFT JOIN (
        |    SELECT e.dst AS node,
        |      sum((r.rank_u * 17 // 20) // d.outdeg)::BIGINT AS s
        |    FROM r2 r JOIN deg d ON r.node = d.node
        |      JOIN edges e ON e.src = r.node
        |    GROUP BY e.dst) m ON n2.node = m.node)
        |SELECT node, rank_u FROM r3 ORDER BY node""".stripMargin) { (s, d) =>
      // every iteration computes over int64 node ids; the string form
      // is restored only on the node-count-sized result (codec above)
      pagerank(purchaseEdgesLazy(s, d), iters = 3)
        .select(decodeNode(col("node")).as("node"), col("rank_u"))
        .orderBy("node")
    },

    // --------------------------------------------------------------- q102
    "q102_triangles" -> QueryDef.sql(
      "Triangle enumeration on the part co-occurrence graph (parts " +
      "appearing together in >= 2 distinct orders) — the graph-motif " +
      "operator behind clustering-coefficient / community features. " +
      "Every stage is bounded: pair generation is a PER-ORDER " +
      "self-join (pairs per order <= basket_size^2, ~80 here, never " +
      "corpus-quadratic), the co-occurrence aggregate is one hash agg " +
      "on (u,v) with the >= 2 support threshold pruning the long " +
      "tail, and triangles come from the classic ORDERED-EDGE " +
      "two-join plan (u < v everywhere, so each triangle is " +
      "enumerated exactly once as a < b < c): edges(a,b) x edges(b,c) " +
      "-> wedge, closed by an equi-join against edges(a,c). All " +
      "integer keys and counts -> hash-exact. Shape at 100 TB: both " +
      "triangle joins are equi-joins on the SUPPORT-THRESHOLDED edge " +
      "list (sparse by construction); skewed hub vertices split under " +
      "AQE, and the u < v orientation bounds each wedge list by the " +
      "smaller endpoint's degree (the standard distributed triangle " +
      "trick).",
      """WITH op AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p
        |  FROM lineitem),
        |proj AS (SELECT a.p AS u, b.p AS v, count(*)::BIGINT AS shared
        |  FROM op a JOIN op b ON a.o = b.o AND a.p < b.p
        |  GROUP BY 1, 2 HAVING count(*) >= 2)
        |SELECT e1.u AS a, e1.v AS b, e2.v AS c,
        |  e1.shared AS shared_ab, e2.shared AS shared_bc,
        |  e3.shared AS shared_ac
        |FROM proj e1 JOIN proj e2 ON e1.v = e2.u
        |  JOIN proj e3 ON e3.u = e1.u AND e3.v = e2.v
        |ORDER BY a, b, c""".stripMargin) { (s, d) =>
      triangles(basketCo2(s, d))
    },

    // --------------------------------------------------------------- q107
    "q107_item_similarity" -> QueryDef.sql(
      "Item-item collaborative-filtering similarity: top-5 most " +
      "cosine-similar parts per part over order co-occurrence " +
      "(sim(u,v) = co(u,v) / sqrt(deg(u)*deg(v)), support >= 2) — " +
      "the recommender building block. IEEE sqrt is CORRECTLY " +
      "ROUNDED, so cosine over exact integer co-occurrence and " +
      "degree counts is deterministic across engines -> hash-exact " +
      "with full (cosine DESC, v) tie-break. Shape at 100 TB: " +
      "reuses q102's bounded per-basket pair generation and " +
      "support-thresholded edge aggregate; degrees are one " +
      "dimension-sized aggregate joined onto the (sparse) edge " +
      "list; the top-k window partitions by item over edges, never " +
      "facts — swap in q97's bounded-heap Aggregator if an item's " +
      "edge list itself skews.",
      """WITH op AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p
        |  FROM lineitem),
        |deg AS (SELECT p, count(*)::BIGINT AS d FROM op GROUP BY 1),
        |co AS (SELECT a.p AS u, b.p AS v, count(*)::BIGINT AS co
        |  FROM op a JOIN op b ON a.o = b.o AND a.p < b.p
        |  GROUP BY 1, 2 HAVING count(*) >= 2),
        |sym AS (SELECT u, v, co FROM co UNION ALL SELECT v, u, co FROM co),
        |sim AS (SELECT s.u, s.v, s.co,
        |    s.co::DOUBLE / (sqrt(du.d::DOUBLE) * sqrt(dv.d::DOUBLE))
        |      AS cosine
        |  FROM sym s JOIN deg du ON s.u = du.p JOIN deg dv ON s.v = dv.p),
        |rk AS (SELECT *, row_number() OVER (PARTITION BY u
        |    ORDER BY cosine DESC, v)::BIGINT AS rn FROM sim)
        |SELECT u, rn, v, co, cosine FROM rk WHERE rn <= 5
        |ORDER BY u, rn""".stripMargin) { (s, d) =>
      itemSimilarityTopKFrom(basketOp(s, d), basketCo2(s, d), k = 5)
    },

    // --------------------------------------------------------------- q122
    "q122_association_rules" -> QueryDef.sql(
      "Market-basket association rules over order baskets: directed " +
      "rules antecedent -> consequent with support count, confidence " +
      "= co/deg(antecedent), and lift = co*N / (deg(a)*deg(c)), " +
      "thresholded at confidence >= 0.02 and lift >= 2 — the " +
      "recommender/merchandising classic, composing q102's bounded " +
      "co-occurrence projection (q107 gives the symmetric cosine " +
      "view; rules are DIRECTED and threshold-filtered). Counts are " +
      "exact integers; confidence and lift are single-shape IEEE " +
      "divisions -> hash-exact. Shape at 100 TB: everything after " +
      "the per-basket pair aggregate is edge-list-sized; the basket " +
      "total is one broadcast scalar.",
      """WITH op AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p
        |  FROM lineitem),
        |nb AS (SELECT count(DISTINCT o)::BIGINT AS n_baskets FROM op),
        |deg AS (SELECT p, count(*)::BIGINT AS d FROM op GROUP BY 1),
        |co AS (SELECT a.p AS u, b.p AS v, count(*)::BIGINT AS co
        |  FROM op a JOIN op b ON a.o = b.o AND a.p < b.p
        |  GROUP BY 1, 2 HAVING count(*) >= 2),
        |sym AS (SELECT u, v, co FROM co UNION ALL SELECT v, u, co FROM co),
        |rules AS (SELECT s.u AS antecedent, s.v AS consequent,
        |    s.co AS support_cnt, du.d AS deg_a, dv.d AS deg_c,
        |    nb.n_baskets,
        |    (s.co::DOUBLE / du.d::DOUBLE) AS confidence,
        |    ((s.co::DOUBLE * nb.n_baskets::DOUBLE)
        |      / (du.d::DOUBLE * dv.d::DOUBLE)) AS lift
        |  FROM sym s JOIN deg du ON s.u = du.p JOIN deg dv ON s.v = dv.p
        |  CROSS JOIN nb)
        |SELECT * FROM rules WHERE confidence >= 0.02 AND lift >= 2.0
        |ORDER BY antecedent, consequent""".stripMargin) { (s, d) =>
      associationRulesFrom(basketOp(s, d), basketCo2(s, d),
        minConfidence = 0.02, minLift = 2.0)
    },

    // --------------------------------------------------------------- q144
    "q144_degree_distribution" -> QueryDef.sql(
      "Degree distribution of the customer<->supplier purchase graph " +
      "in power-of-two buckets — the power-law audit run before " +
      "choosing skew strategies (a heavy right tail says: salt the hub " +
      "keys, AQE-split their partitions; a flat one says plain " +
      "hash-partitioning holds). bucket = floor(log2(degree)) done as " +
      "length(bin repr) - 1 — pure INTEGER arithmetic, no libm log " +
      "(bit_length and the binary-string length agree exactly for " +
      "positive int64). Counts are exact -> hash-exact. Shape at " +
      "100 TB: one degree aggregate + one bucket aggregate, both " +
      "map-side-combinable; output is <= 64 rows.",
      """WITH pairs AS (SELECT DISTINCT 'c' || o_custkey AS c,
        |    's' || l_suppkey AS sn
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
        |edges AS (SELECT c AS src, sn AS dst FROM pairs
        |  UNION ALL SELECT sn, c FROM pairs),
        |deg AS (SELECT src AS node, count(*)::BIGINT AS d
        |  FROM edges GROUP BY 1)
        |SELECT (length(bin(d)) - 1)::BIGINT AS log2_bucket,
        |  count(*)::BIGINT AS n_nodes,
        |  min(d)::BIGINT AS min_deg, max(d)::BIGINT AS max_deg,
        |  sum(d)::BIGINT AS sum_deg
        |FROM deg
        |GROUP BY 1
        |ORDER BY log2_bucket""".stripMargin) { (s, d) =>
      val deg = purchaseEdges(s, d)
        .groupBy(col("src").as("node")).agg(count(lit(1)).as("d"))
      // floor(log2(d)) via the binary-representation length — integer
      // exact on both engines, never a libm log2 (whose rounding at
      // exact powers of two is implementation-defined)
      deg.select((length(bin(col("d"))) - 1).cast("long").as("log2_bucket"),
          col("d"))
        .groupBy("log2_bucket")
        .agg(count(lit(1)).as("n_nodes"), min("d").as("min_deg"),
          max("d").as("max_deg"), sum("d").cast("long").as("sum_deg"))
        .orderBy("log2_bucket")
    },

    // --------------------------------------------------------------- q145
    "q145_degree_assortativity" -> QueryDef.sql(
      "Degree assortativity of the purchase graph — Pearson " +
      "correlation of endpoint degrees over the directed edge list, " +
      "the one-number answer to 'do hubs connect to hubs?' (negative " +
      "here: customers with many suppliers buy from suppliers with " +
      "many customers only incidentally — a bipartite disassortative " +
      "signature). The q77 fixed-point recipe on ALREADY-INTEGER " +
      "data: degrees are exact int64, the five correlation sums " +
      "accumulate exactly (decimal 128-bit closed form), and the " +
      "final r = num / (sqrt(d1) * sqrt(d2)) is a shared IEEE shape " +
      "-> hash-exact, no rounding. Shape at 100 TB: one degree " +
      "aggregate, two equi-joins to stamp endpoint degrees on edges " +
      "(broadcast-sized here; sort-merge at scale), one " +
      "map-side-combinable five-sum aggregate.",
      """WITH pairs AS (SELECT DISTINCT 'c' || o_custkey AS c,
        |    's' || l_suppkey AS sn
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
        |edges AS (SELECT c AS src, sn AS dst FROM pairs
        |  UNION ALL SELECT sn, c FROM pairs),
        |deg AS (SELECT src AS node, count(*)::BIGINT AS d
        |  FROM edges GROUP BY 1),
        |ed AS (SELECT du.d AS x, dv.d AS y
        |  FROM edges e JOIN deg du ON e.src = du.node
        |               JOIN deg dv ON e.dst = dv.node),
        |s AS (SELECT count(*)::HUGEINT AS n, sum(x)::HUGEINT AS sx,
        |    sum(y)::HUGEINT AS sy, sum(x*y)::HUGEINT AS sxy,
        |    sum(x*x)::HUGEINT AS sxx, sum(y*y)::HUGEINT AS syy
        |  FROM ed)
        |SELECT n::BIGINT AS n_edges,
        |  CAST(n * sxy - sx * sy AS DOUBLE)
        |    / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
        |       * sqrt(CAST(n * syy - sy * sy AS DOUBLE))) AS assortativity
        |FROM s""".stripMargin) { (s, d) =>
      val edges = purchaseEdges(s, d)
      val deg = edges.groupBy(col("src").as("node"))
        .agg(count(lit(1)).as("d"))
      val d18 = "decimal(18,0)"
      val ed = edges
        .join(deg.select(col("node").as("src"), col("d").as("x")), "src")
        .join(deg.select(col("node").as("dst"), col("d").as("y")), "dst")
      ed.agg(count(lit(1)).as("n"),
          sum("x").cast("long").as("sx"), sum("y").cast("long").as("sy"),
          sum(col("x") * col("y")).cast("long").as("sxy"),
          sum(col("x") * col("x")).cast("long").as("sxx"),
          sum(col("y") * col("y")).cast("long").as("syy"))
        .select(col("n").as("n_edges"),
          ((col("n").cast(d18) * col("sxy").cast(d18)
            - col("sx").cast(d18) * col("sy").cast(d18)).cast("double")
            / (sqrt((col("n").cast(d18) * col("sxx").cast(d18)
                - col("sx").cast(d18) * col("sx").cast(d18)).cast("double"))
               * sqrt((col("n").cast(d18) * col("syy").cast(d18)
                - col("sy").cast(d18) * col("sy").cast(d18)).cast("double"))))
            .as("assortativity"))
    },

    // --------------------------------------------------------------- q165
    "q165_label_propagation" -> QueryDef.sql(
      "Synchronous min-label propagation over the purchase graph — " +
      "3 Pregel-style supersteps of label(v) <- min(label(v), " +
      "min over neighbors) from node-id seeds, the bulk-synchronous " +
      "primitive under connected components and label-propagation " +
      "community detection (q65's pointer jumping is its path-halving " +
      "cousin on the dedup graph). DETERMINISTIC by construction: min " +
      "is commutative/idempotent, node ids compare by identical binary " +
      "collation in both engines, and the fixed round count pins the " +
      "output even on an unconverged graph -> hash-exact with no " +
      "tolerance. Output per node: seed, final label, and whether the " +
      "node changed — plus the per-round convergence is visible in the " +
      "label cardinality (asserted in SkylineTriangleSpec). Shape at " +
      "100 TB: each superstep is ONE equi-join (labels x edges) + ONE " +
      "map-side-combinable min aggregate, with the self-kept label " +
      "riding as a per-node SELF-EDGE so every round references the " +
      "previous frame exactly once — q95's linear iteration shape " +
      "(a carrying left join instead doubles the lazy plan tree per " +
      "round: measured 10.6 s vs ~4.4 s at sf0.1), reading the " +
      "session-cached purchase-pair frame the q144/q145 family " +
      "already materializes (free in a catalog run; in isolation " +
      "the cache/ReuseExchange pin still guarantees ONE edge build " +
      "across rounds); no collect, no unbounded state, rounds " +
      "compose linearly — steady-state parity with q95's 3-iteration " +
      "PageRank on the same graph.",
      """WITH pairs AS (SELECT DISTINCT 'c' || o_custkey AS c,
        |    's' || l_suppkey AS sn
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
        |edges AS (SELECT c AS src, sn AS dst FROM pairs
        |  UNION ALL SELECT sn, c FROM pairs),
        |nodes AS (SELECT DISTINCT src AS node FROM edges),
        |es AS (SELECT src, dst FROM edges
        |  UNION ALL SELECT node, node FROM nodes),
        |l0 AS (SELECT node, node AS lab FROM nodes),
        |l1 AS (SELECT e.dst AS node, min(r.lab) AS lab
        |  FROM l0 r JOIN es e ON e.src = r.node GROUP BY e.dst),
        |l2 AS (SELECT e.dst AS node, min(r.lab) AS lab
        |  FROM l1 r JOIN es e ON e.src = r.node GROUP BY e.dst),
        |l3 AS (SELECT e.dst AS node, min(r.lab) AS lab
        |  FROM l2 r JOIN es e ON e.src = r.node GROUP BY e.dst)
        |SELECT l3.node, l3.lab AS label,
        |  (l3.lab <> l3.node)::BIGINT AS changed
        |FROM l3
        |ORDER BY node""".stripMargin) { (s, d) =>
      // min(lab) over the encoded longs equals the encoded min over the
      // strings (the codec is order-isomorphic), so decoding after the
      // supersteps is exact; equality for `changed` is injective-safe
      labelPropagation(purchaseEdges(s, d), rounds = 3)
        .select(decodeNode(col("node")).as("node"),
          decodeNode(col("lab")).as("label"),
          (col("lab") =!= col("node")).cast("long").as("changed"))
        .orderBy("node")
    },

    // --------------------------------------------------------------- q177
    "q177_local_clustering" -> QueryDef.sql(
      "Local clustering coefficient profile of the part co-occurrence " +
      "graph (Watts & Strogatz 1998 — the per-node transitivity that " +
      "q102's global triangle count cannot see): per node with " +
      "degree >= 2, lcc = 2*tri(v) / (deg(v)*(deg(v)-1)) in exact " +
      "integer micro-units ((2e6*tri) DIV (deg*(deg-1)), all " +
      "non-negative operands), rolled into an 11-bucket histogram " +
      "(bucket = lcc_micro DIV 100000) with per-bucket node/degree/" +
      "triangle mass — the shape that distinguishes clustered " +
      "communities from hub-and-spoke. ALL-INTEGER -> hash-exact. " +
      "Shape at 100 TB: reuses q102's bounded stages end-to-end " +
      "(per-basket pair generation, support-thresholded edge " +
      "aggregate from the session-cached co2 frame, ordered-edge " +
      "triangle join); the per-node attribution is one explode of " +
      "the triangle list (3 rows each) + a node-keyed count, degrees " +
      "are one aggregate over the sparse edge list, and the " +
      "histogram is dimension-bounded (11 rows).",
      localClusteringSql) { (s, d) =>
      localClustering(basketCo2(s, d).select("u", "v"))
    },

    // --------------------------------------------------------------- q180
    "q180_kcore_peel" -> QueryDef.sql(
      "k-core peeling profile of the part co-occurrence graph " +
      "(Seidman 1983 — the degeneracy layering that separates the " +
      "dense recommendable core from the long tail q177's histogram " +
      "hints at): 3 synchronous peel rounds at k=3 — each round " +
      "drops every node of degree < 3 and all its edges — emitting " +
      "per round the surviving node/edge counts and degree extremes. " +
      "The fixed round count pins the output even if unconverged " +
      "(q165's determinism rule); every number is an exact integer " +
      "count -> hash-exact. Shape at 100 TB: each round is ONE " +
      "map-side-combinable degree aggregate over the (sparse, " +
      "support-thresholded, session-cached) edge list plus two " +
      "semi-join-shaped equi-joins filtering edges by surviving " +
      "endpoints — linear in edges per round, no cartesian, no " +
      "global sort; the 4 summary rows are 1-row aggregates.",
      """WITH op AS MATERIALIZED (SELECT DISTINCT l_orderkey AS o,
        |    l_partkey AS p FROM lineitem),
        |e0 AS MATERIALIZED (SELECT a.p AS u, b.p AS v
        |  FROM op a JOIN op b ON a.o = b.o AND a.p < b.p
        |  GROUP BY 1, 2 HAVING count(*) >= 2),
        |d0 AS MATERIALIZED (SELECT node, count(*)::BIGINT AS deg FROM (
        |    SELECT u AS node FROM e0 UNION ALL SELECT v FROM e0)
        |  GROUP BY node),
        |e1 AS MATERIALIZED (SELECT e.u, e.v FROM e0 e
        |  JOIN (SELECT node FROM d0 WHERE deg >= 3) a ON e.u = a.node
        |  JOIN (SELECT node FROM d0 WHERE deg >= 3) b ON e.v = b.node),
        |d1 AS MATERIALIZED (SELECT node, count(*)::BIGINT AS deg FROM (
        |    SELECT u AS node FROM e1 UNION ALL SELECT v FROM e1)
        |  GROUP BY node),
        |e2 AS MATERIALIZED (SELECT e.u, e.v FROM e1 e
        |  JOIN (SELECT node FROM d1 WHERE deg >= 3) a ON e.u = a.node
        |  JOIN (SELECT node FROM d1 WHERE deg >= 3) b ON e.v = b.node),
        |d2 AS MATERIALIZED (SELECT node, count(*)::BIGINT AS deg FROM (
        |    SELECT u AS node FROM e2 UNION ALL SELECT v FROM e2)
        |  GROUP BY node),
        |e3 AS MATERIALIZED (SELECT e.u, e.v FROM e2 e
        |  JOIN (SELECT node FROM d2 WHERE deg >= 3) a ON e.u = a.node
        |  JOIN (SELECT node FROM d2 WHERE deg >= 3) b ON e.v = b.node),
        |d3 AS MATERIALIZED (SELECT node, count(*)::BIGINT AS deg FROM (
        |    SELECT u AS node FROM e3 UNION ALL SELECT v FROM e3)
        |  GROUP BY node),
        |sn AS (SELECT 0 AS round, count(*)::BIGINT AS n_nodes,
        |    (coalesce(sum(deg), 0) // 2)::BIGINT AS n_edges,
        |    min(deg)::BIGINT AS min_deg, max(deg)::BIGINT AS max_deg
        |  FROM d0
        |  UNION ALL SELECT 1, count(*)::BIGINT,
        |    (coalesce(sum(deg), 0) // 2)::BIGINT, min(deg)::BIGINT,
        |    max(deg)::BIGINT FROM d1
        |  UNION ALL SELECT 2, count(*)::BIGINT,
        |    (coalesce(sum(deg), 0) // 2)::BIGINT, min(deg)::BIGINT,
        |    max(deg)::BIGINT FROM d2
        |  UNION ALL SELECT 3, count(*)::BIGINT,
        |    (coalesce(sum(deg), 0) // 2)::BIGINT, min(deg)::BIGINT,
        |    max(deg)::BIGINT FROM d3)
        |SELECT round::INT AS round, n_nodes, n_edges, min_deg, max_deg
        |FROM sn
        |ORDER BY round""".stripMargin) { (s, d) =>
      // resolve the co2 frame BEFORE the materialize thunks run (the
      // SharedFrames reentrancy rule); each peel round materializes
      // once and is session-shared thereafter. localCheckpoint (eager)
      // TRUNCATES THE LINEAGE, not just caches it: round r's logical
      // plan nests round r-1's twice (degree agg + filter), and
      // Catalyst's cache-plan canonicalized matching over that
      // exponentially-nested tree made PLANNING the dominant cost
      // (~3 s at sf0.1, ~24 s at sf0.001 — inverse data scaling, the
      // planner tell); with per-round LogicalRDD roots the peel plans
      // flat and runs at aggregate cost.
      val co2 = basketCo2(s, d).select("u", "v")
      // q180's `build_sec` is NOT planner overhead (round-11 audit of the
      // round-10 item-4 list): it is these checkpoint jobs MATERIALIZING
      // each peel round at construction — index-training-class real work,
      // like q47's IVF build. eager=false was tried and moves nothing:
      // under AQE, round r+1's toRdd materializes round r's stages at
      // construction anyway. Per-superstep materialization is the honest
      // distributed shape (a Pregel engine does exactly this); the cost
      // rides in build_sec where the split keeps it visible.
      kcorePeel(co2, k = 3, rounds = 3,
        materialize = (r, df) =>
          graft.plans.SharedFrames(s, d, s"kcore_e$r")(df.localCheckpoint()))
    },

    // --------------------------------------------------------------- q226
    "q226_hits_scores" -> QueryDef.sql(
      "HITS hubs & authorities (Kleinberg 1999) over the DIRECTED " +
      "customer->supplier purchase bipartite — the link-analysis twin " +
      "of q95's PageRank: customers are hubs (good buyers point at " +
      "good suppliers), suppliers authorities. Scores stay UNNORMALIZED " +
      "exact integers (normalization is a positive scalar per side — " +
      "monotone, so rankings are invariant; the division is exactly " +
      "what would break cross-engine FP parity): a1(s) = indegree, " +
      "h1(c) = sum of a1 over c's suppliers, a2(s) = sum of h1 over " +
      "s's buyers — i.e. h1 counts length-2 paths c->*->*, a2 counts " +
      "length-3 paths ending at s. Top-20 per side elected by " +
      "(score desc, node asc). Shape at 100 TB: each half-iteration " +
      "is ONE equi-join (pairs x node frame) + one map-side-combinable " +
      "long sum — q95's scale shape; the supplier-domain frame " +
      "broadcasts, the customer-domain join shuffles on its key; " +
      "top-20 is TakeOrderedAndProject, the rank window runs on the " +
      "20-row result. int64 bound: a2 <= max_indeg^2 * max_outdeg " +
      "~ 1e14 at 1e11 edges — 4 orders inside int64.",
      """WITH pairs AS (SELECT DISTINCT 'c' || o_custkey AS c,
        |    's' || l_suppkey AS sn
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
        |a1 AS (SELECT sn, count(*)::BIGINT AS a FROM pairs GROUP BY 1),
        |h1 AS (SELECT p.c, sum(a1.a)::BIGINT AS h
        |  FROM pairs p JOIN a1 USING (sn) GROUP BY 1),
        |a2 AS (SELECT p.sn, sum(h1.h)::BIGINT AS a
        |  FROM pairs p JOIN h1 USING (c) GROUP BY 1),
        |hr AS (SELECT 'hub' AS side, c AS node, h AS score,
        |    row_number() OVER (ORDER BY h DESC, c)::BIGINT AS rank
        |  FROM h1),
        |ar AS (SELECT 'authority' AS side, sn AS node, a AS score,
        |    row_number() OVER (ORDER BY a DESC, sn)::BIGINT AS rank
        |  FROM a2)
        |SELECT side, rank, node, score FROM hr WHERE rank <= 20
        |UNION ALL
        |SELECT side, rank, node, score FROM ar WHERE rank <= 20
        |ORDER BY side, rank""".stripMargin) { (s, d) =>
      // same session-cached distinct-pair frame purchaseEdges feeds on;
      // tie-breaks ordered by the encoded long = string order (codec),
      // decoded on the 2k-row result
      hits(graft.plans.SharedFrames(s, d, "purchase_pairs") {
        purchasePairs(s, d)
      }, k = 20)
        .select(col("side"), col("rank"),
          decodeNode(col("node")).as("node"), col("score"))
        .orderBy("side", "rank")
    },

    // --------------------------------------------------------------- q232
    "q232_link_prediction" -> QueryDef.sql(
      "Link prediction on the part co-occurrence graph: top-20 " +
      "NON-adjacent part pairs most likely to co-occur next, scored " +
      "by the Resource Allocation index (Zhou/Lu/Zhang 2009) — " +
      "RA(a,c) = sum over common neighbors z of 1/deg(z) — the " +
      "candidate-generation step of a graph recommender, distinct " +
      "from q107 (which ranks EXISTING edges by cosine; this ranks " +
      "ABSENT pairs by shared-neighborhood structure). The election " +
      "key is exact: each z contributes the INTEGER 1e12 div deg(z), " +
      "summed as int64 (commutative, order-free) with (cn desc, pair) " +
      "tie-break; the emitted ra_index double is ONE division of that " +
      "integer by 1e12 — IEEE-identical cross-engine (the q107 " +
      "correctly-rounded rule). Shape at 100 TB: wedges come from ONE " +
      "self-equi-join of the degree-stamped adjacency on the center z " +
      "(sum deg(z)^2 over the SUPPORT-THRESHOLDED sparse edge list — " +
      "q102's bounded wedge cost, hub skew splits under AQE), " +
      "candidates are one combinable (count, sum) aggregate, " +
      "non-adjacency is a LEFT ANTI equi-join against the edge list, " +
      "and top-20 is TakeOrderedAndProject with the rank window on " +
      "20 rows. int64 headroom: ra_scaled <= cn * 1e12; past ~9e6 " +
      "common neighbors (trillion-edge hubs) switch the sum to " +
      "DECIMAL(38,0), same algebra.",
      """WITH op AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p
        |  FROM lineitem),
        |e AS MATERIALIZED (SELECT a.p AS u, b.p AS v
        |  FROM op a JOIN op b ON a.o = b.o AND a.p < b.p
        |  GROUP BY 1, 2 HAVING count(*) >= 2),
        |deg AS (SELECT node, count(*)::BIGINT AS deg FROM (
        |    SELECT u AS node FROM e UNION ALL SELECT v FROM e)
        |  GROUP BY node),
        |adw AS (SELECT adj.z, adj.x,
        |    (1000000000000 // deg.deg)::BIGINT AS w
        |  FROM (SELECT u AS z, v AS x FROM e
        |        UNION ALL SELECT v AS z, u AS x FROM e) adj
        |  JOIN deg ON adj.z = deg.node),
        |cand AS (SELECT l.x AS a, r.x AS c, count(*)::BIGINT AS cn,
        |    sum(l.w)::BIGINT AS ra_scaled
        |  FROM adw l JOIN adw r ON l.z = r.z AND l.x < r.x
        |  GROUP BY 1, 2),
        |na AS (SELECT * FROM cand
        |  WHERE NOT EXISTS (SELECT 1 FROM e
        |    WHERE e.u = cand.a AND e.v = cand.c)),
        |top AS (SELECT * FROM na
        |  ORDER BY ra_scaled DESC, cn DESC, a, c LIMIT 20)
        |SELECT row_number() OVER (ORDER BY ra_scaled DESC, cn DESC,
        |    a, c)::BIGINT AS rank,
        |  a::BIGINT AS part_a, c::BIGINT AS part_b,
        |  cn AS common_neighbors, ra_scaled,
        |  ra_scaled::DOUBLE / 1000000000000.0 AS ra_index
        |FROM top ORDER BY rank""".stripMargin) { (s, d) =>
      linkPrediction(basketCo2(s, d), k = 20)
    }
  )

  /** q177's oracle, extracted so q177's QueryDef entry reads linearly
    * next to q180's. */
  private lazy val localClusteringSql: String =
    """WITH op AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p
        |  FROM lineitem),
        |proj AS (SELECT a.p AS u, b.p AS v
        |  FROM op a JOIN op b ON a.o = b.o AND a.p < b.p
        |  GROUP BY 1, 2 HAVING count(*) >= 2),
        |tri AS (SELECT e1.u AS a, e1.v AS b, e2.v AS c
        |  FROM proj e1 JOIN proj e2 ON e1.v = e2.u
        |  JOIN proj e3 ON e3.u = e1.u AND e3.v = e2.v),
        |tn AS (SELECT node, count(*)::BIGINT AS tri
        |  FROM (SELECT a AS node FROM tri UNION ALL
        |        SELECT b FROM tri UNION ALL SELECT c FROM tri)
        |  GROUP BY node),
        |deg AS (SELECT node, count(*)::BIGINT AS deg
        |  FROM (SELECT u AS node FROM proj UNION ALL
        |        SELECT v FROM proj)
        |  GROUP BY node),
        |l AS (SELECT deg.node, deg.deg, coalesce(tn.tri, 0) AS tri,
        |    ((2000000 * coalesce(tn.tri, 0))
        |      // (deg.deg * (deg.deg - 1)))::BIGINT AS lcc_micro
        |  FROM deg LEFT JOIN tn ON deg.node = tn.node
        |  WHERE deg.deg >= 2)
        |SELECT (lcc_micro // 100000)::INT AS bucket,
        |  count(*)::BIGINT AS n_nodes,
        |  sum(deg)::BIGINT AS sum_deg, sum(tri)::BIGINT AS sum_tri,
        |  min(lcc_micro)::BIGINT AS min_lcc_micro,
        |  max(lcc_micro)::BIGINT AS max_lcc_micro
        |FROM l GROUP BY 1 ORDER BY bucket""".stripMargin

  /** q177's per-node clustering-coefficient histogram over an
    * arbitrary (u, v) edge list with u < v: triangle attribution via
    * one explode of the ordered-triangle list, degrees from the edge
    * list, exact integer lcc micro-units, 11-bucket rollup. Shared
    * by the catalog entry and SkylineTriangleSpec. */
  def localClustering(edges: DataFrame): DataFrame = {
    val e = edges.select(col("u"), col("v"))
    val tri3 = triangles(e.withColumn("shared", lit(1L)))
      .select(explode(array(col("a"), col("b"), col("c"))).as("node"))
    val tn = tri3.groupBy("node").agg(count(lit(1)).as("tri"))
    val deg = e.select(col("u").as("node"))
      .unionAll(e.select(col("v").as("node")))
      .groupBy("node").agg(count(lit(1)).as("deg"))
    val l = deg.join(tn, Seq("node"), "left")
      .where(col("deg") >= 2)
      .select(col("node"), col("deg"),
        coalesce(col("tri"), lit(0L)).as("tri"))
      .withColumn("lcc_micro",
        expr("(2000000 * tri) div (deg * (deg - 1))"))
    l.groupBy(expr("lcc_micro div 100000").cast("int").as("bucket"))
      .agg(count(lit(1)).as("n_nodes"), sum("deg").as("sum_deg"),
        sum("tri").as("sum_tri"), min("lcc_micro").as("min_lcc_micro"),
        max("lcc_micro").as("max_lcc_micro"))
      .orderBy("bucket")
  }

  /** q180's k-core peel over an arbitrary (u, v) edge list: `rounds`
    * synchronous rounds, each one degree aggregate + two endpoint
    * semi-filters, emitting the per-round survival summary. Shared by
    * the catalog entry and SkylineTriangleSpec.
    *
    * `materialize` is the iteration-reuse hook: every round's edge
    * frame is referenced TWICE downstream (its degree aggregate and
    * the next round's filter), so an un-materialized lazy tree
    * re-derives each round per consumer and COMPOUNDS — measured
    * 21.3 s at sf0.1 for 3 rounds; with per-round SharedFrames
    * materialization (the catalog entry's hook) the same peel is
    * ~1 s. The spec's hand graphs pass identity. This is q165's
    * linear-iteration lesson where one-reference restructuring is
    * impossible: when a round is genuinely consumed twice,
    * MATERIALIZE the round. */
  def kcorePeel(edges: DataFrame, k: Int, rounds: Int,
      materialize: (Int, DataFrame) => DataFrame = (_, df) => df)
      : DataFrame = {
    var e = edges.select(col("u"), col("v"))
    val summaries = Vector.newBuilder[DataFrame]
    for (r <- 0 to rounds) {
      val deg = e.select(col("u").as("node"))
        .unionAll(e.select(col("v").as("node")))
        .groupBy("node").agg(count(lit(1)).as("deg"))
      // n_edges = sum(deg)/2 (every edge contributes two endpoint
      // rows) — derived INSIDE the degree aggregate so no 1-row
      // crossJoin exists: each broadcast-exchange job costs ~0.3 s of
      // pure latency, and 8 of them dominated the first cut (measured
      // ~4.9 s -> ~0.9 s steady at sf0.1 on a 3.5k-edge graph)
      summaries += deg
        .agg(count(lit(1)).as("n_nodes"),
          expr("coalesce(sum(deg), 0) div 2").as("n_edges"),
          min("deg").cast("long").as("min_deg"),
          max("deg").cast("long").as("max_deg"))
        .select(lit(r).cast("int").as("round"), col("n_nodes"),
          col("n_edges"), col("min_deg"), col("max_deg"))
      if (r < rounds) {
        val keep = deg.where(col("deg") >= k).select(col("node"))
        e = materialize(r + 1, e
          .join(keep.withColumnRenamed("node", "u"), "u")
          .join(keep.withColumnRenamed("node", "v"), "v")
          .select(col("u"), col("v")))
      }
    }
    summaries.result().reduce(_ unionAll _).orderBy("round")
  }

  /** Synchronous min-label propagation over an arbitrary directed edge
    * list (src, dst), `rounds` Pregel-style supersteps from node-id
    * seeds; returns (node, lab). The self-kept label rides as a SELF-
    * EDGE per node, so each superstep is exactly ONE equi-join + ONE
    * min aggregate referencing the previous round ONCE — q95's linear
    * iteration shape. (The first cut carried labels with a per-round
    * LEFT JOIN back to the previous frame; that references the prior
    * round twice, so the lazy plan tree DOUBLES per superstep —
    * measured 10.6 s at sf0.1 vs ~4.4 s for this form. min over the
    * self-inclusive neighborhood is the same update rule.) Shared by
    * the q165 catalog entry and SkylineTriangleSpec. */
  def labelPropagation(edges: DataFrame, rounds: Int): DataFrame = {
    val nodes = edges.select(col("src").as("node")).distinct()
    val eself0 = edges.select(col("src"), col("dst"))
      .unionByName(nodes.select(col("node").as("src"),
        col("node").as("dst")))
    // scale-adaptive width for the per-superstep join (see scaleParts)
    val eself = scaleParts(edges)
      .map(n => eself0.repartition(n, col("src"))).getOrElse(eself0)
    val seeds = nodes.withColumn("lab", col("node"))
    (1 to rounds).foldLeft(seeds) { (lab, _) =>
      eself.join(lab.select(col("node").as("src"), col("lab")), "src")
        .groupBy(col("dst").as("node")).agg(min("lab").as("lab"))
    }
  }

  /** The q122 association-rule miner over an arbitrary (o, p) basket
    * frame — composes [[coOccurrenceEdges]]; shared with
    * SkylineTriangleSpec. */
  def associationRules(membership: DataFrame, minShared: Long,
      minConfidence: Double, minLift: Double): DataFrame = {
    val op = membership.distinct()
    associationRulesFrom(op, coOccurrenceEdgesFromDistinct(op, minShared),
      minConfidence, minLift)
  }

  /** [[associationRules]] over PRE-BUILT distinct membership and
    * co-occurrence frames — the shared-projection entry point (q122
    * passes the session-cached [[basketOp]]/[[basketCo2]] so the basket
    * self-join is computed once per session, not once per family
    * query). */
  def associationRulesFrom(op: DataFrame, co: DataFrame,
      minConfidence: Double, minLift: Double): DataFrame = {
    val nb = broadcast(op.agg(count_distinct(col("o")).as("n_baskets")))
    val deg = op.groupBy(col("p")).agg(count(lit(1)).as("d"))
    val sym = co.select(col("u"), col("v"), col("shared").as("co"))
      .unionByName(co.select(col("v").as("u"), col("u").as("v"),
        col("shared").as("co")))
    sym
      .join(deg.select(col("p").as("u"), col("d").as("deg_a")), "u")
      .join(deg.select(col("p").as("v"), col("d").as("deg_c")), "v")
      .crossJoin(nb)
      .select(col("u").as("antecedent"), col("v").as("consequent"),
        col("co").as("support_cnt"), col("deg_a"), col("deg_c"),
        col("n_baskets"),
        (col("co").cast("double") / col("deg_a").cast("double"))
          .as("confidence"),
        ((col("co").cast("double") * col("n_baskets").cast("double"))
          / (col("deg_a").cast("double") * col("deg_c").cast("double")))
          .as("lift"))
      .where(col("confidence") >= minConfidence && col("lift") >= minLift)
      .orderBy("antecedent", "consequent")
  }

  /** The q107 item-item cosine top-k over an arbitrary (o, p)
    * membership frame — shared by the catalog entry and
    * SkylineTriangleSpec. Composes [[coOccurrenceEdges]]. */
  def itemSimilarityTopK(membership: DataFrame, minShared: Long, k: Int)
      : DataFrame = {
    val op = membership.distinct()
    itemSimilarityTopKFrom(op, coOccurrenceEdgesFromDistinct(op, minShared), k)
  }

  /** [[itemSimilarityTopK]] over pre-built distinct membership and
    * co-occurrence frames — the shared-projection entry point for
    * q107. */
  def itemSimilarityTopKFrom(op: DataFrame, co: DataFrame, k: Int)
      : DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val deg = op.groupBy(col("p")).agg(count(lit(1)).as("d"))
    val sym = co.select(col("u"), col("v"), col("shared").as("co"))
      .unionByName(co.select(col("v").as("u"), col("u").as("v"),
        col("shared").as("co")))
    val sim = sym
      .join(deg.select(col("p").as("u"), col("d").as("du")), "u")
      .join(deg.select(col("p").as("v"), col("d").as("dv")), "v")
      .select(col("u"), col("v"), col("co"),
        (col("co").cast("double")
          / (sqrt(col("du").cast("double"))
            * sqrt(col("dv").cast("double")))).as("cosine"))
    sim
      .withColumn("rn", row_number().over(
        Window.partitionBy("u").orderBy(col("cosine").desc, col("v")))
        .cast("long"))
      .where(col("rn") <= k)
      .select("u", "rn", "v", "co", "cosine")
      .orderBy("u", "rn")
  }

  /** Support-thresholded co-occurrence edges (u < v) from an arbitrary
    * (o, p) membership frame — q102's projection stage, shared with
    * SkylineTriangleSpec. */
  def coOccurrenceEdges(membership: DataFrame, minShared: Long): DataFrame =
    coOccurrenceEdgesFromDistinct(membership.distinct(), minShared)

  /** [[coOccurrenceEdges]] when the membership frame is ALREADY
    * distinct — skips the redundant distinct shuffle (a distinct over
    * the session-cached [[basketOp]] would re-shuffle rows that are
    * unique by construction). */
  def coOccurrenceEdgesFromDistinct(op: DataFrame, minShared: Long)
      : DataFrame =
    op.select(col("o"), col("p").as("u"))
      .join(op.select(col("o"), col("p").as("v")), "o")
      .where(col("u") < col("v"))
      .groupBy("u", "v").agg(count(lit(1)).as("shared"))
      .where(col("shared") >= minShared)

  /** The q226 HITS operator over a directed bipartite (c, sn) pair
    * frame: 1.5 unnormalized integer iterations (a1 = indegree, h1 =
    * sum a1, a2 = sum h1 — length-2/3 path counts), top-k per side by
    * (score desc, node asc). Each half-iteration is one equi-join +
    * one combinable long sum; the supplier-domain a1 frame broadcasts;
    * the rank window runs on the k-row TakeOrdered result. Shared with
    * HitsSpec. */
  def hits(pairs: DataFrame, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val a1 = pairs.groupBy("sn").agg(count(lit(1)).cast("long").as("a"))
    val h1 = pairs.join(broadcast(a1), "sn")
      .groupBy("c").agg(sum("a").cast("long").as("h"))
    val a2 = pairs.join(h1, "c")
      .groupBy("sn").agg(sum("h").cast("long").as("a"))
    def top(df: DataFrame, node: String, score: String, side: String)
        : DataFrame = {
      val t = df.orderBy(col(score).desc, col(node)).limit(k)
      // rank window over the k-row TakeOrdered result — constant size
      t.select(lit(side).as("side"),
        row_number().over(Window.orderBy(col(score).desc, col(node)))
          .cast("long").as("rank"),
        col(node).as("node"), col(score).as("score"))
    }
    top(h1, "c", "h", "hub")
      .unionByName(top(a2, "sn", "a", "authority"))
      .orderBy("side", "rank")
  }

  /** Ordered-edge triangle enumeration over an (u, v, shared) edge list
    * with u < v: emits one row per triangle a < b < c. */
  def triangles(edges: DataFrame): DataFrame = {
    val e1 = edges.select(col("u").as("a"), col("v").as("b"),
      col("shared").as("shared_ab"))
    val e2 = edges.select(col("u").as("b"), col("v").as("c"),
      col("shared").as("shared_bc"))
    val e3 = edges.select(col("u").as("a"), col("v").as("c"),
      col("shared").as("shared_ac"))
    e1.join(e2, "b").join(e3, Seq("a", "c"))
      .select("a", "b", "c", "shared_ab", "shared_bc", "shared_ac")
      .orderBy("a", "b", "c")
  }

  /** q232's Resource-Allocation link predictor over an arbitrary
    * canonical (u < v) edge list: degree-stamped adjacency, wedge
    * self-join on the center node, (count, integer-RA-sum) aggregate,
    * LEFT ANTI against existing edges, top-k by the exact int64
    * election key. Shared by the catalog entry and
    * LinkPredictionSpec. */
  def linkPrediction(edges: DataFrame, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val e = edges.select(col("u"), col("v"))
    val deg = e.select(col("u").as("node"))
      .unionAll(e.select(col("v").as("node")))
      .groupBy("node").agg(count(lit(1)).as("deg"))
    val adj = e.select(col("u").as("z"), col("v").as("x"))
      .unionAll(e.select(col("v").as("z"), col("u").as("x")))
    val adw = adj.join(deg.withColumnRenamed("node", "z"), "z")
      .select(col("z"), col("x"),
        expr("1000000000000 div deg").as("w"))
    val cand = adw.select(col("z"), col("x").as("a"), col("w"))
      .join(adw.select(col("z"), col("x").as("c")), "z")
      .where(col("a") < col("c"))
      .groupBy("a", "c")
      .agg(count(lit(1)).as("cn"), sum("w").as("ra_scaled"))
    val na = cand.join(
      e.select(col("u").as("a"), col("v").as("c")),
      Seq("a", "c"), "left_anti")
    val ord = Seq(col("ra_scaled").desc, col("cn").desc, col("a"),
      col("c"))
    na.orderBy(ord: _*).limit(k)
      .withColumn("rank",
        row_number().over(Window.orderBy(ord: _*)).cast("long"))
      .select(col("rank"), col("a").cast("long").as("part_a"),
        col("c").cast("long").as("part_b"),
        col("cn").as("common_neighbors"), col("ra_scaled"),
        (col("ra_scaled").cast("double") / lit(1.0e12)).as("ra_index"))
      .orderBy("rank")
  }
}
