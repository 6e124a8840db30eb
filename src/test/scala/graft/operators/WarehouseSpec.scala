package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Semantic anchors for the lakehouse write-path pair: q150's MERGE
  * action classification is a partition of the key universe obeying
  * the stated rules, and q151's deletion-vector audit reconciles
  * exactly with q150's delete set under the 128-row file layout. */
class WarehouseSpec extends SparkSpec {
  import spark.implicits._

  private def q150 = graft.SparkEntry.queries("q150_merge_cdc_upsert")(spark, sf0001)
  private def q151 = graft.SparkEntry.queries("q151_deletion_vector_audit")(spark, sf0001)

  test("q150: actions partition the key universe and every branch is non-empty") {
    val rows = q150.select("c_custkey", "action")
      .as[(Long, String)].collect()
    assert(rows.map(_._1).distinct.length == rows.length,
      "one action per key")
    val byAction = rows.groupBy(_._2).view.mapValues(_.length).toMap
    Seq("delete", "update", "insert", "keep").foreach { a =>
      assert(byAction.getOrElse(a, 0) > 0, s"branch '$a' is empty — no value signal")
    }
    // universe = snapshot keys UNION window-active customers
    val snap = graft.Tables.customer(spark, sf0001)
      .where(col("c_custkey") % 3 =!= 0).select("c_custkey")
    val active = graft.Tables.orders(spark, sf0001)
      .where(col("o_orderdate") >= lit("2000-01-01").cast("timestamp"))
      .select(col("o_custkey").as("c_custkey")).distinct()
    val universe = snap.union(active).distinct().count()
    assert(rows.length.toLong == universe, "every key classified exactly once")
  }

  test("q150: each action obeys its rule") {
    val rows = q150.select("c_custkey", "action", "n_orders", "n_open")
      .collect()
    rows.foreach { r =>
      val (k, a) = (r.getLong(0), r.getString(1))
      a match {
        case "insert" => assert(k % 3 == 0, s"insert key $k must be outside the snapshot")
        case "keep"   => assert(r.isNullAt(2), s"keep key $k must have no window orders")
        case "delete" =>
          assert(k % 3 != 0 && r.getLong(3) == 0 && r.getLong(2) >= 2,
            s"delete rule violated for $k: $r")
        case "update" =>
          assert(k % 3 != 0 && !(r.getLong(3) == 0 && r.getLong(2) >= 2),
            s"update row satisfies the delete rule: $r")
        case other => fail(s"unknown action $other")
      }
    }
  }

  test("q151: deletion vectors reconcile with the merge's delete set") {
    val audit = q151.collect()
    val deletes = q150.where(col("action") === "delete")
      .select("c_custkey").as[Long].collect().toSet
    assert(audit.map(_.getLong(2)).sum == deletes.size,
      "total dead rows = merge deletes")
    val snapCount = graft.Tables.customer(spark, sf0001)
      .where(col("c_custkey") % 3 =!= 0).count()
    assert(audit.map(_.getLong(1)).sum == snapCount,
      "the audit covers every snapshot row exactly once")
    audit.foreach { r =>
      val (file, nRows, nDead) = (r.getLong(0), r.getLong(1), r.getLong(2))
      assert(nDead <= nRows, s"file $file: dead beyond rows")
      if (nDead == 0) {
        assert(r.isNullAt(3) && r.isNullAt(4) && r.isNullAt(5),
          s"file $file: empty DV must carry null position stats")
      } else {
        val (lo, hi, sum) = (r.getLong(4), r.getLong(5), r.getLong(3))
        assert(lo >= 0 && hi < 128 && lo <= hi, s"file $file: position range")
        assert(sum >= lo * nDead && sum <= hi * nDead,
          s"file $file: position checksum outside [lo*n, hi*n]")
      }
    }
    // cross-check one file's vector against first principles
    val perFile = deletes.groupBy(_ / 128).view
      .mapValues(ks => (ks.size.toLong, ks.map(_ % 128).sum)).toMap
    audit.filter(_.getLong(2) > 0).foreach { r =>
      val (n, s) = perFile(r.getLong(0))
      assert(r.getLong(2) == n && r.getLong(3) == s,
        s"file ${r.getLong(0)}: DV mismatch vs first principles")
    }
  }

  test("q150/q151: merge is a single equi-join plan — no cartesian, no nested loop") {
    Seq(q150, q151).foreach { df =>
      val p = df.queryExecution.executedPlan.toString()
      assert(!p.contains("CartesianProduct"), p)
      assert(!p.contains("BroadcastNestedLoopJoin"), p)
    }
  }

  test("q152: every small file lands in exactly one job; greedy packing respects the target") {
    val rows = graft.SparkEntry.queries("q152_compaction_plan")(spark, sf0001)
      .select("file_month", "n_rows", "is_small", "job_id").collect()
    assert(rows.nonEmpty)
    val smalls = rows.filter(_.getBoolean(2))
    val bigs = rows.filterNot(_.getBoolean(2))
    assert(smalls.nonEmpty && bigs.nonEmpty, "both classes must exist")
    assert(smalls.forall(!_.isNullAt(3)), "every small file gets a job")
    assert(bigs.forall(_.isNullAt(3)), "no job for already-right-sized files")
    // greedy boundary property: the running total within a job stays
    // under target + the job's last file (first-fit never splits files)
    val total = rows.map(_.getLong(1)).sum
    val target = 2 * (total / rows.length)
    val byJob = smalls.groupBy(_.getLong(3))
    val jobIds = byJob.keySet
    assert(jobIds.min == 0, "job ids start at 0")
    byJob.foreach { case (j, fs) =>
      val sizes = fs.sortBy(_.getTimestamp(0).getTime).map(_.getLong(1))
      assert(sizes.init.sum < target,
        s"job $j overfilled before its last file: ${sizes.toSeq} vs $target")
    }
    // jobs fill in key order: max month of job j < min month of job j+1
    val ordered = jobIds.toSeq.sorted
    ordered.sliding(2).foreach {
      case Seq(a, b) =>
        val maxA = byJob(a).map(_.getTimestamp(0).getTime).max
        val minB = byJob(b).map(_.getTimestamp(0).getTime).min
        assert(maxA < minB, s"jobs $a/$b not in key order")
      case _ => ()
    }
  }

  test("q153: every as-of state equals a first-principles fold of the commit log") {
    val base = graft.Tables.customer(spark, sf0001)
      .select(col("c_custkey"), round(col("c_acctbal") * 100).cast("long"))
      .as[(Long, Long)].collect()
    // fold the three versions by hand (delete %50 then bump %97 at v1;
    // delete the bumped %97 rows then bump %7 at v2)
    val s1 = base.filter(_._1 % 50 != 0)
      .map { case (k, c) => (k, if (k % 97 == 0) c + 1000 else c) }
    val s2 = s1.filter(_._1 % 97 != 0)
      .map { case (k, c) => (k, if (k % 7 == 0) c + 2500 else c) }
    val expected = Seq(
      (0L, base.length.toLong, base.map(_._2).sum),
      (1L, s1.length.toLong, s1.map(_._2).sum),
      (2L, s2.length.toLong, s2.map(_._2).sum))
    val got = graft.SparkEntry.queries("q153_snapshot_time_travel")(spark, sf0001)
      .as[(Long, Long, Long)].collect().toSeq
    assert(got == expected, s"as-of states diverge: $got vs $expected")
    // the log actually mutates: each version differs from its predecessor
    assert(got.map(_._2).distinct.length == 3, "every version must change rows")
    // and the row-level AS-OF read at v=1 reconstructs exactly the v1 fold
    val readV1 = graft.SparkEntry.queries("q156_snapshot_asof_read")(spark, sf0001)
      .as[(Long, Long)].collect().toMap
    assert(readV1 == s1.toMap,
      s"q156 as-of rows diverge from the v1 fold (${readV1.size} vs ${s1.length})")
  }

  test("q154: plan reconciles with the merge's delete set; all three actions populated") {
    val rows = graft.SparkEntry.queries("q154_vacuum_plan")(spark, sf0001)
      .select("file_id", "n_rows", "n_dead", "action", "live_rows",
        "reclaim_rows", "dv_bytes").collect()
    val byAction = rows.groupBy(_.getString(3)).view.mapValues(_.length).toMap
    Seq("rewrite", "carry_dv", "retain").foreach { a =>
      assert(byAction.getOrElse(a, 0) > 0, s"branch '$a' is empty — no value signal")
    }
    rows.foreach { r =>
      val (n, dead, a) = (r.getLong(1), r.getLong(2), r.getString(3))
      val expected =
        if (4 * dead >= n) "rewrite"
        else if (10 * dead >= n) "carry_dv"
        else "retain"
      assert(a == expected, s"file ${r.getLong(0)}: action $a, expected $expected")
      assert(r.getLong(4) == n - dead, s"live_rows drifted: $r")
      assert(r.getLong(5) == (if (a == "rewrite") dead else 0L),
        s"reclaim_rows drifted: $r")
      assert(r.getLong(6) == (if (a == "carry_dv") (n + 7) / 8 else 0L),
        s"dv_bytes drifted: $r")
    }
    // coverage + reconciliation against q150's delete set at 32-row files
    val deletes = q150.where(col("action") === "delete")
      .select("c_custkey").as[Long].collect().toSet
    assert(rows.map(_.getLong(2)).sum == deletes.size,
      "total dead rows = merge deletes")
    val snapCount = graft.Tables.customer(spark, sf0001)
      .where(col("c_custkey") % 3 =!= 0).count()
    assert(rows.map(_.getLong(1)).sum == snapCount,
      "the plan covers every snapshot row exactly once")
  }

  test("q155: skip counts equal first-principles rectangle tests; the layout prunes every probe") {
    val stats = ExtendedQueries.zorderBucketStats(spark, sf0001)
      .select("cust_lo", "cust_hi", "day_lo", "day_hi")
      .as[(Long, Long, Long, Long)].collect()
    val Array((clo, chi, dlo, dhi)) = ExtendedQueries.zorderBounds(spark, sf0001)
      .as[(Long, Long, Long, Long)].collect()
    def probe(dim: String, lo: Long, hi: Long): Long = stats.count {
      case (cl, ch, tl, th) =>
        if (dim == "cust") ch < lo || cl > hi else th < lo || tl > hi
    }.toLong
    val expected = Seq(
      (1L, "cust", clo, clo + (chi - clo) / 10),
      (2L, "cust", clo + 45 * (chi - clo) / 100, clo + 55 * (chi - clo) / 100),
      (3L, "cust", clo + 9 * (chi - clo) / 10, chi),
      (4L, "day", dlo, dlo + (dhi - dlo) / 10),
      (5L, "day", dlo + 45 * (dhi - dlo) / 100, dlo + 55 * (dhi - dlo) / 100),
      (6L, "day", dlo + 9 * (dhi - dlo) / 10, dhi)
    ).map { case (id, dim, lo, hi) =>
      (id, dim, lo, hi, stats.length.toLong, probe(dim, lo, hi),
        stats.length.toLong - probe(dim, lo, hi))
    }
    val got = graft.SparkEntry.queries("q155_minmax_pruning_audit")(spark, sf0001)
      .as[(Long, String, Long, Long, Long, Long, Long)].collect().toSeq
    assert(got == expected, s"audit diverges from first principles:\n$got\n$expected")
    // the z-order layout must actually prune on BOTH dimensions — that
    // is the property the audit exists to demonstrate
    got.foreach { r =>
      assert(r._6 > 0, s"probe ${r._1} (${r._2}) skipped nothing — layout broken")
    }
  }

  test("q160: all four CDF row kinds populated; pre/post pairs reconcile; pre-images are the v1 state") {
    val rows = graft.SparkEntry.queries("q160_change_data_feed")(spark, sf0001)
      .as[(Long, Long, String, Long)].collect()
    val byType = rows.groupBy(_._3)
    Seq("delete", "insert", "update_preimage", "update_postimage").foreach {
      t => assert(byType.getOrElse(t, Array.empty).nonEmpty,
        s"CDF kind '$t' is empty — no value signal")
    }
    val baseCents = graft.Tables.customer(spark, sf0001)
      .select(col("c_custkey"),
        round(col("c_acctbal") * 100).cast("long"))
      .as[(Long, Long)].collect().toMap
    // update pre/post pair on the same keys; the v2 bump is base+2500
    // against a base-valued v1 pre-image (the %7 branch excludes the
    // v1-bumped %97 keys)
    val pre = byType("update_preimage").map(r => r._1 -> r._4).toMap
    val post = byType("update_postimage").map(r => r._1 -> r._4).toMap
    assert(pre.keySet == post.keySet, "pre/post key sets must match")
    pre.foreach { case (k, c) =>
      assert(c == baseCents(k), s"pre-image of $k must be the v1 state")
      assert(post(k) == baseCents(k) + 2500L, s"post-image of $k")
      assert(k % 7 == 0 && k % 50 != 0 && k % 97 != 0, s"update key $k")
    }
    // deletes target the v1-bumped %97 keys; the pre-image carries the
    // bump — the CDF shows what the consumer saw LAST, not the base row
    byType("delete").foreach { case (k, ver, _, c) =>
      assert(k % 97 == 0 && k % 50 != 0 && ver == 2L, s"delete key $k")
      assert(c == baseCents(k) + 1000L,
        s"delete pre-image of $k must include the v1 bump")
    }
    // late inserts are the negated %31 keys at v3, join-free off the log
    byType("insert").foreach { case (k, ver, _, c) =>
      assert(k < 0 && ver == 3L && (-k - 1) % 31 == 0, s"insert key $k")
      assert(c == baseCents(-k - 1) + 4242L, s"insert cents of $k")
    }
  }

  test("q161: the incremental refresh equals the full recompute in every group") {
    val rows = graft.SparkEntry
      .queries("q161_incremental_mv_refresh")(spark, sf0001)
      .as[(Long, Long, Long, Long, Long, Long, Long, Long, Long)].collect()
    assert(rows.length == 10, "pmod-10 groups")
    rows.foreach { case (g, nV1, sumV1, dN, dSum, nInc, sumInc, nFull, sumFull) =>
      assert(nInc == nV1 + dN && sumInc == sumV1 + dSum,
        s"group $g: inc columns must be the v1+delta fold")
      assert(nInc == nFull && sumInc == sumFull,
        s"group $g: incremental refresh diverges from recompute — " +
          "self-maintainability identity broken")
    }
    // the delta row-count must reconcile with q160's feed: +1 per
    // insert, -1 per delete, 0 per update pair
    val cdf = graft.SparkEntry.queries("q160_change_data_feed")(spark, sf0001)
      .as[(Long, Long, String, Long)].collect()
    val expectDn = cdf.count(_._3 == "insert") - cdf.count(_._3 == "delete")
    assert(rows.map(_._4).sum == expectDn, "total row delta vs the feed")
  }

  test("q163: sweep depths equal the brute-force stabbing count at every open boundary") {
    val rows = graft.SparkEntry
      .queries("q163_clustering_depth_audit")(spark, sf0001)
      .as[(String, Long, Long, Long, Long)].collect()
    assert(rows.map(_._1).distinct.sorted.toSeq == Seq("cust", "day"))
    val byDim = rows.groupBy(_._1)
    byDim.foreach { case (dim, rs) =>
      rs.foreach { case (_, b, lo, _, depth) =>
        val brute = rs.count { case (_, _, l2, h2, _) => l2 <= lo && lo <= h2 }
        assert(depth == brute.toLong,
          s"$dim bucket $b: sweep depth $depth != brute stabbing count $brute")
        assert(depth >= 1L, "every interval covers its own lo")
      }
    }
  }

  test("q188 orphans: manifest/attempt laws and the retention grace window") {
    val rows = graft.SparkEntry
      .queries("q188_orphan_file_audit")(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getBoolean(3), r.getBoolean(4)))
    val months = rows.filter(_._2 == 0L)
    assert(months.nonEmpty && months.forall(_._4), "attempt 0 is committed")
    val orphans = rows.filter(_._2 == 1L)
    assert(orphans.nonEmpty, "the aborted-attempt branch must populate")
    assert(orphans.forall(r => !r._4 && r._1 % 5 == 2),
      "orphans are exactly the fm%5=2 aborted attempts")
    // an orphan carries the same row count as its committed twin
    val byM = months.map(r => r._1 -> r._3).toMap
    orphans.foreach { case (fm, _, n, _, _) => assert(byM(fm) == n) }
    val maxm = months.map(_._1).max
    rows.foreach { case (fm, _, _, inManifest, eligible) =>
      assert(eligible == (!inManifest && fm < maxm - 3),
        "eligibility = orphan AND past the grace window")
    }
    assert(orphans.exists(_._5) && orphans.exists(!_._5),
      "both sides of the grace window populated")
  }
}
