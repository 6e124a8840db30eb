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
}
