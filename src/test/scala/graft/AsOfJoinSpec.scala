package graft

import java.sql.Timestamp

import graft.plans.AsOf
import org.scalatest.funsuite.AnyFunSuite

/** Edge cases for the first-class as-of join operator the sf0.01 oracle
  * can't isolate: tie-breaking, no-match drops, interleaved users across
  * shuffle partitions, and right rows beyond every left time. */
class AsOfJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def ts(sec: Long) = new Timestamp(sec * 1000)

  private def run(purchases: Seq[(Long, Long, Timestamp)],
                  clicks: Seq[(Long, Long, Timestamp)]): Map[Long, Long] = {
    import spark.implicits._
    val p = purchases.toDF("p_user", "purchase_id", "pts").repartition(4)
    val c = clicks.toDF("user_id", "click_id", "cts").repartition(3)
    AsOf.join(p, c, "p_user", "user_id", "pts", "cts", "click_id")
      .select("purchase_id", "click_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("latest click at-or-before wins; equal timestamps break by largest id") {
    val out = run(
      purchases = Seq((1L, 100L, ts(50))),
      clicks = Seq(
        (1L, 10L, ts(10)),
        (1L, 11L, ts(50)), // tie on time with 12 — larger id must win
        (1L, 12L, ts(50)),
        (1L, 13L, ts(51)))) // after the purchase — excluded
    assert(out == Map(100L -> 12L))
  }

  test("purchases with no preceding click are dropped (inner as-of)") {
    val out = run(
      purchases = Seq((1L, 100L, ts(5)), (2L, 200L, ts(50)), (3L, 300L, ts(50))),
      clicks = Seq((1L, 10L, ts(10)), (2L, 20L, ts(20))))
    assert(out == Map(200L -> 20L)) // user 1's click is later; user 3 has none
  }

  test("many interleaved users across partitions, multiple purchases each") {
    val purchases = for (u <- 1L to 40L; k <- 0L to 2L)
      yield (u, u * 100 + k, ts(100 * (k + 1)))
    val clicks = for (u <- 1L to 40L; k <- 0L to 5L)
      yield (u, u * 1000 + k, ts(60 * k + 1))
    val out = run(purchases, clicks)
    // purchase at 100s: latest click ≤ 100 is k=1 (61s); at 200s: k=3
    // (181s); at 300s: k=4 (241s)
    (1L to 40L).foreach { u =>
      assert(out(u * 100 + 0) == u * 1000 + 1, s"user $u first purchase")
      assert(out(u * 100 + 1) == u * 1000 + 3, s"user $u second purchase")
      assert(out(u * 100 + 2) == u * 1000 + 4, s"user $u third purchase")
    }
    assert(out.size == 120)
  }

  test("null keys and times never match and never crash (SQL join semantics)") {
    import spark.implicits._
    val p = Seq(
      (java.lang.Long.valueOf(1L), 100L, ts(50)),
      (null.asInstanceOf[java.lang.Long], 101L, ts(50)), // null user: dropped
      (java.lang.Long.valueOf(2L), 102L, null.asInstanceOf[Timestamp])) // null time: dropped
      .toDF("p_user", "purchase_id", "pts")
    val c = Seq(
      (java.lang.Long.valueOf(1L), 10L, ts(10)),
      (null.asInstanceOf[java.lang.Long], 11L, ts(10)),  // null user: ignored
      (java.lang.Long.valueOf(2L), 12L, ts(10)),
      (java.lang.Long.valueOf(1L), 13L, null.asInstanceOf[Timestamp])) // null time: ignored
      .toDF("user_id", "click_id", "cts")
    val out = AsOf.join(p, c, "p_user", "user_id", "pts", "cts", "click_id")
      .select("purchase_id", "click_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(100L -> 10L), s"got $out")
  }

  test("self-join with shared lineage dedups attribute ids; raw collect works") {
    import spark.implicits._
    val e = Seq((1L, 100L, ts(10)), (1L, 200L, ts(50)))
      .toDF("user_id", "event_id", "ts").repartition(2)
    // no aliases on either side, and no select() on top: exercises the
    // right-side re-alias (ExprId dedup) and the UnsafeRow result
    // projection (collect straight off the join node)
    val rows = AsOf.join(e, e, "user_id", "user_id", "ts", "ts", "event_id").collect()
    val pairs = rows.map(r => r.getLong(1) -> r.getLong(4)).toMap
    // each event's latest same-user event at-or-before itself is itself
    assert(pairs == Map(100L -> 100L, 200L -> 200L), s"got ${pairs.toSeq}")
  }

  test("non-long key columns are rejected at build time, not task time") {
    import spark.implicits._
    val p = Seq(("u1", 100L, ts(50))).toDF("p_user", "purchase_id", "pts")
    val c = Seq(("u1", 10L, ts(10))).toDF("user_id", "click_id", "cts")
    val err = intercept[IllegalArgumentException] {
      AsOf.join(p, c, "p_user", "user_id", "pts", "cts", "click_id")
    }
    assert(err.getMessage.contains("must be LongType or a timestamp"), err.getMessage)
  }

  test("agrees with the window-composed form on a random workload") {
    val rnd = new scala.util.Random(11)
    val purchases = (1 to 300).map(i =>
      (rnd.nextInt(20).toLong, 10000L + i, ts(rnd.nextInt(1000).toLong)))
    val clicks = (1 to 500).map(i =>
      (rnd.nextInt(20).toLong, 20000L + i, ts(rnd.nextInt(1000).toLong)))
    val native = run(purchases, clicks)

    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val w = Window.partitionBy(col("purchase_id"))
      .orderBy(col("cts").desc, col("click_id").desc)
    val composed = purchases.toDF("p_user", "purchase_id", "pts")
      .join(clicks.toDF("user_id", "click_id", "cts"),
        col("p_user") === col("user_id") && col("cts") <= col("pts"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select("purchase_id", "click_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(native == composed)
  }

  test("correct under aggressive AQE partition coalescing with skewed side sizes") {
    // AsOfJoinExec zips child partitions 1:1 (like SMJ), so AQE must
    // coalesce both co-partitioned shuffles IDENTICALLY even when one side
    // is 1000x smaller and would, alone, coalesce to fewer partitions. A
    // tiny advisory size forces coalescing decisions; a mismatch would
    // throw (unequal zip) or silently mispair users.
    import spark.implicits._
    val prev = spark.conf.get("spark.sql.adaptive.advisoryPartitionSizeInBytes", null)
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "1KB")
    try {
      val purchases = (1 to 20000).map(i => ((i % 200).toLong, 100000L + i, ts(i % 997)))
      val clicks = (1 to 40).map(i => ((i % 20).toLong, 200000L + i, ts(0)))
      val p = purchases.toDF("p_user", "purchase_id", "pts").repartition(32)
      val c = clicks.toDF("user_id", "click_id", "cts").repartition(32)
      val out = AsOf.join(p, c, "p_user", "user_id", "pts", "cts", "click_id")
        .select("purchase_id", "click_id").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      // every purchase of users 0-19 matches that user's latest ts(0) click
      val expected = purchases.collect {
        case (u, pid, _) if u < 20 =>
          pid -> (200000L + (if (u == 0L) 40 else 20 + u)) // largest click_id for user u
      }.toMap
      assert(out == expected)
    } finally {
      if (prev == null) spark.conf.unset("spark.sql.adaptive.advisoryPartitionSizeInBytes")
      else spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", prev)
    }
  }
}
