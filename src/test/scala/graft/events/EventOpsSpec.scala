package graft.events

import org.scalatest.funsuite.AnyFunSuite

import graft.TestFixtures.spark

class EventOpsSpec extends AnyFunSuite {
  import spark.implicits._

  // left: (id, user, ts) — right: (id, user, ts, price)
  private lazy val purchases = Seq(
    (100L, 1L, 1000L), // after views at 900/950 → matches 950
    (101L, 1L, 950L),  // same instant as a view → inclusive match
    (102L, 1L, 800L),  // before every view of user 1 → no match
    (103L, 2L, 5000L), // user 2's only view is at 5000 (dup rows)
    (104L, 3L, 7000L)) // user 3 has no views at all → no match
    .toDF("event_id", "user_id", "ts_us")

  private lazy val views = Seq(
    (10L, 1L, 900L, 1.0),
    (11L, 1L, 950L, 2.0),
    (12L, 2L, 5000L, 3.0), // duplicate instant —
    (13L, 2L, 5000L, 4.0)) //   greatest payload struct (id 13) must win
    .toDF("event_id", "user_id", "ts_us", "price")

  private def run(tol: Option[Long] = None) =
    EventOps.asofJoin(purchases, "ts_us", views, "ts_us", "user_id",
        Seq("event_id", "price"), tol)
      .collect().map(r => r.getLong(0) ->
        (Option(r.get(3)).map(_.asInstanceOf[Long]),
          Option(r.get(4)).map(_.asInstanceOf[Long]),
          Option(r.get(5)).map(_.asInstanceOf[Double]))).toMap

  test("latest-at-or-before match, inclusive ties, deterministic duplicates, nulls") {
    val out = run()
    assert(out(100L) == (Some(950L), Some(11L), Some(2.0)))
    assert(out(101L) == (Some(950L), Some(11L), Some(2.0)), "equal ts is inclusive")
    assert(out(102L) == (None, None, None), "no earlier right row")
    assert(out(103L) == (Some(5000L), Some(13L), Some(4.0)),
      "same-instant duplicate rights resolve to the greatest payload")
    assert(out(104L) == (None, None, None), "key absent from right")
  }

  test("tolerance nulls out stale matches") {
    val out = run(tol = Some(25L))
    assert(out(100L) == (None, None, None), "950 is 50us stale at tol 25")
    assert(out(101L) == (Some(950L), Some(11L), Some(2.0)), "0us within tol")
  }

  test("reserved/colliding column names refuse loudly; null keys never match") {
    // internal working-column collision (either side)
    val badLeft = purchases.withColumnRenamed("event_id", "_ts")
    intercept[IllegalArgumentException] {
      EventOps.asofJoin(badLeft, "ts_us", views, "ts_us", "user_id", Seq("price"))
    }
    val badRight = views.withColumnRenamed("event_id", "_m")
    intercept[IllegalArgumentException] {
      EventOps.asofJoin(purchases, "ts_us", badRight, "ts_us", "user_id", Seq("price"))
    }
    // output-name collision on the left
    val badOut = purchases.withColumnRenamed("event_id", "matched_price")
    intercept[IllegalArgumentException] {
      EventOps.asofJoin(badOut, "ts_us", views, "ts_us", "user_id", Seq("price"))
    }
    intercept[IllegalArgumentException] {
      EventOps.intervalJoin(badOut, "ts_us", views, "ts_us", "user_id",
        Seq("price"), -100L, 0L)
    }
    // equi-join NULL semantics: a null-key left row must come out
    // unmatched even when null-key right rows exist at earlier ts
    import org.apache.spark.sql.functions.{col, lit, when}
    val nullKeyLeft = purchases.withColumn("user_id",
      when(col("event_id") === 104L, lit(null).cast("long"))
        .otherwise(col("user_id")))
    val nullKeyRight = views.withColumn("user_id",
      when(col("event_id") === 10L, lit(null).cast("long"))
        .otherwise(col("user_id")))
    val out = EventOps.asofJoin(nullKeyLeft, "ts_us", nullKeyRight, "ts_us",
        "user_id", Seq("event_id", "price"))
      .collect().map(r => r.getLong(0) -> Option(r.get(3))).toMap
    assert(out(104L).isEmpty, "null-key left row must not match null-key right rows")
    assert(out(100L).contains(950L), "non-null keys unaffected")
  }

  test("intervalJoin keeps every match inside the window (inner semantics)") {
    val got = EventOps.intervalJoin(purchases, "ts_us", views, "ts_us",
        "user_id", Seq("event_id"), lowerUs = -100L, upperUs = 0L)
      .collect().map(r => (r.getLong(0), r.getLong(4))).toSet
    assert(got == Set(
      (100L, 10L), (100L, 11L),       // 900/-100 and 950/-50 both in window
      (101L, 10L), (101L, 11L),       // -50 and 0 (inclusive bounds)
      (103L, 12L), (103L, 13L)))      // BOTH same-instant duplicates kept
    // empty interval rejected loudly
    intercept[IllegalArgumentException] {
      EventOps.intervalJoin(purchases, "ts_us", views, "ts_us",
        "user_id", Seq("event_id"), 10L, -10L)
    }
    // carrying the right ts column again would duplicate matched_ts_us
    intercept[IllegalArgumentException] {
      EventOps.intervalJoin(purchases, "ts_us", views, "ts_us",
        "user_id", Seq("event_id", "ts_us"), -100L, 0L)
    }
    intercept[IllegalArgumentException] {
      EventOps.asofJoin(purchases, "ts_us", views, "ts_us",
        "user_id", Seq("ts_us"))
    }
  }

  test("intervalJoin matches a scan reference on a randomized corpus") {
    val rnd = new scala.util.Random(7)
    val l = (0 until 200).map(i =>
      (i.toLong, rnd.nextInt(5).toLong, rnd.nextInt(500).toLong))
    val r = (0 until 200).map(i =>
      (1000L + i, rnd.nextInt(5).toLong, rnd.nextInt(500).toLong, rnd.nextDouble()))
    val got = EventOps.intervalJoin(
        l.toDF("event_id", "user_id", "ts_us"), "ts_us",
        r.toDF("event_id", "user_id", "ts_us", "price"), "ts_us",
        "user_id", Seq("event_id"), lowerUs = -50L, upperUs = 20L)
      .collect().map(x => (x.getLong(0), x.getLong(4))).toSet
    val want = (for {
      (lid, lu, lts) <- l
      (rid, ru, rts, _) <- r
      if lu == ru && rts >= lts - 50 && rts <= lts + 20
    } yield (lid, rid)).toSet
    assert(got == want)
  }

  test("matches a per-key scan reference on a randomized corpus") {
    val rnd = new scala.util.Random(42)
    val l = (0 until 300).map(i =>
      (i.toLong, rnd.nextInt(5).toLong, rnd.nextInt(1000).toLong))
    val r = (0 until 200).map(i =>
      (1000L + i, rnd.nextInt(5).toLong, rnd.nextInt(1000).toLong, rnd.nextDouble()))
    val got = EventOps.asofJoin(
        l.toDF("event_id", "user_id", "ts_us"),
        "ts_us", r.toDF("event_id", "user_id", "ts_us", "price"),
        "ts_us", "user_id", Seq("event_id"))
      .collect().map(x => x.getLong(0) -> Option(x.get(3)).map(_.asInstanceOf[Long])).toMap
    l.foreach { case (id, u, ts) =>
      // reference: among right rows (u, rts <= ts), max (rts, then payload)
      val cand = r.filter(x => x._2 == u && x._3 <= ts)
      // tie order mirrors the op's greatest-payload-struct rule:
      // (ts, then carried cols in declaration order — here event_id)
      val want = if (cand.isEmpty) None
        else Some(cand.maxBy(x => (x._3, x._1, x._4))._3)
      assert(got(id) == want, s"left $id user $u ts $ts")
    }
  }
}
