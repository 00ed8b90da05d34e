package graft

import graft.plans.{AsOfJoinPlan, AsOfJoinStrategy}
import org.apache.spark.sql.DataFrame

/** Direct unit tests for the native as-of operator on crafted edge cases
  * the fixtures don't exercise: keys with no right-side rows at all,
  * probes earlier than every right row, exact-timestamp matches, and
  * multiple right rows at one timestamp. */
class AsOfJoinSpec extends SparkSuite {

  private def asof(left: DataFrame, right: DataFrame): DataFrame = {
    if (!spark.experimental.extraStrategies.contains(AsOfJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsOfJoinStrategy
    val lp = left.queryExecution.analyzed
    val rp = right.queryExecution.analyzed
    def attr(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan, n: String) =
      p.output.find(_.name == n).get
    org.apache.spark.sql.graft.GraftSql.ofRows(spark,
      AsOfJoinPlan(lp, rp,
        attr(lp, "k"), attr(rp, "rk"), attr(lp, "t"), attr(rp, "rt")))
  }

  test("as-of join edge cases: missing keys, early probes, exact ts") {
    import spark.implicits._
    // left: (key, probe time, id)
    val left = Seq(
      (1L, 100L, "p1"),   // after both signups of key 1
      (1L, 50L, "p2"),    // exactly at a signup ts -> inclusive match
      (1L, 10L, "p3"),    // before every signup -> null
      (2L, 500L, "p4"),   // key with NO right rows -> null
      (3L, 75L, "p5")     // between signups of key 3
    ).toDF("k", "t", "pid")
    // right: (key, signup time, label)
    val right = Seq(
      (1L, 50L, "s1a"), (1L, 90L, "s1b"),
      (3L, 70L, "s3a"), (3L, 80L, "s3b")
    ).toDF("rk", "rt", "sid")

    val got = asof(left, right)
      .select($"pid", $"sid")
      .collect().map(r => r.getString(0) ->
        (if (r.isNullAt(1)) null else r.getString(1))).toMap

    assert(got == Map(
      "p1" -> "s1b",  // latest <= 100 is 90
      "p2" -> "s1a",  // inclusive at exactly 50
      "p3" -> null,   // nothing at or before 10
      "p4" -> null,   // no right rows for key 2
      "p5" -> "s3a"   // 70 <= 75 < 80
    ), s"unexpected matches: $got")
  }

  test("as-of join works with string keys (type-dispatched comparators)") {
    import spark.implicits._
    val left = Seq(
      ("alice", 100L, "p1"), ("alice", 10L, "p2"), ("bob", 75L, "p3"),
      ("carol", 500L, "p4")  // no right rows
    ).toDF("k", "t", "pid")
    val right = Seq(
      ("alice", 50L, "s1"), ("alice", 90L, "s2"),
      ("bob", 70L, "s3"), ("bob", 80L, "s4")
    ).toDF("rk", "rt", "sid")
    val got = asof(left, right)
      .select($"pid", $"sid")
      .collect().map(r => r.getString(0) ->
        (if (r.isNullAt(1)) null else r.getString(1))).toMap
    assert(got == Map("p1" -> "s2", "p2" -> null, "p3" -> "s3", "p4" -> null),
      s"unexpected matches: $got")
  }

  test("as-of join with null keys/timestamps matches nothing") {
    import spark.implicits._
    val left = Seq(
      (java.lang.Long.valueOf(1L), java.lang.Long.valueOf(100L), "p1"),
      (null.asInstanceOf[java.lang.Long], java.lang.Long.valueOf(100L), "p2"),
      (java.lang.Long.valueOf(1L), null.asInstanceOf[java.lang.Long], "p3")
    ).toDF("k", "t", "pid")
    val right = Seq(
      (java.lang.Long.valueOf(1L), java.lang.Long.valueOf(50L), "s1"),
      (null.asInstanceOf[java.lang.Long], java.lang.Long.valueOf(10L), "s2")
    ).toDF("rk", "rt", "sid")
    val got = asof(left, right)
      .select($"pid", $"sid")
      .collect().map(r => r.getString(0) ->
        (if (r.isNullAt(1)) null else r.getString(1))).toMap
    assert(got == Map("p1" -> "s1", "p2" -> null, "p3" -> null),
      s"unexpected matches: $got")
  }

  test("as-of join with mismatched key types fails planning cleanly") {
    import spark.implicits._
    val left = Seq((1L, 100L, "p1")).toDF("k", "t", "pid")
    val right = Seq(("1", 50L, "s1")).toDF("rk", "rt", "sid")
    val e = intercept[Exception] { asof(left, right).collect() }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("as-of join key types differ")),
      s"expected a clear type-mismatch error, got: $e")
  }

  test("as-of join matches window-rewrite semantics on random data") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val left = (1 to 300).map(i =>
      (rnd.nextInt(20).toLong, rnd.nextInt(1000).toLong, i.toLong))
      .toDF("k", "t", "pid")
    val right = (1 to 200).map(i =>
      (rnd.nextInt(20).toLong, rnd.nextInt(1000).toLong, i.toLong))
      .toDF("rk", "rt", "sid")
      // one right row per (key, ts) so the expected match is unique
      .groupBy($"rk", $"rt")
      .agg(org.apache.spark.sql.functions.max($"sid").as("sid"))

    val got = asof(left, right)
      .select($"pid", $"rt").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap

    val rightRows = right.collect().map(r => (r.getLong(0), r.getLong(1)))
    val leftRows = left.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    leftRows.foreach { case (k, t, pid) =>
      val expected = rightRows.filter(x => x._1 == k && x._2 <= t)
        .map(_._2).sorted.lastOption.getOrElse(-1L)
      assert(got(pid) == expected, s"pid=$pid k=$k t=$t: ${got(pid)} != $expected")
    }
  }
}
