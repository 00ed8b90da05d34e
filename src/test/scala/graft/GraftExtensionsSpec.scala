package graft

import org.apache.spark.sql.SparkSession

/** GraftExtensions installed into a REAL second session (Builder.create()
  * — getOrCreate() would return the suite's shared session and never apply
  * extensions). `spark.sql.extensions` is a STATIC SQL conf read from the
  * SparkContext at first-session startup, so with the suite's context
  * already running the conf route can't apply — the public
  * Builder.withExtensions hook installs the same class directly (in a real
  * deployment either works; the conf route is the spark-submit one). The
  * session shares the JVM's SparkContext; it is never stopped here because
  * stop() would kill that shared context. */
class GraftExtensionsSpec extends SparkSuite {

  private lazy val ext: SparkSession = {
    spark // force the shared session/context first
    SparkSession.builder()
      .master("local[4]")
      .withExtensions(new GraftExtensions())
      .config("spark.sql.shuffle.partitions", "4")
      .create()
  }

  test("dot_product is a SQL function in the extension session") {
    val d = ext.sql("SELECT dot_product(array(1d,2d), array(3d,4d)) AS d")
      .head().getDouble(0)
    assert(d == 11.0, s"dot_product: $d")
    // and absent from the shared session (injection is session-scoped)
    val e = intercept[Exception] {
      spark.sql("SELECT dot_product(array(1d), array(1d))").collect()
    }
    assert(e.getMessage.toLowerCase.contains("dot_product"))
  }

  test("norm_diff forms agree in SQL") {
    val r = ext.sql(
      "SELECT norm_diff(3d, 1d) AS a, norm_diff_cg(3d, 1d) AS b").head()
    assert(r.getDouble(0) == 0.5 && r.getDouble(1) == 0.5)
  }

  test("shingles generator emits one row per n-gram") {
    val rows = ext.sql("SELECT shingles('a b c d', 3) AS s")
      .collect().map(_.getString(0))
    assert(rows.toSeq == Seq("a b c", "b c d"))
  }

  test("pow(x,2) rewrite fires in the extension session's optimizer") {
    val opt = ext.range(3).selectExpr("pow(CAST(id AS DOUBLE), 2.0) AS p")
      .queryExecution.optimizedPlan.toString
    assert(!opt.contains("POWER") && !opt.contains("pow("),
      s"pow survived optimization:\n$opt")
  }

  test("window-top-k rewrites to the heap operator via the injected rule (mid-fixpoint)") {
    import ext.implicits._
    import org.apache.spark.sql.functions._
    val df = Seq((1, 10.0, 1L), (1, 30.0, 2L), (1, 20.0, 3L),
      (2, 5.0, 4L), (2, 15.0, 5L)).toDF("g", "v", "id")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"g").orderBy($"v".desc, $"id")
    val top = df.withColumn("rn", row_number().over(w))
      .filter($"rn" <= 2).drop("rn").orderBy($"g", $"v".desc, $"id")
    val p = top.queryExecution.executedPlan.toString
    assert("TopKPerGroup".r.findAllIn(p).size == 2,
      s"injected RewriteWindowTopK did not fire:\n$p")
    assert(!p.contains("Window"), s"Window survived:\n$p")
    assert(top.collect().map(r => (r.getInt(0), r.getDouble(1))).toSeq ==
      Seq((1, 30.0), (1, 20.0), (2, 15.0), (2, 5.0)))
  }

  test("injected analyzer/optimizer rules cost < 5ms per query analysis (r15 verdict measurement pin)") {
    // the r15 VERDICT asked whether the hint-batch rules (GraftViewRules,
    // GraftTableChangesRule) tax every query's analysis. They run only in
    // extension sessions (the shared Bench session never installs them),
    // but even where installed the no-match traversal must stay ~free:
    // analyze a representative multi-operator query N times in the
    // extension session and the plain session and bound the delta.
    def analyzeOnce(s: SparkSession): Unit = {
      val df = s.range(0, 10).selectExpr("id AS k", "id * 2 AS v")
        .groupBy("k").count().filter("count > 0").orderBy("k")
      df.queryExecution.optimizedPlan // force analysis + optimization
      ()
    }
    def timed(s: SparkSession, n: Int): Double = {
      (1 to 20).foreach(_ => analyzeOnce(s)) // warm
      val t0 = System.nanoTime()
      (1 to n).foreach(_ => analyzeOnce(s))
      (System.nanoTime() - t0) / 1e6 / n
    }
    val plainMs = timed(spark, 200)
    val extMs = timed(ext, 200)
    info(f"analysis per query: plain $plainMs%.3f ms, extensions $extMs%.3f ms")
    assert(extMs - plainMs < 5.0,
      f"injected rules cost ${extMs - plainMs}%.3f ms/query (budget 5ms)")
  }

  test("as-of join plans via the injected strategy (no experimental hook)") {
    import ext.implicits._
    val left = Seq((1L, 100L, "p1"), (2L, 10L, "p2")).toDF("k", "t", "pid")
    val right = Seq((1L, 50L, "s1"), (2L, 40L, "s2")).toDF("rk", "rt", "sid")
    val lp = left.queryExecution.analyzed
    val rp = right.queryExecution.analyzed
    def attr(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan, n: String) =
      p.output.find(_.name == n).get
    assert(!ext.experimental.extraStrategies.contains(graft.plans.AsOfJoinStrategy))
    val got = org.apache.spark.sql.graft.GraftSql.ofRows(ext,
      graft.plans.AsOfJoinPlan(lp, rp,
        attr(lp, "k"), attr(rp, "rk"), attr(lp, "t"), attr(rp, "rt")))
      .select($"pid", $"sid")
      .collect().map(r => r.getString(0) ->
        (if (r.isNullAt(1)) null else r.getString(1))).toMap
    assert(got == Map("p1" -> "s1", "p2" -> null), s"unexpected: $got")
  }
}
