package graft

import org.apache.spark.sql.functions._

/** Error-bound evidence for the oracle-exempt sketch queries (Sketches.scala)
  * and the recall bound for the oracle-exempt LSH ANN query — the same
  * treatment q_agg_hll got in round 1: DuckDB cannot reproduce sketch
  * internals, so the exact computation is the in-suite oracle instead. */
class SketchesSpec extends SparkSuite {

  test("q_agg_hllsketch estimates within 5% of exact per group, union sane") {
    import spark.implicits._
    val rows = SparkEntry.queries("q_agg_hllsketch")(spark, sfDir).collect()
    // exact countDistinct lives HERE, not in the declared query — the bench
    // must measure the sketch path, not the scan the sketch exists to avoid
    val exactByFlag = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .groupBy($"l_returnflag").agg(countDistinct($"l_partkey").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1).toDouble).toMap
    val groups = rows.filter(_.getString(0) != "ALL")
    assert(groups.nonEmpty)
    groups.foreach { r =>
      val est = r.getLong(1).toDouble
      val exact = exactByFlag(r.getString(0))
      assert(math.abs(est - exact) / exact <= 0.05,
        s"HLL ${r.getString(0)}: est $est vs exact $exact")
    }
    // the union of per-group sketches must cover at least the largest group
    // and at most the sum of the groups
    val union = rows.find(_.getString(0) == "ALL").get.getLong(1).toDouble
    val exacts = exactByFlag.values.toSeq
    assert(union >= exacts.max * 0.95 && union <= exacts.sum * 1.05,
      s"HLL union $union outside [${exacts.max}, ${exacts.sum}]")
  }

  test("q_agg_kll quantiles land within the ±5%-rank window of exact") {
    import spark.implicits._
    val rows = SparkEntry.queries("q_agg_kll")(spark, sfDir).collect()
    val exactWindows = spark.read.parquet(s"$sfDir/orders.parquet")
      .select($"o_orderpriority", $"o_totalprice".cast("double").as("p"))
      .groupBy($"o_orderpriority")
      .agg(expr("percentile(p, 0.45)").as("lo50"), expr("percentile(p, 0.55)").as("hi50"),
        expr("percentile(p, 0.85)").as("lo90"), expr("percentile(p, 0.95)").as("hi90"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4))).toMap
    rows.foreach { r =>
      val (lo50, hi50, lo90, hi90) = exactWindows(r.getString(0))
      val (kll50, kll90) = (r.getDouble(1), r.getDouble(2))
      assert(kll50 >= lo50 && kll50 <= hi50,
        s"KLL p50 ${r.getString(0)}: $kll50 outside [$lo50, $hi50]")
      assert(kll90 >= lo90 && kll90 <= hi90,
        s"KLL p90 ${r.getString(0)}: $kll90 outside [$lo90, $hi90]")
    }
  }

  test("q_agg_kll cross-parallelism drift stays inside the rank-error bound (permanent exemption rationale)") {
    // KLL is merge-order-sensitive BY CONSTRUCTION (compaction decisions
    // depend on insertion/merge order), and Spark's partial-agg merge
    // order varies with parallelism — so q_agg_kll is exempt from the
    // bit-exact oracle PERMANENTLY, not pending a fix: forcing a
    // deterministic merge order would mean single-partition aggregation,
    // which defeats the mergeable-sketch design the query demonstrates.
    // What IS guaranteed — and pinned here — is that any two
    // parallelism levels agree within twice the sketch's normalized
    // rank error (~1.65% at default k; 2 × 5%-rank window used below,
    // matching the oracle-replacement bound above).
    import spark.implicits._
    val src = spark.read.parquet(s"$sfDir/orders.parquet")
      .select($"o_orderpriority", $"o_totalprice".cast("double").as("p"))
    def quantiles(parts: Int): Map[String, (Double, Double)] =
      src.repartition(parts)
        .groupBy($"o_orderpriority")
        .agg(expr("kll_sketch_agg_double(p)").as("sk"))
        .select($"o_orderpriority",
          expr("kll_sketch_get_quantile_double(sk, 0.5)").as("k50"),
          expr("kll_sketch_get_quantile_double(sk, 0.9)").as("k90"))
        .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val exact = src.groupBy($"o_orderpriority")
      .agg(expr("percentile(p, 0.40)").as("lo50"), expr("percentile(p, 0.60)").as("hi50"),
        expr("percentile(p, 0.80)").as("lo90"), expr("percentile(p, 0.97)").as("hi90"))
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    val (q2, q16) = (quantiles(2), quantiles(16))
    exact.keys.foreach { g =>
      val (lo50, hi50, lo90, hi90) = exact(g)
      Seq(q2, q16).foreach { q =>
        assert(q(g)._1 >= lo50 && q(g)._1 <= hi50,
          s"$g p50 at some parallelism drifted outside the doubled rank window: ${q(g)._1}")
        assert(q(g)._2 >= lo90 && q(g)._2 <= hi90,
          s"$g p90 at some parallelism drifted outside the doubled rank window: ${q(g)._2}")
      }
    }
  }

  test("q_agg_theta estimates within 5% of exact; intersection bounded") {
    import spark.implicits._
    val rows = SparkEntry.queries("q_agg_theta")(spark, sfDir).collect()
    val exactByFlag = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .withColumn("returned", ($"l_returnflag" === "R").cast("string"))
      .groupBy($"returned").agg(countDistinct($"l_suppkey").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1).toDouble).toMap
    val flags = rows.filter(_.getString(0) != "BOTH")
    flags.foreach { r =>
      val est = r.getLong(1).toDouble
      val exact = exactByFlag(r.getString(0))
      assert(math.abs(est - exact) / exact <= 0.05,
        s"theta ${r.getString(0)}: est $est vs exact $exact")
    }
    val inter = rows.find(_.getString(0) == "BOTH").get.getLong(1).toDouble
    assert(inter <= exactByFlag.values.min * 1.05,
      s"theta intersection $inter exceeds smallest set")
  }

  test("q_agg_topk equals the exact top-5 on a low-cardinality column") {
    import spark.implicits._
    val approx = SparkEntry.queries("q_agg_topk")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val exact = spark.read.parquet(s"$sfDir/orders.parquet")
      .groupBy($"o_orderpriority").agg(count(lit(1)).as("n"))
      .orderBy($"n".desc, $"o_orderpriority").limit(5)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    // 5 distinct priorities < maxItemsTracked, so the sketch is lossless
    assert(approx.toSeq == exact.toSeq,
      s"approx_top_k ${approx.toSeq} != exact ${exact.toSeq}")
  }

  test("q_agg_countmin: one-sided bound everywhere, exact on true heavy hitters") {
    import spark.implicits._
    val est = SparkEntry.queries("q_agg_countmin")(spark, sfDir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(explode(split($"text", " ")).as("w"))
      .filter(length($"w") > 0)
      .groupBy($"w").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // the CM guarantee: estimates never undercount
    est.foreach { case (w, e) =>
      assert(e >= exact(w), s"count-min undercounted '$w': $e < ${exact(w)}")
    }
    // the top exact heavy hitters must surface with near-exact counts:
    // at sf0.001 the vocabulary is far smaller than depth*width, so
    // collisions can inflate a bucket but the top words' estimates are
    // within the total collision mass of a single 512-bucket row
    val topExact = exact.toSeq.sortBy { case (w, n) => (-n, w) }.take(5)
    topExact.foreach { case (w, n) =>
      assert(est.contains(w) || est.size == 20,
        s"true heavy hitter '$w' missing from a <20-word result")
      est.get(w).foreach(e =>
        assert(e <= n + exact.values.sum / 512,
          s"'$w' estimate $e implausibly inflated vs exact $n"))
    }
  }

  test("q_dedup_embed_lsh recalls >= 0.9 of exact top-1 neighbors (sf0.01)") {
    val dir = sfSibling("0.01")
    val exact = SparkEntry.queries("q_dedup_embed")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val lsh = SparkEntry.queries("q_dedup_embed_lsh")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // if the true top-1 pair collides in any band, the LSH top-1 IS the
    // exact top-1 (exact cosine ranks the candidates), so top-1 agreement
    // measures candidate recall directly
    val hits = exact.count { case (v, n) => lsh.get(v).contains(n) }
    val recall = hits.toDouble / exact.size
    assert(recall >= 0.9, s"LSH ANN recall $recall < 0.9 (${hits}/${exact.size})")
  }
}
