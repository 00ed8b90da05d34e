package graft

import org.apache.spark.sql.SparkSession

/** Scratch phase-attribution probe for optimization work (round 19).
  * Not part of the driver contract; run ad hoc:
  *   SPARK_GRAFT_CPUS=32 sbt "runMain graft.Probe <sfDir> <what>"
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val what = args.drop(1).headOption.getOrElse("pagerank")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
    if (sys.env.get("PROBE_KRYO").contains("1"))
      builder.config("spark.serializer",
        "org.apache.spark.serializer.KryoSerializer")
    if (sys.env.get("PROBE_KRYO_STRICT").contains("1"))
      builder
        .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")
        .config("spark.kryo.registrationRequired", "true")
    if (sys.env.get("PROBE_KRYO_REG").contains("1"))
      builder
        .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")
        .config("spark.kryo.registrator", "graft.GraftKryoRegistrator")
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try SparkEntry.queries("q_scan_parquet")(spark, sfDir).count()
    catch { case scala.util.control.NonFatal(_) => }
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }
    what match {
      case s"plan:$q:$out" =>
        // dump explain("formatted") for a registry query (or an `old:`
        // reconstruction below) to a file — evidence for plans/r19/
        val df = q match {
          case "old_q_udtf" => oldQUdtf(spark, sfDir)
          case "old_edges" =>
            import org.apache.spark.sql.functions._
            import spark.implicits._
            val li = graft.ops.Util.table(spark, sfDir, "lineitem")
              .filter($"l_returnflag" === "R")
              .select($"l_orderkey", $"l_partkey")
            li.as("a").join(li.as("b"),
                $"a.l_orderkey" === $"b.l_orderkey" &&
                  $"a.l_partkey" < $"b.l_partkey")
              .select($"a.l_partkey".as("u"), $"b.l_partkey".as("v"))
              .distinct()
          case "new_edges" =>
            graft.ops.Util.coOrderPairs(spark, sfDir).distinct()
          case name => SparkEntry.queries(name)(spark, sfDir)
        }
        val w = new java.io.PrintWriter(out)
        try w.println(df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode).trim)
        finally w.close()
        println(s"[probe] wrote $out")
      case "scan_dups" =>
        // registry-wide duplicated-subtree census (round 20): for every
        // query, count parquet-scan leaves per input table in the
        // EXECUTED plan (inside InMemoryRelation builds too — a cache
        // fill still pays its scans once). A table appearing N≥2 times
        // means the plan re-derives a subtree N times; some are declared
        // (multi-pass operators), the rest are cache candidates.
        import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
        // count scan EXECUTIONS: a cached subtree's build runs once no
        // matter how many InMemoryTableScans consume it, so each distinct
        // InMemoryRelation is descended exactly once (dedup by identity)
        def leaves(p: org.apache.spark.sql.execution.SparkPlan,
                   seen: java.util.IdentityHashMap[AnyRef, AnyRef]): Seq[String] = {
          val direct = p.collect {
            case f: org.apache.spark.sql.execution.FileSourceScanExec =>
              Seq(f.relation.location.rootPaths.headOption
                .map(_.getName).getOrElse("?"))
            case i: InMemoryTableScanExec =>
              if (seen.containsKey(i.relation)) Seq.empty
              else { seen.put(i.relation, i.relation)
                leaves(i.relation.cachedPlan, seen) }
            case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
              leaves(a.executedPlan, seen)
          }
          direct.flatten
        }
        SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
          graft.ops.Util.unpersistRegistered()
          try {
            val df = fn(spark, sfDir)
            val ls = leaves(df.queryExecution.executedPlan,
              new java.util.IdentityHashMap[AnyRef, AnyRef])
            val byTable = ls.groupBy(identity).map { case (k, v) => (k, v.size) }
            val dups = byTable.filter(_._2 >= 2)
            if (dups.nonEmpty)
              println(s"[scan_dups] $name: " + dups.toSeq.sortBy(-_._2)
                .map { case (k, v) => s"$k x$v" }.mkString(", "))
          } catch { case scala.util.control.NonFatal(e) =>
            println(s"[scan_dups] $name FAILED: ${e.getMessage}")
          }
        }
      case "ab_triangles" =>
        // r20: SMJ vs shuffled-hash for the wedge-close joins (guide §3.1)
        import org.apache.spark.sql.functions._
        import spark.implicits._
        def shipped = SparkEntry.queries("q_graph_triangles")(spark, sfDir)
        def hinted = {
          val e = graft.ops.Util.cached(
            graft.ops.Util.coOrderPairs(spark, sfDir).distinct())
          e.as("e1").join(e.as("e2").hint("shuffle_hash"), $"e1.v" === $"e2.u")
            .join(e.as("e3").hint("shuffle_hash"),
              $"e1.u" === $"e3.u" && $"e2.v" === $"e3.v")
            .groupBy($"e1.u".as("u"))
            .agg(count(lit(1)).as("n_triangles"))
            .orderBy($"u")
        }
        t("warm shipped")(shipped.count())
        graft.ops.Util.unpersistRegistered()
        t("warm hinted")(hinted.count())
        graft.ops.Util.unpersistRegistered()
        (1 to 4).foreach { i =>
          graft.ops.Util.unpersistRegistered()
          t(s"shipped $i")(shipped.count())
          graft.ops.Util.unpersistRegistered()
          t(s"hinted  $i")(hinted.count())
        }
        val a = shipped.collect().toSeq
        graft.ops.Util.unpersistRegistered()
        val b = hinted.collect().toSeq
        println(s"[probe] parity ${a == b} (${a.size} rows)")
      case "pagerank" => probePagerank(spark, sfDir, t)
      case "ab_bigram" =>
        import org.apache.spark.sql.functions._
        import spark.implicits._
        // old vs new bigram_lm front end, identical downstream consumer
        def oldBig = graft.ops.Util.spread(
            graft.ops.Util.table(spark, sfDir, "documents"))
          .select($"doc_id", split($"text", " ").as("ws"))
          .filter(size($"ws") >= 2)
          .select($"doc_id", explode(transform(sequence(lit(1), size($"ws") - 1),
            i => struct(element_at($"ws", i).as("w1"),
              element_at($"ws", i + 1).as("w2")))).as("b"))
          .select($"doc_id", $"b.w1".as("w1"), $"b.w2".as("w2"))
        spark.sessionState.functionRegistry.createOrReplaceTempFunction(
          "bigrams2", exprs => graft.ops.WordPairGenerator(exprs.head), "scala_udf")
        def newBig = graft.ops.Util.spread(
            graft.ops.Util.table(spark, sfDir, "documents"))
          .selectExpr("doc_id", "bigrams2(text) AS (w1, w2)")
        (1 to 5).foreach { i =>
          t(s"old bigram explode run$i")(oldBig.count())
          t(s"new bigram explode run$i")(newBig.count())
        }
      case "ab_edges" =>
        import org.apache.spark.sql.functions._
        import spark.implicits._
        val li = graft.ops.Util.table(spark, sfDir, "lineitem")
          .filter($"l_returnflag" === "R")
          .select($"l_orderkey", $"l_partkey")
        def oldE = li.as("a").join(li.as("b"),
            $"a.l_orderkey" === $"b.l_orderkey" &&
              $"a.l_partkey" < $"b.l_partkey")
          .select($"a.l_partkey".as("u"), $"b.l_partkey".as("v"))
          .distinct()
        spark.sessionState.functionRegistry.createOrReplaceTempFunction(
          "opairs", exprs => graft.ops.SortedPairsGenerator(exprs.head), "scala_udf")
        def newE = li.groupBy($"l_orderkey")
          .agg(collect_list($"l_partkey").as("ps"))
          .selectExpr("opairs(ps) AS (u, v)")
          .distinct()
        (1 to 5).foreach { i =>
          t(s"old edges run$i")(oldE.count())
          t(s"new edges run$i")(newE.count())
        }
        // multiset parity (SSSP weights): compare weighted counts
        val a = oldQEdgesW(li).collect().toSet
        val b = li.groupBy($"l_orderkey")
          .agg(collect_list($"l_partkey").as("ps"))
          .selectExpr("opairs(ps) AS (u, v)")
          .groupBy($"u", $"v").count().collect().toSet
        println(s"[probe] weighted-parity: ${a == b} (${a.size} pairs)")
      case "ab_sympairs" =>
        import org.apache.spark.sql.functions._
        import spark.implicits._
        val words = graft.ops.Util.table(spark, sfDir, "documents")
          .select(explode(split($"text", " ")).as("w"))
          .groupBy($"w").agg(count(lit(1)).as("mult"))
          .select($"w",
            concat(lit(" "), regexp_replace($"w", "(.)", "$1 ")).as("s"),
            $"mult")
        def pairsOf(col: org.apache.spark.sql.Column) = {
          val syms = split(trim(col), " ")
          when(size(syms) >= 2,
            transform(sequence(lit(1), size(syms) - 1),
              i => concat(element_at(syms, i), lit(" "), element_at(syms, i + 1))))
            .otherwise(array())
        }
        spark.sessionState.functionRegistry.createOrReplaceTempFunction(
          "sympairs", exprs => graft.ops.WordWindowGenerator(exprs.head, 2), "scala_udf")
        def oldP = words.select(explode(pairsOf($"s")).as("pair"), $"mult")
          .groupBy($"pair").agg(sum($"mult").as("cnt"))
        def newP = words.selectExpr("sympairs(trim(s)) AS pair", "mult")
          .groupBy($"pair").agg(sum($"mult").as("cnt"))
        (1 to 5).foreach { i =>
          t(s"old sympairs run$i")(oldP.count())
          t(s"new sympairs run$i")(newP.count())
        }
        val pa = oldP.collect().map(r => (r.getString(0), r.getLong(1))).toSet
        val pb = newP.collect().map(r => (r.getString(0), r.getLong(1))).toSet
        println(s"[probe] sympairs parity: ${pa == pb} (${pa.size} pairs)")
      case "ab_kmeans" =>
        import org.apache.spark.ml.clustering.KMeans
        import org.apache.spark.ml.functions.array_to_vector
        import spark.implicits._
        val e0 = graft.ops.Util.table(spark, sfDir, "embeddings")
          .select($"vec_id", $"label", array_to_vector($"embedding").as("features"))
        println(s"[probe] input partitions: ${e0.rdd.getNumPartitions}, rows: ${e0.count()}")
        val eSpread = e0.repartition(spark.sparkContext.defaultParallelism)
        (1 to 3).foreach { i =>
          t(s"fit 1-split run$i") {
            new KMeans().setK(10).setSeed(7L).setMaxIter(20)
              .setFeaturesCol("features").setPredictionCol("cluster")
              .fit(e0); 1L
          }
          t(s"fit spread run$i") {
            new KMeans().setK(10).setSeed(7L).setMaxIter(20)
              .setFeaturesCol("features").setPredictionCol("cluster")
              .fit(eSpread); 1L
          }
        }
      case "ab_pr" =>
        import org.apache.spark.sql.functions._
        import spark.implicits._
        val e1 = graft.ops.Util.coOrderPairs(spark, sfDir).distinct()
        val e1c = graft.ops.Util.cached(e1)
        val nEdges = e1c.count() * 2
        val part = new org.apache.spark.HashPartitioner(
          math.max(1, math.min(spark.sparkContext.defaultParallelism,
            (nEdges / 65536 + 1).toInt)))
        val und = graft.ops.Util.cachedRdd(e1c.as[(Long, Long)].rdd
          .flatMap { case (u, v) => Seq((u, v), (v, u)) }
          .partitionBy(part))
        val deg = und.mapValues(_ => 1L).reduceByKey(part, _ + _)
        val ed = graft.ops.Util.cachedRdd(und.join(deg, part))
        val n = deg.count()
        val base = 0.15 / n
        // variant B: per-partition adjacency arrays (u, deg, targets),
        // zipped against the co-partitioned rank map each superstep
        val adj = graft.ops.Util.cachedRdd(ed.mapPartitions({ it =>
          val m = new java.util.HashMap[Long, (Long, scala.collection.mutable.ArrayBuffer[Long])]()
          var degSum = 0L
          it.foreach { case (u, (v, dg)) =>
            val cur = m.get(u)
            val buf = if (cur == null) {
              val b = (dg, scala.collection.mutable.ArrayBuffer.empty[Long])
              m.put(u, b); b
            } else cur
            buf._2 += v
          }
          val arr = new Array[(Long, Long, Array[Long])](m.size)
          val mit = m.entrySet().iterator()
          var i = 0
          while (mit.hasNext) {
            val e = mit.next()
            arr(i) = (e.getKey, e.getValue._1, e.getValue._2.toArray)
            i += 1
          }
          Iterator.single(arr)
        }, preservesPartitioning = true))
        adj.count()
        def runA(): Long = {
          var ranks = deg.mapValues(_ => 1.0 / n)
          (1 to 5).foreach { _ =>
            val contribs = ed.join(ranks, part).map { case (_, ((v, dg), r)) =>
              (v, math.floor(r / dg * 1e12).toLong)
            }
            ranks = contribs.reduceByKey(part, _ + _)
              .mapValues(sq => base + 0.85 * (sq.toDouble / 1e12))
          }
          ranks.toDF("node", "rank").orderBy($"node").count()
        }
        def runB(): Long = {
          var ranks = deg.mapValues(_ => 1.0 / n)
          (1 to 5).foreach { _ =>
            val contribs = adj.zipPartitions(ranks) {
              (ait, rit) =>
                val arr = ait.next()
                val rm = new java.util.HashMap[Long, Double]()
                rit.foreach { case (k, r) => rm.put(k, r) }
                val out = new java.util.HashMap[Long, Long]()
                arr.foreach { case (u, dg, targets) =>
                  val r = rm.get(u)
                  val c = math.floor(r / dg * 1e12).toLong
                  var i = 0
                  while (i < targets.length) {
                    val t = targets(i)
                    out.put(t, out.getOrDefault(t, 0L) + c)
                    i += 1
                  }
                }
                val b = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
                val oit = out.entrySet().iterator()
                while (oit.hasNext) { val e = oit.next(); b += ((e.getKey, e.getValue)) }
                b.iterator
            }
            ranks = contribs.reduceByKey(part, _ + _)
              .mapValues(sq => base + 0.85 * (sq.toDouble / 1e12))
          }
          ranks.toDF("node", "rank").orderBy($"node").count()
        }
        (1 to 4).foreach { i =>
          t(s"supersteps A (cogroup) run$i")(runA())
          t(s"supersteps B (zip-adj) run$i")(runB())
        }
        // result parity
        def fin(): Seq[(Long, Double)] = {
          var ranks = deg.mapValues(_ => 1.0 / n)
          (1 to 5).foreach { _ =>
            val contribs = ed.join(ranks, part).map { case (_, ((v, dg), r)) =>
              (v, math.floor(r / dg * 1e12).toLong)
            }
            ranks = contribs.reduceByKey(part, _ + _)
              .mapValues(sq => base + 0.85 * (sq.toDouble / 1e12))
          }
          ranks.collect().sorted.toSeq
        }
        val ra = fin()
        var ranksB = deg.mapValues(_ => 1.0 / n)
        (1 to 5).foreach { _ =>
          val contribs = adj.zipPartitions(ranksB) {
            (ait, rit) =>
              val arr = ait.next()
              val rm = new java.util.HashMap[Long, Double]()
              rit.foreach { case (k, r) => rm.put(k, r) }
              val out = new java.util.HashMap[Long, Long]()
              arr.foreach { case (u, dg, targets) =>
                val r = rm.get(u)
                val c = math.floor(r / dg * 1e12).toLong
                var i = 0
                while (i < targets.length) {
                  val t = targets(i); out.put(t, out.getOrDefault(t, 0L) + c); i += 1
                }
              }
              val b = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
              val oit = out.entrySet().iterator()
              while (oit.hasNext) { val e = oit.next(); b += ((e.getKey, e.getValue)) }
              b.iterator
          }
          ranksB = contribs.reduceByKey(part, _ + _)
            .mapValues(sq => base + 0.85 * (sq.toDouble / 1e12))
        }
        val rb = ranksB.collect().sorted.toSeq
        println(s"[probe] pagerank parity: ${ra == rb} (a=${ra.size} b=${rb.size} nodes)")
        if (ra != rb) {
          val bm = rb.toMap
          var shown = 0
          ra.foreach { case (k, v) =>
            if (shown < 5 && bm.get(k) != Some(v)) {
              println(s"[probe] diff node $k: a=$v b=${bm.get(k)}")
              shown += 1
            }
          }
          val am = ra.toMap
          rb.take(3).foreach { case (k, v) =>
            if (!am.contains(k)) println(s"[probe] extra node in b: $k")
          }
        }
      case "ab_embcast" =>
        import org.apache.spark.sql.functions._
        import spark.implicits._
        // q_dedup_embed with the OLD transform-cast emb() vs the registry
        def embOld = graft.ops.Util.table(spark, sfDir, "embeddings")
          .select($"vec_id", $"label",
            transform($"embedding", x => x.cast("double")).as("emb"))
        def oldQ = {
          val e = embOld
          val scored = e.as("a").join(e.as("b"),
              $"a.label" === $"b.label" && $"a.vec_id" =!= $"b.vec_id")
            .select($"a.vec_id".as("vec_id"), $"b.vec_id".as("neighbor_id"),
              round(graft.ops.Util.dot($"a.emb", $"b.emb"), 4).as("score"))
          val w = org.apache.spark.sql.expressions.Window
            .partitionBy($"vec_id").orderBy($"score".desc, $"neighbor_id")
          scored.withColumn("rn", row_number().over(w))
            .filter($"rn" === 1)
            .select($"vec_id", $"neighbor_id", $"score",
              ($"score" >= 0.95).as("is_near_dup"))
            .orderBy($"vec_id")
        }
        (1 to 5).foreach { i =>
          t(s"old emb transform-cast run$i")(oldQ.count())
          t(s"new emb native-cast run$i")(
            SparkEntry.queries("q_dedup_embed")(spark, sfDir).count())
        }
      case "ab_udtf" =>
        (1 to 5).foreach { i =>
          t(s"old q_udtf run$i")(oldQUdtf(spark, sfDir).count())
          t(s"new q_udtf run$i")(
            SparkEntry.queries("q_udtf")(spark, sfDir).count())
        }
      case s"jobs:$qn" => // r20: wall vs job-wall vs task-time attribution
        val jobs = new java.util.concurrent.atomic.AtomicInteger
        val jobNanos = new java.util.concurrent.atomic.AtomicLong
        val taskMs = new java.util.concurrent.atomic.AtomicLong
        val starts = new java.util.concurrent.ConcurrentHashMap[Integer, java.lang.Long]()
        val l = new org.apache.spark.scheduler.SparkListener {
          override def onJobStart(e: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
            jobs.incrementAndGet(); starts.put(e.jobId, System.nanoTime()); () }
          override def onJobEnd(e: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
            Option(starts.remove(e.jobId)).foreach(t0 =>
              jobNanos.addAndGet(System.nanoTime() - t0)); () }
          override def onTaskEnd(e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
            if (e.taskInfo != null) { taskMs.addAndGet(e.taskInfo.duration); () } }
        }
        spark.sparkContext.addSparkListener(l)
        val fn = SparkEntry.queries(qn)
        (1 to 5).foreach { i =>
          graft.ops.Util.unpersistRegistered()
          jobs.set(0); jobNanos.set(0); taskMs.set(0)
          val t0 = System.nanoTime()
          fn(spark, sfDir).count()
          val wall = (System.nanoTime() - t0) / 1e9
          Thread.sleep(400) // listener bus drains async
          println(f"[probe] $qn run$i wall $wall%7.3f s  jobs=${jobs.get}%3d  " +
            f"jobWall=${jobNanos.get / 1e9}%7.3f s  taskTime=${taskMs.get / 1e3}%7.3f s")
        }
      case "ab_suffix" => // r20: bloom pre-pass on dup windows vs shipped
        import org.apache.spark.sql.functions._
        import spark.implicits._
        def bloomVariant: org.apache.spark.sql.DataFrame = {
          val L = 40
          val docs = graft.ops.Util.table(spark, sfDir, "documents")
            .select($"doc_id", $"text")
          def spreadDocs = docs
            .repartition(spark.sparkContext.defaultParallelism)
            .filter(length($"text") >= L)
            .select($"doc_id", $"text",
              explode(sequence(lit(0L), (length($"text") - L).cast("long")))
                .as("pos"))
          val window = expr(s"substring(text, CAST(pos + 1 AS INT), $L)")
          // pass A: hash-only duplicate detection — one exchange of
          // (8-byte hash, count) rows with map-side partial agg
          val dupH = graft.ops.Util.cached(
            spreadDocs.select(xxhash64(window).as("h"))
              .groupBy($"h").count().filter($"count" >= 2).select($"h"))
          val nd = dupH.count()
          val bf = dupH.stat.bloomFilter("h", math.max(nd, 1L), 0.01)
          val bytes = {
            val bos = new java.io.ByteArrayOutputStream()
            bf.writeTo(bos); bos.toByteArray
          }
          val keyed = spreadDocs.select($"doc_id", $"pos", window.as("k"))
          import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
          val mc = org.apache.spark.sql.graft.GraftSql.column(
            BloomFilterMightContain(
              Literal(bytes, org.apache.spark.sql.types.BinaryType),
              org.apache.spark.sql.graft.GraftSql.expression(xxhash64($"k"))))
          val surv = keyed.filter(mc)
          val dp = surv
            .withColumn("salt",
              pmod(xxhash64($"doc_id", $"pos"), lit(64L)).cast("int"))
            .groupBy($"k", $"salt")
            .agg(collect_list(struct($"doc_id", $"pos")).as("ps"),
              count(lit(1)).as("cp"))
            .withColumn("c", sum($"cp").over(
              org.apache.spark.sql.expressions.Window.partitionBy($"k")))
            .filter($"c" >= 2)
            .select(explode($"ps").as("p"))
            .select($"p.doc_id".as("doc_id"), $"p.pos".as("pos"))
          val wI = org.apache.spark.sql.expressions.Window
            .partitionBy($"doc_id").orderBy($"pos")
          dp.withColumn("isl", $"pos" - row_number().over(wI))
            .groupBy($"doc_id", $"isl")
            .agg(min($"pos").as("start_pos"),
              (max($"pos") - min($"pos") + L).as("rep_len"))
            .select($"doc_id", $"start_pos".cast("long").as("start_pos"),
              $"rep_len".cast("long").as("rep_len"))
            .orderBy($"doc_id", $"start_pos")
        }
        val a = SparkEntry.queries("q_dedup_suffix")(spark, sfDir)
          .collect().map(_.toString).toSeq
        graft.ops.Util.unpersistRegistered()
        val b = bloomVariant.collect().map(_.toString).toSeq
        println(s"[probe] parity: ${a == b} (${a.size} vs ${b.size} rows)")
        (1 to 5).foreach { i =>
          graft.ops.Util.unpersistRegistered()
          t(s"old suffix run$i")(
            SparkEntry.queries("q_dedup_suffix")(spark, sfDir).count())
          graft.ops.Util.unpersistRegistered()
          t(s"new suffixBloom run$i")(bloomVariant.count())
        }
      case s"stages:$qn" => // r20: top stages by cumulative task time
        val stageTime = new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()
        val stageTasks = new java.util.concurrent.ConcurrentHashMap[String, Integer]()
        val shuffleBytes = new java.util.concurrent.atomic.AtomicLong()
        val l = new org.apache.spark.scheduler.SparkListener {
          override def onStageCompleted(
              e: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
            val si = e.stageInfo
            val key = si.name.take(120)
            val ms = si.taskMetrics.executorRunTime
            stageTime.merge(key, ms, (a, b) => a + b)
            stageTasks.merge(key, si.numTasks, (a, b) => a + b)
            shuffleBytes.addAndGet(si.taskMetrics.shuffleWriteMetrics.bytesWritten)
            ()
          }
        }
        spark.sparkContext.addSparkListener(l)
        val fn = SparkEntry.queries(qn)
        fn(spark, sfDir).count() // warm/fixture pass
        graft.ops.Util.unpersistRegistered()
        stageTime.clear(); stageTasks.clear()
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        val wall = (System.nanoTime() - t0) / 1e9
        Thread.sleep(600)
        println(f"[probe] $qn wall $wall%.3f s shuffleWrite=${shuffleBytes.get}%d B; top stages by executorRunTime:")
        import scala.jdk.CollectionConverters._
        stageTime.asScala.toSeq.sortBy(-_._2).take(12).foreach { case (k, ms) =>
          println(f"[probe]   ${ms / 1e3}%8.3f s  tasks=${stageTasks.get(k)}%4d  $k")
        }
      case "ab_dupgrams" => // r20: join-free n_dup = n_grams - n_globally_unique
        import org.apache.spark.sql.functions._
        import spark.implicits._
        def newVariant: org.apache.spark.sql.DataFrame = {
          spark.sessionState.functionRegistry.createOrReplaceTempFunction(
            "shingles8", exprs => graft.ops.ShingleGenerator(exprs.head, 8),
            "scala_udf")
          val grams = graft.ops.Util.spread(
              graft.ops.Util.table(spark, sfDir, "documents"))
            .selectExpr("doc_id", "shingles8(text) AS g")
            .distinct()
            .transform(graft.ops.Util.cached)
          // a doc-frequency-1 gram has exactly ONE (doc_id, g) row, so
          // min(doc_id) over its group IS its owning doc — the per-doc
          // unique-gram count needs no join back to the gram table
          val uniqPerDoc = grams.groupBy($"g")
            .agg(count(lit(1)).as("nd"), min($"doc_id").as("d"))
            .filter($"nd" === 1)
            .groupBy($"d").agg(count(lit(1)).as("n_uniq"))
          val totPerDoc = grams.groupBy($"doc_id")
            .agg(count(lit(1)).as("n_grams"))
          totPerDoc.join(uniqPerDoc, $"doc_id" === $"d", "left")
            .select($"doc_id", $"n_grams",
              ($"n_grams" - coalesce($"n_uniq", lit(0L))).as("n_dup"))
            .withColumn("dup_frac",
              round($"n_dup".cast("double") / $"n_grams", 6))
            .select($"doc_id", $"n_grams", $"n_dup", $"dup_frac")
            .orderBy($"doc_id")
        }
        val a = SparkEntry.queries("q_text_dupgrams")(spark, sfDir)
          .collect().map(_.toString).toSeq
        graft.ops.Util.unpersistRegistered()
        val b = newVariant.collect().map(_.toString).toSeq
        println(s"[probe] parity: ${a == b} (${a.size} vs ${b.size} rows)")
        if (a != b) a.zip(b).filter(x => x._1 != x._2).take(3).foreach(x =>
          println(s"[probe] diff: ${x._1} vs ${x._2}"))
        (1 to 5).foreach { i =>
          graft.ops.Util.unpersistRegistered()
          t(s"old dupgrams run$i")(
            SparkEntry.queries("q_text_dupgrams")(spark, sfDir).count())
          graft.ops.Util.unpersistRegistered()
          t(s"new dupgrams run$i")(newVariant.count())
        }
      case "ab_perplex" => // r20: single-pass bigram model via (doc,w1,w2) pre-agg
        import org.apache.spark.sql.functions._
        import spark.implicits._
        def newVariant: org.apache.spark.sql.DataFrame = {
          val d = graft.ops.Util.table(spark, sfDir, "documents")
          spark.sessionState.functionRegistry.createOrReplaceTempFunction(
            "bigrams2", exprs => graft.ops.WordPairGenerator(exprs.head),
            "scala_udf")
          val bigDoc = graft.ops.Util.cached(
            graft.ops.Util.spread(d)
              .selectExpr("doc_id", "bigrams2(text) AS (w1, w2)")
              .groupBy($"doc_id", $"w1", $"w2").agg(count(lit(1)).as("c")))
          val cnt = bigDoc.groupBy($"w1", $"w2").agg(sum($"c").as("c12"))
          val ctx = cnt.groupBy($"w1").agg(sum($"c12").as("c1"))
          val model = cnt.join(ctx, "w1")
            .select($"w1", $"w2",
              round(-log($"c12".cast("double") / $"c1"), 8)
                .cast("decimal(18,8)").as("nll"))
          val scored = bigDoc.join(broadcast(model), Seq("w1", "w2"))
            .groupBy($"doc_id")
            .agg(sum($"nll" * $"c".cast("decimal(10,0)")).as("tot_nll"),
              sum($"c").as("n_bigrams"))
            .withColumn("tot_nll", $"tot_nll".cast("decimal(28,8)"))
            .withColumn("avg_nll", $"tot_nll".cast("double") / $"n_bigrams")
            .join(d.select($"doc_id", $"lang"), "doc_id")
          graft.ops.DistRank.rowNumberInGroup(scored, Seq.empty,
              Seq($"avg_nll", $"doc_id"), $"avg_nll", "rn", Some("n_docs"))
            .filter($"rn" * 10 <= $"n_docs" * 7)
            .groupBy($"lang")
            .agg(count(lit(1)).as("n_kept"),
              sum($"n_bigrams").as("sum_bigrams"),
              sum($"tot_nll").cast("double").as("sum_nll"))
            .orderBy($"lang")
        }
        val a = SparkEntry.queries("q_curate_perplexity")(spark, sfDir)
          .collect().map(_.toString).toSeq
        graft.ops.Util.unpersistRegistered()
        val b = newVariant.collect().map(_.toString).toSeq
        println(s"[probe] parity: ${a == b} (${a.size} vs ${b.size} rows)")
        if (a != b) a.zip(b).filter(x => x._1 != x._2).take(3).foreach(x =>
          println(s"[probe] diff: ${x._1} vs ${x._2}"))
        (1 to 5).foreach { i =>
          graft.ops.Util.unpersistRegistered()
          t(s"old perplexity run$i")(
            SparkEntry.queries("q_curate_perplexity")(spark, sfDir).count())
          graft.ops.Util.unpersistRegistered()
          t(s"new perplexity run$i")(newVariant.count())
        }
      case "upsert_phases" => // r20: attribute q_stream_upsert's driver gap
        import org.apache.spark.sql.functions._
        (1 to 4).foreach { round =>
          val s2 = spark.newSession()
          import s2.implicits._
          val root = graft.ops.Util.managedTempDir("graft_probe_upsert_")
          s2.conf.set("spark.sql.catalog.graftpu", "graft.sources.GraftCatalog")
          s2.conf.set("spark.sql.catalog.graftpu.root", root)
          s2.conf.set("spark.sql.shuffle.partitions", "4")
          s2.conf.set("spark.sql.adaptive.enabled", "false")
          s2.conf.set("spark.sql.optimizer.runtime.rowLevelOperationGroupFilter.enabled", "false")
          s2.sql("""CREATE TABLE graftpu.u AS
            |SELECT CAST(0 AS BIGINT) AS k, CAST(0 AS BIGINT) AS id
            |WHERE 1 = 0""".stripMargin)
          var aggNs = 0L; var mergeNs = 0L; var batches = 0
          val t0 = System.nanoTime()
          val q = s2.readStream.format("graft.sources.SynthSource")
            .option("rows", "20000").option("slices", "4")
            .option("microBatchRows", "4096")
            .load()
            .writeStream
            .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
              batches += 1
              val a0 = System.nanoTime()
              val up = batch.groupBy(($"id" % 1000).as("k"))
                .agg(max($"id").as("id")).persist()
              up.count() // materialize now so agg vs merge attribute cleanly
              aggNs += System.nanoTime() - a0
              try {
                up.createOrReplaceTempView("up_batch_probe")
                val m0 = System.nanoTime()
                up.sparkSession.sql(
                  """MERGE INTO graftpu.u t USING up_batch_probe s ON t.k = s.k
                    |WHEN MATCHED AND s.id > t.id THEN UPDATE SET id = s.id
                    |WHEN NOT MATCHED THEN INSERT (k, id) VALUES (s.k, s.id)""".stripMargin)
                mergeNs += System.nanoTime() - m0
              } finally { up.unpersist(blocking = false); () }
              ()
            }
            .option("checkpointLocation", graft.ops.Util.managedTempDir("graft_probe_upsck_"))
            .start()
          try q.processAllAvailable() finally q.stop()
          val wall = (System.nanoTime() - t0) / 1e9
          println(f"[probe] upsert round$round wall $wall%6.3f s  batches=$batches  " +
            f"agg=${aggNs / 1e9}%6.3f s  merge=${mergeNs / 1e9}%6.3f s  " +
            f"stream-machinery=${wall - (aggNs + mergeNs) / 1e9}%6.3f s")
        }
      case q => // generic: run the registry query N times, min
        val fn = SparkEntry.queries(q)
        (1 to 6).foreach { i =>
          graft.ops.Util.unpersistRegistered()
          t(s"$q run$i")(fn(spark, sfDir).count())
        }
    }
    spark.stop()
  }

  private def oldQEdgesW(li: org.apache.spark.sql.DataFrame) = {
    val s = li.sparkSession
    import org.apache.spark.sql.functions._
    import s.implicits._
    li.as("a").join(li.as("b"),
        $"a.l_orderkey" === $"b.l_orderkey" &&
          $"a.l_partkey" < $"b.l_partkey")
      .groupBy($"a.l_partkey".as("u"), $"b.l_partkey".as("v"))
      .agg(count(lit(1)).as("count"))
  }

  /** q_udtf's round-18 HOF formulation, kept verbatim for before/after
    * plan evidence and A/B timing (`old_q_udtf`). */
  private def oldQUdtf(s: SparkSession, dir: String) = {
    import org.apache.spark.sql.functions._
    import s.implicits._
    val ws = split($"text", " ")
    val sh = when(size(ws) >= 3,
      transform(sequence(lit(1), size(ws) - 2),
        i => concat_ws(" ", slice(ws, i, lit(3))))).otherwise(array())
    graft.ops.Util.spread(graft.ops.Util.table(s, dir, "documents"))
      .select($"doc_id", sh.as("sh"))
      .filter(size($"sh") > 0)
      .select($"doc_id",
        size($"sh").cast("long").as("n_shingles"),
        size(array_distinct($"sh")).cast("long").as("n_distinct"))
      .orderBy($"doc_id")
  }

  private def probePagerank(s: SparkSession, dir: String,
      t: String => (=> Long) => Long): Unit = {
    import org.apache.spark.sql.functions._
    import s.implicits._
    (1 to 3).foreach { round =>
      graft.ops.Util.unpersistRegistered()
      println(s"[probe] --- pagerank round $round ---")
      val li = graft.ops.Util.table(s, dir, "lineitem")
        .filter($"l_returnflag" === "R")
        .select($"l_orderkey", $"l_partkey")
      val e1 = li.as("a").join(li.as("b"),
          $"a.l_orderkey" === $"b.l_orderkey" &&
            $"a.l_partkey" < $"b.l_partkey")
        .select($"a.l_partkey".as("u"), $"b.l_partkey".as("v"))
        .distinct()
      val e1c = graft.ops.Util.cached(e1)
      val nEdges = t("e1 build+count")(e1c.count()) * 2
      val perPart = sys.env.getOrElse("PROBE_EDGES_PER_PART", "65536").toLong
      val part = new org.apache.spark.HashPartitioner(
        math.max(1, math.min(s.sparkContext.defaultParallelism,
          (nEdges / perPart + 1).toInt)))
      println(s"[probe] partitions=${part.numPartitions} nEdges=$nEdges")
      val und = graft.ops.Util.cachedRdd(e1c.as[(Long, Long)].rdd
        .flatMap { case (u, v) => Seq((u, v), (v, u)) }
        .partitionBy(part))
      val deg = und.mapValues(_ => 1L).reduceByKey(part, _ + _)
      val ed = graft.ops.Util.cachedRdd(und.join(deg, part))
      val n = t("deg count (und+deg+ed mat)")(deg.count())
      val base = 0.15 / n
      var ranks = deg.mapValues(_ => 1.0 / n)
      val stepwise = sys.env.get("PROBE_STEPWISE").contains("1")
      (1 to 5).foreach { i =>
        val contribs = ed.join(ranks, part).map { case (_, ((v, dg), r)) =>
          (v, math.floor(r / dg * 1e12).toLong)
        }
        ranks = contribs.reduceByKey(part, _ + _)
          .mapValues(sq => base + 0.85 * (sq.toDouble / 1e12))
        if (stepwise) {
          graft.ops.Util.cachedRdd(ranks)
          t(s"superstep $i")(ranks.count())
        }
      }
      t(if (stepwise) "final toDF+orderBy" else "5 supersteps + toDF+orderBy") {
        ranks.toDF("node", "rank").orderBy($"node").count()
      }
    }
  }
}
