package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import Util._

/** Corpus-curation operators a training-data pipeline runs AFTER pairwise
  * dedup: duplicate-cluster resolution (connected components over the
  * near-dup graph), benchmark-contamination scoring, PII redaction, and
  * semantic clustering of the embedding space.
  *
  * Scale design: the connected-components loop is an iterative
  * equi-join that only ever touches the near-dup EDGE list (kilobytes per
  * million docs — never the corpus); contamination broadcasts the
  * benchmark shingle set (eval suites are tiny by construction); PII
  * redaction is a pure per-row projection; clustering is MLlib KMeans,
  * whose per-iteration cost is one map-side partial aggregation of
  * (cluster, sum, count) per partition.
  */
object Curation {

  /** Duplicate-CLUSTER resolution: connected components over the MinHash
    * near-dup pairs (q_dedup_near). Pairwise dedup alone under-deletes:
    * A~B and B~C put A,C in one transitive cluster even when
    * Jaccard(A,C) < 0.8, and a keeper must be chosen per CLUSTER, not per
    * pair. The fixpoint runs on GraphX (Pregel min-label propagation,
    * undirected; component id = min doc_id — deterministic under any
    * partitioning). Iterative algorithms are the one place DataFrames
    * lose: a DataFrame fixpoint loop was measured paying ~1 s/round of
    * pure Catalyst re-planning + whole-stage-codegen compilation (fresh
    * attribute ids every round), while GraphX keeps all rounds inside one
    * cached RDD lineage. The graph never holds the corpus — only the
    * near-dup EDGE list (kilobytes per million docs); at 100 TB rounds =
    * component diameter, and dup chains are shallow. */
  /** Connected-component labels (node, comp) over the near-dup graph —
    * the reusable core of qDedupConnected, also consumed by the composite
    * curation pipeline (q_pipeline_e2e) as its cluster-keeper stage. */
  private[graft] def ccLabels(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val pairs = cached(LlmOps.nearDupPairs(s, dir).select($"doc_a", $"doc_b"))
    // Hash-min DELTA iteration on co-partitioned RDDs (the Pregel trick,
    // without GraphX's per-round framework overhead): only nodes whose
    // label CHANGED last round push to their neighbors, so late rounds
    // shuffle a shrinking frontier instead of the whole label vector,
    // and the loop's only action is the frontier count. Labels only
    // decrease, so the min label still floods every component — exact CC
    // at convergence, rounds = component diameter (dup chains are
    // shallow). Same replan-free rationale as pagerank/BFS.
    // Partitioner sized to the EDGE data (≥64k edges/partition, capped at
    // defaultParallelism) exactly like pagerank/BFS/SSSP: a fixed small
    // cap would funnel the whole fixpoint through a handful of reducers
    // once the near-dup edge list grows 100×, while a fixed 32-way one
    // pays near-empty task launches per round on a tiny local graph.
    val nEdges = pairs.count() * 2
    // clamp BEFORE toInt: past ~1.4e14 edges the raw .toInt wraps negative
    // and math.max would silently collapse the fixpoint to 1 partition
    val part = new org.apache.spark.HashPartitioner(
      math.max(1, math.min(s.sparkContext.defaultParallelism.toLong,
        math.min(nEdges / 65536 + 1, Int.MaxValue.toLong)).toInt))
    val und = cachedRdd(pairs.as[(Long, Long)].rdd
      .flatMap { case (a, b) => Seq((a, b), (b, a)) }
      .partitionBy(part))
    // Round 19 (optimization): the per-round push used to cogroup the
    // whole edge RDD with the active frontier (per-edge tuple boxing
    // every round). The adjacency is staged ONCE as a per-partition
    // hash map (u → targets[]) and each round zips it against the
    // co-partitioned frontier with a local min-combine before the
    // shuffle — min is order-independent, so the flooded labels are
    // identical (pinned in PropertySpec; the pagerank precedent).
    val adj = cachedRdd(Util.adjacencyMapOf(und))
    var labels = cachedRdd(
      und.mapValues(_ => ()).keys.map(n => (n, n))
        .reduceByKey(part, math.min(_: Long, _: Long)))
    var active = labels
    var n = 1L
    while (n > 0) {
      val pushed = adj.zipPartitions(active) { (ait, actIt) =>
          Util.pushMinLabels(ait, actIt)
        }
        .reduceByKey(part, math.min(_: Long, _: Long))
      val upd = labels.leftOuterJoin(pushed, part)
        .mapValues { case (old, p) => (old, p.filter(_ < old)) }
      active = cachedRdd(upd
        .filter { case (_, (_, p)) => p.isDefined }
        .mapValues { case (_, p) => p.get })
      n = active.count()
      labels = cachedRdd(upd.mapValues { case (old, p) => p.getOrElse(old) })
    }
    labels.toDF("node", "comp")
  }

  val qDedupConnected: Q = (s, dir) => {
    import s.implicits._
    val labelsDf = ccLabels(s, dir)
    val sizes = labelsDf.groupBy($"comp").agg(count(lit(1)).as("cluster_size"))
    labelsDf.join(sizes, "comp")
      .select($"node".as("doc_id"), $"comp".as("cluster"), $"cluster_size",
        ($"node" === $"comp").as("is_keeper"))
      .orderBy($"doc_id")
  }

  /** Duplicate-cluster resolution with the KEEPER A REAL PIPELINE PICKS:
    * the highest-QUALITY document of each near-dup cluster (min doc_id
    * only as the tie-break), not the arbitrary min-id of
    * q_dedup_connected. Quality is q_text_quality's composite —
    * `(1 − digit_ratio) · min(n_tokens/20, 1)` rounded to 4dp, a value
    * the oracle already hash-matches, so the cross-engine equality
    * compare inside the argmax is exact. Shape: cluster labels (CC over
    * near-dup pairs) ⋈ per-doc quality, per-cluster max, then keeper =
    * min doc_id among max-quality docs. The per-cluster aggregates are
    * CLUSTER-sized (kilobytes per million docs), broadcast back onto the
    * doc-level rows — at 100 TB the corpus shuffles once on the cluster
    * key and everything else is metadata-sized. */
  val qDedupKeepbest: Q = (s, dir) => {
    import s.implicits._
    val q = table(s, dir, "documents")
      .select($"doc_id",
        round((lit(1.0) -
          length(regexp_replace($"text", "[^0-9]", "")).cast("double") /
            length($"text")) *
          least(size(LlmOps.toks($"text")).cast("double") / 20.0, lit(1.0)),
          4).as("quality"))
    val lq = ccLabels(s, dir)
      .join(q, $"node" === $"doc_id")
      .select($"doc_id", $"comp".as("cluster"), $"quality")
      .transform(cached)
    val best = lq.groupBy($"cluster").agg(max($"quality").as("max_q"))
    val keeper = lq.join(broadcast(best), "cluster")
      .filter($"quality" === $"max_q")
      .groupBy($"cluster").agg(min($"doc_id").as("keeper_id"))
    lq.join(broadcast(keeper), "cluster")
      .select($"doc_id", $"cluster", $"quality",
        ($"doc_id" === $"keeper_id").as("is_keeper"))
      .orderBy($"doc_id")
  }

  /** Benchmark-contamination scoring: fraction of each corpus doc's
    * distinct word-3-gram shingles that appear anywhere in the held-out
    * benchmark set (docs with doc_id % 50 = 0 stand in for an eval
    * suite). The benchmark shingle set is broadcast — eval suites are
    * tiny next to a training corpus, so the corpus-side explode joins
    * against an in-memory hash set and never shuffles. count(hit) (count
    * of non-null) keeps both engines in BIGINT. */
  val qTextContamination: Q = (s, dir) => {
    import s.implicits._
    // shingle generation through the native ShingleGenerator instead of
    // the interpreted explode(array_distinct(transform(...))) HOF chain
    // (CodegenFallback — it dominated this query's cost); the per-doc
    // distinct becomes a relational distinct over (doc_id, sh), the
    // same pairs. cached: feeds both the benchmark-set leg and the
    // corpus scan
    s.sessionState.functionRegistry.createOrReplaceTempFunction(
      "shingles3", exprs => ShingleGenerator(exprs.head, 3), "scala_udf")
    val sh = Util.spread(table(s, dir, "documents"))
      .selectExpr("doc_id", "shingles3(text) AS sh")
      .distinct()
      .transform(cached)
    val bench = sh.filter($"doc_id" % 50 === 0)
      .select($"sh").distinct().withColumn("hit", lit(1L))
    sh.filter($"doc_id" % 50 =!= 0)
      .join(broadcast(bench), Seq("sh"), "left")
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_shingles"), count($"hit").as("n_overlap"))
      .select($"doc_id", $"n_shingles", $"n_overlap",
        round($"n_overlap".cast("double") / $"n_shingles", 6).as("contamination"))
      .orderBy($"doc_id")
  }

  /** PII redaction: global regexp redaction of emails and phone-like
    * digit runs, with per-doc match counts. The fixture text is digit-free
    * word salad, so a deterministic contact string derived from fixture
    * columns is appended first — the REDACTION is the operator; the
    * planted line makes it observable. Regexes stick to character
    * classes + bounded repetition so Java (Spark) and RE2 (DuckDB)
    * agree. Pure per-row projection: no shuffle, fully codegen'd. */
  val qTextPii: Q = (s, dir) => {
    import s.implicits._
    val email = "[a-z0-9.]+@[a-z0-9.]+"
    val phone = "[0-9][0-9-]{5,}[0-9]"
    table(s, dir, "documents")
      .select($"doc_id", concat($"text", lit(" contact user"), $"doc_id",
        lit("@example.com or 555-01"),
        lpad(($"doc_id" % 100).cast("string"), 2, "0")).as("raw"))
      .select($"doc_id",
        regexp_count($"raw", lit(email)).cast("long").as("n_emails"),
        regexp_count($"raw", lit(phone)).cast("long").as("n_phones"),
        md5(regexp_replace(regexp_replace($"raw", email, "<EMAIL>"),
          phone, "<PHONE>")).as("h"))
      .orderBy($"doc_id")
  }

  /** Semantic clustering of the embedding space: MLlib KMeans (k = 10,
    * fixed seed, k-means|| init) over the 64-d vectors, reported as
    * per-cluster size + majority planted label + purity. This is the
    * semantic-dedup / data-mixing primitive: each Lloyd iteration is one
    * map-side partial aggregation of (sum, count) per cluster per
    * partition — no shuffle grows with corpus size, only with k·dim.
    * Fixture note (measured): the embeddings are near-random unit vectors
    * and `label` is NOT geometric (within-label mean cos 0.0016 vs 0.0003
    * across), so purity hovers near 1/k by construction — the purity
    * column is the data-mixing REPORT, not a quality claim. Oracle-exempt
    * (float centroid sums are partitioning-order dependent in the last
    * ulp, and cluster ids are arbitrary); CurationSpec instead asserts
    * the invariants that don't depend on fixture geometry: every vector
    * sits in its NEAREST centroid's cluster, the clustering cost beats
    * the single-centroid null model, and same-seed refits agree. */
  val qClusterKmeans: Q = (s, dir) => {
    import s.implicits._
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val e = table(s, dir, "embeddings")
      .select($"vec_id", $"label", array_to_vector($"embedding").as("features"))
    val model = new KMeans().setK(10).setSeed(7L).setMaxIter(20)
      .setFeaturesCol("features").setPredictionCol("cluster")
      .fit(e)
    val byLabel = model.transform(e)
      .groupBy($"cluster", $"label").agg(count(lit(1)).as("n"))
    val tot = byLabel.groupBy($"cluster").agg(sum($"n").as("n_vecs"))
    val w = Window.partitionBy($"cluster").orderBy($"n".desc, $"label")
    byLabel.withColumn("rn", row_number().over(w)).filter($"rn" === 1)
      .join(tot, "cluster")
      .select($"cluster".cast("long").as("cluster"), $"n_vecs",
        $"label".cast("long").as("top_label"),
        round($"n".cast("double") / $"n_vecs", 4).as("purity"))
      .orderBy($"cluster")
  }

  /** SemDeDup — semantic dedup blocked on the LEARNED k-means clusters
    * (not the fixture's ground-truth label, which q_dedup_embed blocks
    * on): fit the same deterministic model as q_cluster_kmeans (k = 10,
    * seed 7, k-means||), then within each learned cluster drop every
    * vector that has a SMALLER-id cluster-mate with cosine ≥ τ. This is
    * the standard SemDeDup pipeline shape — the model's own partitions
    * are the blocking structure, so the quadratic stage is O(n²/k) per
    * cluster and never all-pairs; at 100 TB the clusters ARE the answer
    * to the cross-corpus O(n²) (see SCALE.md §semantic-dedup).
    *
    * Keeper rule is declarative and monotone (drop v iff ∃ u < v in the
    * same cluster with cos(u,v) ≥ τ), so the kept set is unique given
    * the assignment — no sequential scan order — and no two kept
    * vectors in one cluster are τ-close (asserted in CurationSpec,
    * together with witness validity and same-seed determinism).
    *
    * τ = 0.35 is a declared FIXTURE parameter: these embeddings are
    * near-random unit vectors (max pairwise cos 0.48, median 0.0), so
    * the production 0.95 would drop nothing; 0.35 exercises real drops.
    * Oracle-exempt like q_cluster_kmeans (learned float centroids are
    * not expressible cross-engine); the driver records the rows-only
    * check — output is one row per vector, so the row count is stable
    * even if a boundary vector flips clusters in the last ulp. */
  val qDedupSemantic: Q = (s, dir) => {
    import s.implicits._
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val e = cached(table(s, dir, "embeddings")
      .select($"vec_id",
        // round 19: native array cast (see LlmOps.emb)
        $"embedding".cast("array<double>").as("emb"),
        array_to_vector($"embedding").as("features")))
    val model = new KMeans().setK(10).setSeed(7L).setMaxIter(20)
      .setFeaturesCol("features").setPredictionCol("cluster")
      .fit(e)
    val assigned = cached(model.transform(e)
      .select($"vec_id", $"cluster".cast("long").as("cluster"), $"emb"))
    val dropped = assigned.as("a").join(assigned.as("b"),
        $"a.cluster" === $"b.cluster" && $"a.vec_id" < $"b.vec_id")
      .filter(dot($"a.emb", $"b.emb") >= 0.35)
      .select($"b.vec_id".as("vec_id")).distinct()
      .withColumn("is_dup", lit(true))
    assigned.join(dropped, Seq("vec_id"), "left")
      .select($"vec_id", $"cluster",
        coalesce($"is_dup", lit(false)).as("is_dup"))
      .orderBy($"vec_id")
  }

  /** Incremental exact dedup — the daily-crawl shape: a NEW batch
    * (doc_id ≥ 250 stands in for today's crawl) is first deduped
    * batch-internally (min-doc_id keeper), then anti-joined against the
    * EXISTING corpus by content hash so only genuinely new content
    * survives. At 100 TB the corpus side is the big one: its signature
    * table (md5 per doc — ~2% of corpus bytes) is what the anti-join
    * shuffles, and bucketing that table by hash makes the daily job
    * shuffle only the new batch. */
  val qDedupIncremental: Q = (s, dir) => {
    import s.implicits._
    val d = table(s, dir, "documents")
      .select($"doc_id", md5(lower(trim($"text"))).as("h"))
    val batch = d.filter($"doc_id" >= 250)
      .groupBy($"h").agg(min($"doc_id").as("doc_id"),
        count(lit(1)).as("n_in_batch"))
    batch.join(d.filter($"doc_id" < 250).select($"h"), Seq("h"), "left_anti")
      .select($"doc_id", $"h", $"n_in_batch")
      .orderBy($"doc_id")
  }

  /** Containment dedup — asymmetric overlap: for blocked candidate pairs,
    * C(A,B) = |sh(A)∩sh(B)| / |sh(A)| in BOTH directions. Where Jaccard's
    * union term drowns the overlap between a short doc and a long doc
    * that extends it, containment still scores high. SCOPE: candidates
    * are blocked on md5(first 40 chars), so only pairs sharing an
    * identical 40-char prefix (the fixture's planted extend-a-doc shape)
    * are reachable — a quote appearing mid-document never becomes a
    * candidate under prefix blocking. The any-position variant blocks on
    * sampled shingle hashes instead (candidates = docs sharing any
    * shingle with hash % P == 0); that shape scales the same way but
    * degenerates on this fixture's ~40-word vocabulary, where chance
    * shingle collisions make it near-all-pairs, so it is deliberately
    * not the declared query. Same scale shape as the other dedup ops:
    * blocking first, shingle arrays built only for survivors (semi-join),
    * per-row array_intersect — the quadratic stage never leaves the
    * blocked set. */
  val qDedupContainment: Q = (s, dir) => {
    import s.implicits._
    val d = table(s, dir, "documents")
    val block = d.select($"doc_id", md5(substring($"text", 1, 40)).as("bk"))
    val cands = block.as("x").join(block.as("y"),
        $"x.bk" === $"y.bk" && $"x.doc_id" < $"y.doc_id")
      .select($"x.doc_id".as("doc_a"), $"y.doc_id".as("doc_b"))
      .transform(cached) // feeds both candDocs legs + the final join
    val candDocs = cands.select($"doc_a".as("doc_id"))
      .unionAll(cands.select($"doc_b".as("doc_id"))).distinct()
    // cached: docsh feeds BOTH pair legs — uncached, the whole
    // semi-join + shingle subtree executes twice (once per leg), each
    // paying its own codegen of the shingle lambda (measured 4x the
    // query's total cost at sf0.1). Round 19: native
    // DistinctShinglesArray instead of the interpreted
    // array_distinct(shingles(toks(...))) chain — identical arrays,
    // pinned in PropertySpec.
    val docsh = cached(d.join(candDocs, Seq("doc_id"), "left_semi")
      .select($"doc_id",
        org.apache.spark.sql.graft.GraftSql.column(
          graft.functions.DistinctShinglesArray(
            org.apache.spark.sql.graft.GraftSql.expression($"text"), 3))
          .as("shs")))
    cands
      .join(docsh.select($"doc_id".as("doc_a"), $"shs".as("sa")), "doc_a")
      .join(docsh.select($"doc_id".as("doc_b"), $"shs".as("sb")), "doc_b")
      .select($"doc_a", $"doc_b",
        size(array_intersect($"sa", $"sb")).cast("double").as("i"),
        size($"sa").as("na"), size($"sb").as("nb"))
      // sub-3-token docs have empty shingle sets: 0/0 is NaN, and Spark
      // sorts NaN ABOVE numbers, so it would pass the >= filter — drop them
      .filter($"na" > 0 && $"nb" > 0)
      .select($"doc_a", $"doc_b",
        round($"i" / $"na", 6).as("c_ab"),
        round($"i" / $"nb", 6).as("c_ba"))
      .filter(greatest($"c_ab", $"c_ba") >= 0.5)
      .orderBy($"doc_a", $"doc_b")
  }

  /** FUZZY incremental dedup — the daily-crawl near-dup shape: the new
    * batch's minhash bands are joined one-sidedly against the standing
    * corpus's signature table (batch × corpus, never batch × batch or
    * the corpus self-join), then exact Jaccard verifies the candidates.
    * At 100 TB the corpus side of the band join is a STORED signature
    * table (8 small strings per doc, bucketable by band key), so a
    * daily batch shuffles only itself plus the colliding buckets —
    * the corpus text is touched only for verified candidates. */
  val qDedupIncrNear: Q = (s, dir) => {
    import s.implicits._
    val d = table(s, dir, "documents")
    // signatures via the shuffle-free MinHashLanes kernel (shared with
    // the batch path — see LlmOps.minHashSig)
    val sig = cached(LlmOps.minHashSig(s, dir))
    val bandStructs = array((0 until 4).map(b =>
      struct(lit(b).as("band"),
        concat(col(s"m${2 * b}"), lit("|"), col(s"m${2 * b + 1}"))
          .as("bkey"))): _*)
    val bands = sig.select($"doc_id", explode(bandStructs).as("f"))
      .select($"doc_id", $"f.band".as("band"), $"f.bkey".as("bkey"))
    val cands = bands.filter($"doc_id" >= 250).as("x")
      .join(bands.filter($"doc_id" < 250).as("y"),
        $"x.band" === $"y.band" && $"x.bkey" === $"y.bkey")
      .select($"x.doc_id".as("batch_doc"), $"y.doc_id".as("corpus_doc"))
      .distinct()
      .transform(cached) // feeds both candDocs legs + the final join
    val candDocs = cands.select($"batch_doc".as("doc_id"))
      .unionAll(cands.select($"corpus_doc".as("doc_id"))).distinct()
    // cached: docsh feeds BOTH pair legs — uncached, the whole
    // semi-join + shingle subtree executes twice (once per leg), each
    // paying its own codegen of the shingle lambda (measured 4x the
    // query's total cost at sf0.1). Round 19: native
    // DistinctShinglesArray instead of the interpreted
    // array_distinct(shingles(toks(...))) chain — identical arrays,
    // pinned in PropertySpec.
    val docsh = cached(d.join(candDocs, Seq("doc_id"), "left_semi")
      .select($"doc_id",
        org.apache.spark.sql.graft.GraftSql.column(
          graft.functions.DistinctShinglesArray(
            org.apache.spark.sql.graft.GraftSql.expression($"text"), 3))
          .as("shs")))
    cands
      .join(docsh.select($"doc_id".as("batch_doc"), $"shs".as("sa")),
        "batch_doc")
      .join(docsh.select($"doc_id".as("corpus_doc"), $"shs".as("sb")),
        "corpus_doc")
      .select($"batch_doc", $"corpus_doc",
        (size(array_intersect($"sa", $"sb")).cast("double") /
          (size($"sa") + size($"sb") - size(array_intersect($"sa", $"sb"))))
          .as("jac"))
      .filter($"jac" >= 0.8)
      .orderBy($"batch_doc", $"corpus_doc")
  }

  /** Model-BASED curation — the fastText/DCLM quality-classifier shape:
    * fit a linear classifier on a labeled seed, score the whole corpus,
    * gate on the prediction. The label is few-shot style: ONE seed
    * example (vec_id 0) defines the "quality direction", every vector is
    * labeled by the sign of its cosine to the seed, and MLlib
    * LogisticRegression must RECOVER that direction from a deterministic
    * hash-split train set (the fixture's categorical labels are not
    * linearly separable — measured 0.43 holdout — so the seed-direction
    * target is what makes the task honest rather than impossible).
    * Oracle-exempt like q_cluster_kmeans (L-BFGS double reductions are
    * partition-order sensitive in the last ulp); CurationSpec bounds
    * holdout accuracy instead. At 100 TB the fit runs on the labeled
    * SEED (tiny); scoring is one broadcast of the weight vector over the
    * corpus scan — the same model-out/broadcast-back shape as the
    * unigram LM and DSIR. */
  val qCurateClassifier: Q = (s, dir) => {
    import s.implicits._
    import org.apache.spark.ml.classification.LogisticRegression
    import org.apache.spark.ml.functions.array_to_vector
    val emb = table(s, dir, "embeddings")
    val anchor = emb.filter($"vec_id" === 0)
      .select($"embedding".as("anchor"))
    val e = emb.crossJoin(broadcast(anchor))
      .select($"vec_id", $"embedding".cast("array<double>").as("x"),
        (dot($"embedding".cast("array<double>"),
          $"anchor".cast("array<double>")) > 0.0).cast("double").as("y"),
        array_to_vector($"embedding").as("features"))
      .withColumn("split",
        when(pmod(crc32($"vec_id".cast("string")), lit(5)) === 0, "holdout")
          .otherwise("train"))
    val model = new LogisticRegression()
      .setMaxIter(50).setRegParam(0.01)
      .setLabelCol("y").setFeaturesCol("features")
      .fit(e.filter($"split" === "train"))
    // score declaratively with the extracted weight vector (margin > 0 ⇔
    // the model's 0.5-threshold prediction) instead of model.transform:
    // the UDF route serializes the model WITH its training summary's
    // SparkSession — which explodes as soon as anything (an Observation)
    // has initialized session-attached state — and the literal-weights
    // dot product is the broadcast-the-model scoring shape anyway
    val w = model.coefficients.toArray
    e.withColumn("pred",
        ((dot($"x", typedlit(w)) + model.intercept) > 0.0).cast("double"))
      .groupBy($"split")
      .agg(count(lit(1)).as("n"),
        sum(when($"pred" === $"y", 1L).otherwise(0L)).as("n_correct"))
      .withColumn("accuracy", round($"n_correct".cast("double") / $"n", 4))
      .orderBy($"split")
  }

  val queries: Map[String, Q] = Map(
    "q_curate_classifier" -> qCurateClassifier,
    "q_dedup_incr_near" -> qDedupIncrNear,
    "q_dedup_connected" -> qDedupConnected,
    "q_dedup_keepbest" -> qDedupKeepbest,
    "q_dedup_incremental" -> qDedupIncremental,
    "q_dedup_containment" -> qDedupContainment,
    "q_text_contamination" -> qTextContamination,
    "q_text_pii" -> qTextPii,
    "q_cluster_kmeans" -> qClusterKmeans,
    "q_dedup_semantic" -> qDedupSemantic,
  )

  val oracleSql: Map[String, String] = Map(
    "q_dedup_incr_near" -> {
      val minhashes = (0 until 8)
        .map(j => s"min(substr(md5(s), ${4 * j + 1}, 4)) AS m$j")
        .mkString(", ")
      val bandSelects = (0 until 4)
        .map(b => s"SELECT doc_id, $b AS band, m${2 * b}||'|'||m${2 * b + 1} AS bkey FROM sig")
        .mkString(" UNION ALL ")
      s"""WITH tok AS (SELECT doc_id, string_split(text,' ') AS ws FROM documents),
         |sh AS (SELECT DISTINCT doc_id, s FROM (
         |  SELECT doc_id, unnest(list_transform(generate_series(1, len(ws)-2),
         |    i -> ws[i]||' '||ws[i+1]||' '||ws[i+2])) AS s FROM tok)),
         |sig AS (SELECT doc_id, $minhashes FROM sh GROUP BY doc_id),
         |bands AS ($bandSelects),
         |cands AS (SELECT DISTINCT x.doc_id AS batch_doc, y.doc_id AS corpus_doc
         |  FROM bands x JOIN bands y ON x.band=y.band AND x.bkey=y.bkey
         |   AND x.doc_id >= 250 AND y.doc_id < 250),
         |sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
         |inter AS (SELECT batch_doc, corpus_doc, count(*) AS i FROM cands
         |  JOIN sh sa ON sa.doc_id=batch_doc JOIN sh sb ON sb.doc_id=corpus_doc AND sa.s=sb.s
         |  GROUP BY batch_doc, corpus_doc)
         |SELECT batch_doc, corpus_doc,
         |  CAST(i AS DOUBLE)/(za.n + zb.n - i) AS jac
         |FROM inter JOIN sizes za ON za.doc_id=batch_doc JOIN sizes zb ON zb.doc_id=corpus_doc
         |WHERE CAST(i AS DOUBLE)/(za.n + zb.n - i) >= 0.8
         |ORDER BY batch_doc, corpus_doc""".stripMargin
    },
    "q_dedup_keepbest" ->
      s"""WITH RECURSIVE pairs AS (${LlmOps.oracleSql("q_dedup_near")}),
         |und AS (SELECT doc_a AS a, doc_b AS b FROM pairs
         |        UNION ALL SELECT doc_b, doc_a FROM pairs),
         |nodes AS (SELECT DISTINCT a AS node FROM und),
         |reach AS (SELECT node, node AS r FROM nodes
         |  UNION
         |  SELECT u.b AS node, reach.r FROM reach JOIN und u ON u.a = reach.node),
         |comp AS (SELECT node, min(r) AS cluster FROM reach GROUP BY node),
         |q AS (SELECT doc_id,
         |  round((1.0 - CAST(length(regexp_replace(text,'[^0-9]','','g')) AS DOUBLE)
         |      / length(text))
         |    * least(CAST(len(string_split(text,' ')) AS DOUBLE)/20.0, 1.0), 4)
         |  AS quality FROM documents),
         |lq AS (SELECT q.doc_id, comp.cluster, q.quality
         |  FROM comp JOIN q ON comp.node = q.doc_id),
         |best AS (SELECT cluster, max(quality) AS max_q FROM lq GROUP BY cluster),
         |keeper AS (SELECT lq.cluster, min(doc_id) AS keeper_id
         |  FROM lq JOIN best ON lq.cluster = best.cluster
         |   AND lq.quality = best.max_q GROUP BY lq.cluster)
         |SELECT lq.doc_id, lq.cluster, lq.quality,
         |  lq.doc_id = k.keeper_id AS is_keeper
         |FROM lq JOIN keeper k ON lq.cluster = k.cluster
         |ORDER BY lq.doc_id""".stripMargin,
    "q_dedup_connected" ->
      s"""WITH RECURSIVE pairs AS (${LlmOps.oracleSql("q_dedup_near")}),
         |und AS (SELECT doc_a AS a, doc_b AS b FROM pairs
         |        UNION ALL SELECT doc_b, doc_a FROM pairs),
         |nodes AS (SELECT DISTINCT a AS node FROM und),
         |reach AS (SELECT node, node AS r FROM nodes
         |  UNION
         |  SELECT u.b AS node, reach.r FROM reach JOIN und u ON u.a = reach.node),
         |comp AS (SELECT node, min(r) AS cluster FROM reach GROUP BY node),
         |sizes AS (SELECT cluster, count(*) AS cluster_size FROM comp GROUP BY cluster)
         |SELECT c.node AS doc_id, c.cluster, s.cluster_size,
         |  c.node = c.cluster AS is_keeper
         |FROM comp c JOIN sizes s ON c.cluster = s.cluster
         |ORDER BY doc_id""".stripMargin,
    "q_dedup_containment" ->
      """WITH block AS (SELECT doc_id, md5(substr(text, 1, 40)) AS bk FROM documents),
        |cands AS (SELECT x.doc_id AS doc_a, y.doc_id AS doc_b
        |  FROM block x JOIN block y ON x.bk = y.bk AND x.doc_id < y.doc_id),
        |cd AS (SELECT doc_a AS doc_id FROM cands
        |       UNION SELECT doc_b FROM cands),
        |tok AS (SELECT d.doc_id, string_split(text,' ') AS ws
        |  FROM documents d JOIN cd ON d.doc_id = cd.doc_id),
        |sh AS (SELECT DISTINCT doc_id, s FROM (
        |  SELECT doc_id, unnest(list_transform(generate_series(1, len(ws)-2),
        |    i -> ws[i]||' '||ws[i+1]||' '||ws[i+2])) AS s FROM tok)),
        |sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
        |inter AS (SELECT doc_a, doc_b, count(*) AS i FROM cands
        |  JOIN sh sa ON sa.doc_id = doc_a
        |  JOIN sh sb ON sb.doc_id = doc_b AND sa.s = sb.s
        |  GROUP BY doc_a, doc_b)
        |SELECT doc_a, doc_b,
        | round(CAST(i AS DOUBLE)/za.n, 6) AS c_ab,
        | round(CAST(i AS DOUBLE)/zb.n, 6) AS c_ba
        |FROM inter JOIN sizes za ON za.doc_id = doc_a
        | JOIN sizes zb ON zb.doc_id = doc_b
        |WHERE greatest(CAST(i AS DOUBLE)/za.n, CAST(i AS DOUBLE)/zb.n) >= 0.5
        |ORDER BY doc_a, doc_b""".stripMargin,
    "q_dedup_incremental" ->
      """WITH d AS (SELECT doc_id, md5(lower(trim(text))) AS h FROM documents),
        |batch AS (SELECT h, min(doc_id) AS doc_id, count(*) AS n_in_batch
        |  FROM d WHERE doc_id >= 250 GROUP BY h)
        |SELECT doc_id, h, n_in_batch FROM batch
        |WHERE NOT EXISTS (SELECT 1 FROM d WHERE d.doc_id < 250 AND d.h = batch.h)
        |ORDER BY doc_id""".stripMargin,
    "q_text_contamination" ->
      """WITH tok AS (SELECT doc_id, string_split(text,' ') AS ws FROM documents),
        |sh AS (SELECT DISTINCT doc_id, s FROM (
        |  SELECT doc_id, unnest(list_transform(generate_series(1, len(ws)-2),
        |    i -> ws[i]||' '||ws[i+1]||' '||ws[i+2])) AS s FROM tok)),
        |bench AS (SELECT DISTINCT s FROM sh WHERE doc_id % 50 = 0)
        |SELECT doc_id, count(*) AS n_shingles, count(b.s) AS n_overlap,
        | round(CAST(count(b.s) AS DOUBLE)/count(*), 6) AS contamination
        |FROM sh LEFT JOIN bench b ON sh.s = b.s
        |WHERE doc_id % 50 <> 0
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "q_text_pii" ->
      """WITH raw AS (SELECT doc_id,
        |  text || ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com or 555-01'
        |    || lpad(CAST(doc_id % 100 AS VARCHAR), 2, '0') AS raw
        | FROM documents)
        |SELECT doc_id,
        | CAST(len(regexp_extract_all(raw, '[a-z0-9.]+@[a-z0-9.]+')) AS BIGINT) AS n_emails,
        | CAST(len(regexp_extract_all(raw, '[0-9][0-9-]{5,}[0-9]')) AS BIGINT) AS n_phones,
        | md5(regexp_replace(regexp_replace(raw, '[a-z0-9.]+@[a-z0-9.]+', '<EMAIL>', 'g'),
        |   '[0-9][0-9-]{5,}[0-9]', '<PHONE>', 'g')) AS h
        |FROM raw ORDER BY doc_id""".stripMargin,
  )
}
