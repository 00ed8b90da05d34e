package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import Util._

/** Corpus-assembly operators — the steps between a cleaned document set
  * and training-ready shards: sequence packing, packed-context
  * materialization, domain mixture sampling, and repetition-based
  * quality gates (the Gopher-rule family).
  */
object Corpus {

  private val Capacity = 256L // tokens per packed context

  /** documents + token counts + pack assignment. Packing is per-SOURCE
    * (the shard axis): bin = floor(starting offset / capacity) under a
    * running token cumsum ordered by doc_id. A GLOBAL ordered cumsum
    * would funnel 100 TB through one task; per-source packing is one
    * window shuffle on the source key and each shard packs
    * independently — the shape real pipelines use (pack within shard,
    * shards in parallel). First-fit-decreasing would pack ~2% tighter
    * but needs a sequential scan; offset-packing is fully declarative. */
  private def packed(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"source").orderBy($"doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    table(s, dir, "documents")
      .select($"doc_id", $"source", $"text",
        size(split($"text", " ")).cast("long").as("n_toks"))
      .withColumn("cum", sum($"n_toks").over(w))
      .withColumn("bin",
        floor(($"cum" - $"n_toks").cast("double") / lit(Capacity.toDouble)))
  }

  /** Sequence packing summary: per (source, bin) — how many docs landed
    * in each fixed-capacity context and how full it is. Docs longer than
    * the capacity keep their own bin (offset packing never splits a doc;
    * a chunking pass upstream would). */
  val qPipelinePack: Q = (s, dir) => {
    import s.implicits._
    packed(s, dir)
      .groupBy($"source", $"bin")
      .agg(count(lit(1)).as("n_docs"), sum($"n_toks").as("bin_toks"))
      .withColumn("fill",
        round($"bin_toks".cast("double") / lit(Capacity.toDouble), 6))
      .orderBy($"source", $"bin")
  }

  /** Packed-context materialization: the docs of each (source, bin)
    * concatenated in doc_id order with a newline separator — checksummed
    * rather than carried (the driver compare hashes values; the md5 + the
    * length pin the exact concatenation). collect_list carries only one
    * context's docs per group (≤ capacity tokens), so group state is
    * bounded by the pack capacity, not the corpus. */
  val qPipelineConcat: Q = (s, dir) => {
    import s.implicits._
    packed(s, dir)
      .groupBy($"source", $"bin")
      .agg(count(lit(1)).as("n_docs"),
        // array_sort on struct orders by the first field (doc_id) — the
        // deterministic ORDER BY inside the aggregation
        array_join(
          transform(array_sort(collect_list(struct($"doc_id", $"text"))),
            x => x.getField("text")),
          "\n").as("joined"))
      .select($"source", $"bin", $"n_docs",
        length($"joined").cast("long").as("concat_chars"),
        md5($"joined").as("h"))
      .orderBy($"source", $"bin")
  }

  /** Domain-mixture sampling: re-weight the corpus to a target language
    * mixture under a 60% token^W doc budget. Per-language keep-rate =
    * min(1, target_share * budget / lang_count); membership is a pure
    * function of the doc KEY (md5-derived uniform in [0,1)) — like
    * q_sample_hash, reproducible across engines, partitionings and
    * reruns, so downstream jobs can re-derive the sample. The target
    * table is a broadcast dim; the only wide ops are the two tiny
    * aggregations. */
  val qPipelineMixture: Q = (s, dir) => {
    import s.implicits._
    val targets = Seq(("en", 0.30), ("zh", 0.25), ("es", 0.20),
      ("de", 0.15), ("fr", 0.10)).toDF("lang", "target")
    val d = table(s, dir, "documents").select($"doc_id", $"lang")
    val counts = d.groupBy($"lang").agg(count(lit(1)).as("n_lang"))
      .crossJoin(d.agg(count(lit(1)).as("n_total")))
      .join(broadcast(targets), "lang")
      .withColumn("rate",
        least(lit(1.0), round($"target" * 0.6 * $"n_total" / $"n_lang", 6)))
    // uniform in [0,1) from the first 4 md5 nibbles of the key — shared
    // SQL text with the oracle so the arithmetic is identical
    val u = expr(
      """((position(substr(md5(cast(doc_id AS STRING)), 1, 1) IN '0123456789abcdef') - 1) * 4096
        | + (position(substr(md5(cast(doc_id AS STRING)), 2, 1) IN '0123456789abcdef') - 1) * 256
        | + (position(substr(md5(cast(doc_id AS STRING)), 3, 1) IN '0123456789abcdef') - 1) * 16
        | + (position(substr(md5(cast(doc_id AS STRING)), 4, 1) IN '0123456789abcdef') - 1)
        |) / 65536.0""".stripMargin)
    d.join(broadcast(counts.select($"lang", $"n_lang", $"rate")), "lang")
      .withColumn("keep", u < $"rate")
      .groupBy($"lang")
      .agg(first($"n_lang").as("n_lang"), first($"rate").as("rate"),
        sum(when($"keep", 1L).otherwise(0L)).as("n_kept"))
      .withColumn("realized", round($"n_kept".cast("double") / $"n_lang", 6))
      .orderBy($"lang")
  }

  /** Repetition-based quality gates (the Gopher-rule family): per doc,
    * the distinct-word ratio, the most-frequent-word share, and the
    * most-frequent-bigram share; a doc trips the gate when any rule
    * fires. Flags compare ROUNDED fractions so the gate decision is
    * engine-exact. Two narrow shuffles on doc_id over exploded
    * words/bigrams — at 100 TB both aggregations are partial-agg
    * friendly (the per-(doc, gram) combine happens map-side). */
  val qTextRepetition: Q = (s, dir) => {
    import s.implicits._
    // Round 19 (optimization): the relational form — two explode →
    // groupBy(doc, token) → groupBy(doc) pipelines joined on doc_id —
    // shuffled every (doc, token) and (doc, bigram) pair twice for
    // statistics whose state is bounded by ONE document (KBs). The
    // native RepetitionStats expression computes the identical five
    // counters in one pass over the text bytes, so the query is now a
    // scan-side projection with zero corpus shuffle — the strictly
    // better shape at 100 TB (parity with the relational form pinned in
    // PropertySpec; DuckDB oracle unchanged). The translate() filter
    // reproduces the old inner join's drop of docs with < 2 words
    // (NULL text drops too, like the old explode).
    val st = org.apache.spark.sql.graft.GraftSql.column(
      graft.functions.RepetitionStats(
        org.apache.spark.sql.graft.GraftSql.expression($"text")))
    table(s, dir, "documents")
      .filter(length($"text") - length(translate($"text", " ", "")) >= 1)
      .select($"doc_id", st.as("st"))
      .select($"doc_id", $"st.n_toks".as("n_toks"),
        round($"st.n_distinct".cast("double") / $"st.n_toks", 6)
          .as("distinct_ratio"),
        round($"st.top_w".cast("double") / $"st.n_toks", 6)
          .as("top_word_frac"),
        round($"st.top_b".cast("double") / $"st.n_bi", 6)
          .as("top_bigram_frac"))
      .withColumn("flagged",
        $"distinct_ratio" < 0.5 || $"top_word_frac" > 0.15 ||
          $"top_bigram_frac" > 0.08)
      .orderBy($"doc_id")
  }

  /** Document chunking — the step UPSTREAM of packing: split each doc
    * into 32-token windows on a 24-token stride (8-token overlap, the
    * RAG/pretraining chunking shape). Pure per-row explode of a
    * sequence-driven transform: no shuffle at all until a consumer
    * aggregates, and chunk count scales with the doc, not the corpus.
    * Chunks are checksummed (md5 + token count) so the oracle pins the
    * exact token windows. */
  val qPipelineChunk: Q = (s, dir) => {
    import s.implicits._
    val ws = LlmOps.toks($"text")
    val starts = transform(
      sequence(lit(0), floor((size(ws) - 1).cast("double") / 24.0).cast("int")),
      k => k * 24 + 1)
    Util.spread(table(s, dir, "documents"))
      .select($"doc_id", ws.as("ws"), explode(starts).as("start"))
      .select($"doc_id", (($"start" - 1) / 24).cast("long").as("chunk_id"),
        size(slice($"ws", $"start", lit(32))).cast("long").as("chunk_toks"),
        md5(concat_ws(" ", slice($"ws", $"start", lit(32)))).as("h"))
      .orderBy($"doc_id", $"chunk_id")
  }

  val queries: Map[String, Q] = Map(
    "q_pipeline_chunk" -> qPipelineChunk,
    "q_pipeline_pack" -> qPipelinePack,
    "q_pipeline_concat" -> qPipelineConcat,
    "q_pipeline_mixture" -> qPipelineMixture,
    "q_text_repetition" -> qTextRepetition,
  )

  val oracleSql: Map[String, String] = Map(
    "q_pipeline_chunk" ->
      """WITH tok AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
        |st AS (SELECT doc_id, ws, unnest(list_transform(
        |   generate_series(0, CAST(floor(CAST(len(ws) - 1 AS DOUBLE) / 24.0) AS INT)),
        |   k -> k * 24 + 1)) AS start
        |  FROM tok)
        |SELECT doc_id, CAST((start - 1) / 24 AS BIGINT) AS chunk_id,
        | CAST(len(ws[start:least(start + 31, len(ws))]) AS BIGINT) AS chunk_toks,
        | md5(array_to_string(ws[start:least(start + 31, len(ws))], ' ')) AS h
        |FROM st ORDER BY doc_id, chunk_id""".stripMargin,
    "q_pipeline_pack" ->
      """WITH p AS (SELECT doc_id, source,
        |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_toks,
        |  sum(CAST(len(string_split(text, ' ')) AS BIGINT))
        |    OVER (PARTITION BY source ORDER BY doc_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        | FROM documents)
        |SELECT source, CAST(floor(CAST(cum - n_toks AS DOUBLE) / 256.0) AS BIGINT) AS bin,
        | count(*) AS n_docs, CAST(sum(n_toks) AS BIGINT) AS bin_toks,
        | round(CAST(sum(n_toks) AS DOUBLE) / 256.0, 6) AS fill
        |FROM p GROUP BY source, bin ORDER BY source, bin""".stripMargin,
    "q_pipeline_concat" ->
      """WITH p AS (SELECT doc_id, source, text,
        |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_toks,
        |  sum(CAST(len(string_split(text, ' ')) AS BIGINT))
        |    OVER (PARTITION BY source ORDER BY doc_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        | FROM documents)
        |SELECT source, CAST(floor(CAST(cum - n_toks AS DOUBLE) / 256.0) AS BIGINT) AS bin,
        | count(*) AS n_docs,
        | CAST(length(string_agg(text, chr(10) ORDER BY doc_id)) AS BIGINT)
        |   AS concat_chars,
        | md5(string_agg(text, chr(10) ORDER BY doc_id)) AS h
        |FROM p GROUP BY source, bin ORDER BY source, bin""".stripMargin,
    "q_pipeline_mixture" ->
      """WITH t(lang, target) AS (VALUES ('en', 0.30), ('zh', 0.25),
        |  ('es', 0.20), ('de', 0.15), ('fr', 0.10)),
        |c AS (SELECT lang, count(*) AS n_lang,
        |   (SELECT count(*) FROM documents) AS n_total
        |  FROM documents GROUP BY lang),
        |r AS (SELECT c.lang, n_lang,
        |   least(CAST(1.0 AS DOUBLE), round(CAST(target AS DOUBLE) * 0.6 * n_total / n_lang, 6)) AS rate
        |  FROM c JOIN t ON c.lang = t.lang),
        |k AS (SELECT d.lang, n_lang, rate,
        |   CASE WHEN ((position(substr(md5(cast(doc_id AS VARCHAR)), 1, 1) IN '0123456789abcdef') - 1) * 4096
        |     + (position(substr(md5(cast(doc_id AS VARCHAR)), 2, 1) IN '0123456789abcdef') - 1) * 256
        |     + (position(substr(md5(cast(doc_id AS VARCHAR)), 3, 1) IN '0123456789abcdef') - 1) * 16
        |     + (position(substr(md5(cast(doc_id AS VARCHAR)), 4, 1) IN '0123456789abcdef') - 1)
        |    ) / 65536.0 < rate THEN 1 ELSE 0 END AS keep
        |  FROM documents d JOIN r ON d.lang = r.lang)
        |SELECT lang, CAST(any_value(n_lang) AS BIGINT) AS n_lang,
        | CAST(any_value(rate) AS DOUBLE) AS rate,
        | CAST(sum(keep) AS BIGINT) AS n_kept,
        | round(CAST(sum(keep) AS DOUBLE) / any_value(n_lang), 6) AS realized
        |FROM k GROUP BY lang ORDER BY lang""".stripMargin,
    "q_text_repetition" ->
      """WITH tok AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
        |w AS (SELECT doc_id, unnest(ws) AS w FROM tok),
        |wc AS (SELECT doc_id, w, count(*) AS c FROM w GROUP BY doc_id, w),
        |ws AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_toks,
        |   count(*) AS n_distinct, max(c) AS top_w
        |  FROM wc GROUP BY doc_id),
        |bg AS (SELECT doc_id, unnest(list_transform(
        |   generate_series(1, len(ws) - 1), i -> ws[i] || ' ' || ws[i+1])) AS b
        |  FROM tok),
        |bc AS (SELECT doc_id, b, count(*) AS c FROM bg GROUP BY doc_id, b),
        |bs AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_bi, max(c) AS top_b
        |  FROM bc GROUP BY doc_id)
        |SELECT ws.doc_id, n_toks,
        | round(CAST(n_distinct AS DOUBLE) / n_toks, 6) AS distinct_ratio,
        | round(CAST(top_w AS DOUBLE) / n_toks, 6) AS top_word_frac,
        | round(CAST(top_b AS DOUBLE) / n_bi, 6) AS top_bigram_frac,
        | (round(CAST(n_distinct AS DOUBLE) / n_toks, 6) < 0.5
        |  OR round(CAST(top_w AS DOUBLE) / n_toks, 6) > 0.15
        |  OR round(CAST(top_b AS DOUBLE) / n_bi, 6) > 0.08) AS flagged
        |FROM ws JOIN bs ON ws.doc_id = bs.doc_id
        |ORDER BY ws.doc_id""".stripMargin,
  )
}
