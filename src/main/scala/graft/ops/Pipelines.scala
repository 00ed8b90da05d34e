package graft.ops

import org.apache.spark.sql.functions._
import Util._

/** End-to-end training-corpus cleaning pipeline — the composition showcase:
  * the individual operators (language filter, quality scoring, exact dedup)
  * each exist as standalone queries; this chains them the way a real
  * 100 TB data-prep job would, in ONE declarative plan so Catalyst fuses
  * the filters into the scan and the whole pre-dedup stage runs in a
  * single codegen'd pass.
  *
  * Scale: filters prune before the only wide operation (the dedup
  * groupBy's shuffle on the text hash); the keeper join back is on the
  * aggregated (small) side, so AQE broadcasts it when it fits.
  */
object Pipelines {

  /** documents → keep lang='en' → quality gate (5 ≤ tokens ≤ 1000, mean
    * word length ≤ 15) → exact-dedup (keeper = min doc_id per normalized
    * text hash) → per-source corpus stats. */
  val qPipelineClean: Q = (s, dir) => {
    import s.implicits._
    val en = table(s, dir, "documents")
      .filter($"lang" === "en")
      .withColumn("n_toks", size(split($"text", " ")).cast("long"))
      // mean word length = non-space chars / tokens
      .withColumn("avg_wlen",
        (length($"text") - ($"n_toks" - 1)).cast("double") / $"n_toks")
      .filter($"n_toks".between(5, 1000) && $"avg_wlen" <= 15.0)
    val groups = en
      .groupBy(md5(lower(trim($"text"))).as("h"))
      .agg(min($"doc_id").as("keeper"), count(lit(1)).as("n"))
    en.join(groups, en("doc_id") === groups("keeper"))
      .groupBy($"source")
      .agg(count(lit(1)).as("n_docs"),
        sum($"n" - 1).as("n_dups_removed"),
        sum($"n_toks").as("sum_toks"))
      .orderBy($"source")
  }

  val queries: Map[String, Q] = Map(
    "q_pipeline_clean" -> qPipelineClean,
  )

  val oracleSql: Map[String, String] = Map(
    "q_pipeline_clean" ->
      """WITH en AS (
        |  SELECT doc_id, source, text,
        |   CAST(len(string_split(text, ' ')) AS BIGINT) AS n_toks
        |  FROM documents WHERE lang = 'en'),
        |q AS (
        |  SELECT *, CAST(length(text) - (n_toks - 1) AS DOUBLE) / n_toks AS avg_wlen
        |  FROM en WHERE n_toks BETWEEN 5 AND 1000),
        |qq AS (SELECT * FROM q WHERE avg_wlen <= 15.0),
        |d AS (SELECT md5(lower(trim(text))) AS h, min(doc_id) AS keeper,
        |   count(*) AS n
        |  FROM qq GROUP BY 1)
        |SELECT source, count(*) AS n_docs,
        | CAST(sum(n - 1) AS BIGINT) AS n_dups_removed,
        | CAST(sum(n_toks) AS BIGINT) AS sum_toks
        |FROM qq JOIN d ON qq.doc_id = d.keeper
        |GROUP BY source ORDER BY source""".stripMargin,
  )
}
