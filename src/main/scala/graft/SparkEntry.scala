package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.ops._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each ops module contributes a `queries` map (name → plan builder) and an
  * `oracleSql` map (name → DuckDB-1.0.0 SQL over the same parquet tables).
  * SURVEY.md §2 is the inventory the maps must cover.
  *
  * Caching contract for library callers: the dedup/sketch builders
  * (`q_dedup_near`, `q_dedup_ngram`, `q_dedup_simhash`, sketch rollups)
  * cache internally-reused subtrees via `Util.cached`, which registers
  * every such cache. Each invocation builds fresh attribute ids, so
  * repeated calls on a long-lived session accumulate dead
  * InMemoryRelations rather than reusing them — callers that invoke a
  * builder repeatedly should call `Util.unpersistRegistered()` between
  * invocations (as Bench and Verify do) for deterministic release, or
  * accept storage-memory growth until Spark's LRU eviction reclaims it.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Aggs.qAggGroupby(spark, "/root/testdata/sf0.001")

  private val modules: Seq[(Map[String, Util.Q], Map[String, String])] = Seq(
    (Scans.queries, Scans.oracleSql),
    (Joins.queries, Joins.oracleSql),
    (Aggs.queries, Aggs.oracleSql),
    (SetSort.queries, SetSort.oracleSql),
    (Windows.queries, Windows.oracleSql),
    (Scalars.queries, Scalars.oracleSql),
    (Scalars2.queries, Scalars2.oracleSql),
    (LlmOps.queries, LlmOps.oracleSql),
    (LlmOpsExt.queries, LlmOpsExt.oracleSql),
    (StreamOps.queries, StreamOps.oracleSql),
    (Extensions.queries, Extensions.oracleSql),
    (Multimodal.queries, Multimodal.oracleSql),
    (Sources.queries, Sources.oracleSql),
    (Extras.queries, Extras.oracleSql),
    (TpcH.queries, TpcH.oracleSql),
    (Stats.queries, Stats.oracleSql),
    (TimeSeries.queries, TimeSeries.oracleSql),
    (Sketches.queries, Sketches.oracleSql),
    (Pipelines.queries, Pipelines.oracleSql),
    (Curation.queries, Curation.oracleSql),
    (Corpus.queries, Corpus.oracleSql),
    (Layout.queries, Layout.oracleSql),
    (Advanced.queries, Advanced.oracleSql),
    (Quality.queries, Quality.oracleSql),
  )

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    modules.iterator.map(_._1).reduce(_ ++ _)

  /** All per-module query names including any cross-module duplicates
    * (which `++` would otherwise hide) — guarded by QueriesSpec. */
  def moduleQueryNames: Seq[String] = modules.flatMap(_._1.keys)

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    modules.iterator.map(_._2).reduce(_ ++ _)
}
