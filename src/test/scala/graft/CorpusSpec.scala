package graft

import org.apache.spark.sql.functions._

/** Corpus-assembly + round-5 operator invariants (beyond the oracle
  * hash-match): semantics-preservation of salting, partition/coverage
  * properties of packing and chunking. */
class CorpusSpec extends SparkSuite {

  test("q_join_salted returns exactly the unsalted join's aggregate") {
    import spark.implicits._
    val salted = SparkEntry.queries("q_join_salted")(spark, sfDir)
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val sup = spark.read.parquet(s"$sfDir/supplier.parquet")
    val plain = li.join(sup, $"l_suppkey" === $"s_suppkey")
      .groupBy($"s_nationkey")
      .agg(count(lit(1)).as("n_items"),
        sum($"l_extendedprice".cast("decimal(18,4)")).cast("double").as("revenue"))
      .orderBy($"s_nationkey")
    assert(salted.collect().toSeq == plain.collect().toSeq,
      "salting changed the join result")
  }

  test("q_pipeline_pack partitions the corpus: every doc in exactly one bin") {
    import spark.implicits._
    val packSum = SparkEntry.queries("q_pipeline_pack")(spark, sfDir)
      .agg(sum($"n_docs"), sum($"bin_toks")).head()
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(size(split($"text", " ")).cast("long").as("n"))
      .agg(count(lit(1)), sum($"n")).head()
    assert(packSum.getLong(0) == docs.getLong(0), "doc count mismatch")
    assert(packSum.getLong(1) == docs.getLong(1), "token mass mismatch")
  }

  test("q_pipeline_e2e funnel is monotone and consistent with its stages") {
    import spark.implicits._
    val funnel = SparkEntry.queries("q_pipeline_e2e")(spark, sfDir).collect()
    assert(funnel.nonEmpty)
    funnel.foreach { r =>
      val (raw, gated, kept) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(raw >= gated && gated >= kept,
        s"funnel not monotone for ${r.getString(0)}: $raw >= $gated >= $kept")
      assert(kept > 0, s"lang ${r.getString(0)} lost every document")
    }
    // cross-stage consistency: the number of docs the keeper stage may
    // drop is bounded by the non-keeper count q_dedup_connected reports
    val nonKeepers = SparkEntry.queries("q_dedup_connected")(spark, sfDir)
      .filter(!$"is_keeper").count()
    val dropped = funnel.map(r => r.getLong(2) - r.getLong(3)).sum
    assert(dropped <= nonKeepers,
      s"keeper stage dropped $dropped docs but only $nonKeepers non-keepers exist")
  }

  test("q_pipeline_chunk covers every token with the declared stride") {
    import spark.implicits._
    val chunks = SparkEntry.queries("q_pipeline_chunk")(spark, sfDir)
    val perDoc = chunks.groupBy($"doc_id")
      .agg(count(lit(1)).as("n_chunks"), max($"chunk_toks").as("max_len"),
        sum($"chunk_toks").as("sum_len"))
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select($"doc_id", size(split($"text", " ")).cast("long").as("n"))
    val joined = perDoc.join(docs, "doc_id").collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      val (nChunks, maxLen, sumLen, n) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(maxLen <= 32, s"chunk longer than the 32-token window")
      // stride 24: chunk count is ceil over starts 1, 25, 49, ...
      assert(nChunks == (n - 1) / 24 + 1, s"chunk count $nChunks wrong for $n toks")
      // exact token coverage: each chunk holds min(32, n - start + 1)
      // tokens, so the stride-24 starts cover every token (8-overlap)
      val starts = (0L until nChunks).map(_ * 24 + 1)
      val direct = starts.map(st => math.min(32L, n - st + 1)).sum
      assert(sumLen == direct, s"token coverage $sumLen != $direct (n=$n)")
      assert(sumLen >= n, "coverage below doc length")
    }
  }
}
