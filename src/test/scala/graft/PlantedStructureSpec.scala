package graft

import org.apache.spark.sql.functions._

/** Recall against the driver's planted duplicate structure at sf0.1
  * (FIXTURES.md: 4,992 unique texts of 5,000 rows; ~465 rows share a
  * 60-char prefix). Oracle parity proves Spark == DuckDB; these tests
  * prove the dedup operators actually FIND what was planted. */
class PlantedStructureSpec extends SparkSuite {
  private val sf01 = "/root/testdata/sf0.1"

  test("exact dedup recovers the planted text-group structure at sf0.1") {
    import spark.implicits._
    val got = SparkEntry.queries("q_dedup_exact")(spark, sf01).cache()
    assert(got.count() == 4992, "expected 4,992 distinct normalized texts")
    assert(got.agg(sum($"n_copies")).head.getLong(0) == 5000)
  }

  test("MinHash LSH finds every exact-duplicate pair at sf0.1") {
    import spark.implicits._
    val docs = spark.read.parquet(s"$sf01/documents.parquet")
    val truth = docs.as("a").join(docs.as("b"),
        $"a.text" === $"b.text" && $"a.doc_id" < $"b.doc_id")
      .select($"a.doc_id".as("doc_a"), $"b.doc_id".as("doc_b"))
    val found = SparkEntry.queries("q_dedup_near")(spark, sf01)
      .select($"doc_a", $"doc_b").cache()
    val missed = truth.except(found).count()
    assert(missed == 0, s"LSH missed $missed exact-duplicate pairs")
    // and near-dup output has real volume from the planted prefix families
    assert(found.count() >= 100, s"suspiciously few near-dup pairs: ${found.count()}")
  }
}
