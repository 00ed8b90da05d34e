package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** One lazy SparkSession per suite (guide idiom); sf0.001 fixtures. */
trait SparkSuite extends AnyFunSuite {
  val sfDir = sys.env.getOrElse("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
  /** Sibling fixture dir at another scale factor, derived from sfDir so a
    * relocated testdata tree keeps working (no absolute paths in specs). */
  def sfSibling(sf: String): String =
    new java.io.File(new java.io.File(sfDir).getParentFile, s"sf$sf").getPath
  // local[4, 2]: 4 threads, maxFailures = 2 — one task retry, so the
  // GraftStoreSpec kill-one-task exactly-once proof can run a REAL
  // failed-then-retried attempt (plain local[N] hardcodes maxFailures=1
  // and any injected task failure would fail the whole job)
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4, 2]")
    .appName(getClass.getSimpleName)
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    // same serializer as Bench/Verify (round 19) so every spec exercises
    // the configuration the harness mains actually run
    .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
}
