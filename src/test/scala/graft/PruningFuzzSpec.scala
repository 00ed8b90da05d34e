package graft

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sources.GraftStore

/** Seeded fuzz for stats-pruning SOUNDNESS — the silent-wrong-results
  * class. The targeted specs pin that pruning HAPPENS (file counts on
  * crafted layouts); this one pins that it never goes too far: for a
  * battery of randomly generated predicates over a table full of
  * adversarial values (nulls, NaN, ±Inf, -0.0, Int.MinValue/MaxValue,
  * empty and non-ASCII strings), a filtered read of the store table
  * must return byte-identical rows to the same filter over the same
  * data in plain parquet (Spark-native ground truth). Store-side file
  * skipping runs off the manifest min/max/null stats; parquet prunes
  * off row-group stats — any divergence is a store pruning bug, not a
  * flake. Seed fixed, generation deterministic. */
class PruningFuzzSpec extends SparkSuite {

  test("seeded predicate fuzz: pruned store scan == plain parquet on adversarial values") {
    val rnd = new scala.util.Random(20260816L)
    def pickI: java.lang.Integer = rnd.nextInt(12) match {
      case 0 => null
      case 1 => Int.MinValue
      case 2 => Int.MaxValue
      case _ => Int.box(rnd.nextInt(200) - 100)
    }
    def pickD: java.lang.Double = rnd.nextInt(14) match {
      case 0 => null
      case 1 => Double.NaN
      case 2 => Double.PositiveInfinity
      case 3 => Double.NegativeInfinity
      case 4 => Double.box(-0.0)
      // quarter-grid so equality predicates land on real values
      case _ => Double.box((rnd.nextInt(400) - 200) / 4.0)
    }
    def pickS: String = rnd.nextInt(10) match {
      case 0 => null
      case 1 => ""
      case 2 => "αβγ"
      case _ =>
        val c = ('a' + rnd.nextInt(3)).toChar
        c.toString * (1 + rnd.nextInt(3))
    }
    val rows = (0L until 3000L).map(k => Row(k, pickI, pickD, pickS))
    val schema = StructType(Seq(
      StructField("k", LongType, nullable = false),
      StructField("i", IntegerType, nullable = true),
      StructField("d", DoubleType, nullable = true),
      StructField("s", StringType, nullable = true)))
    val df = spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 4), schema)
      .repartitionByRange(12, col("k")) // k-clustered files: k-stats bite
    val root = graft.ops.Util.managedTempDir("graft_prune_fuzz_")
    val pqPath = s"$root/pq"
    val stPath = s"$root/st"
    df.write.parquet(pqPath)
    df.write.format("graft.sources.GraftStore").option("path", stPath)
      .mode("overwrite").save()
    val pq = spark.read.parquet(pqPath)
    val st = spark.read.format("graft.sources.GraftStore")
      .option("path", stPath).load()

    // sanity that the layout actually prunes (k-range files): a tight k
    // predicate must plan a strict subset of the 12 files
    import org.apache.spark.sql.sources.LessThan
    val scanAll = new graft.sources.GraftStoreScan(stPath)
    assert(scanAll.planInputPartitions().length == 12)
    val scanPruned = new graft.sources.GraftStoreScan(stPath,
      Array(LessThan("k", 100L)))
    assert(scanPruned.planInputPartitions().length < 12,
      "fuzz fixture lost its prunable layout — the fuzz would test nothing")

    // deterministic predicate battery
    def constI: Column = rnd.nextInt(6) match {
      case 0 => lit(Int.MinValue)
      case 1 => lit(Int.MaxValue)
      case _ => lit(rnd.nextInt(200) - 100)
    }
    def constD: Column = rnd.nextInt(8) match {
      case 0 => lit(Double.NaN)
      case 1 => lit(Double.PositiveInfinity)
      case 2 => lit(Double.NegativeInfinity)
      case 3 => lit(-0.0)
      case _ => lit((rnd.nextInt(400) - 200) / 4.0)
    }
    def constS: Column =
      lit(Seq("", "a", "aa", "b", "ccc", "αβγ")(rnd.nextInt(6)))
    def constK: Column = lit(rnd.nextLong(3500L) - 200L)
    def simple(): Column = {
      val (c, v) = rnd.nextInt(4) match {
        case 0 => (col("k"), constK)
        case 1 => (col("i"), constI)
        case 2 => (col("d"), constD)
        case _ => (col("s"), constS)
      }
      rnd.nextInt(10) match {
        case 0 => c === v
        case 1 => c =!= v
        case 2 => c < v
        case 3 => c <= v
        case 4 => c > v
        case 5 => c >= v
        case 6 => c.isNull
        case 7 => c.isNotNull
        case 8 => c <=> v
        case _ => c.isin(v, v, v) // isin over sampled consts
      }
    }
    def pred(): Column = rnd.nextInt(4) match {
      case 0 => simple() && simple()
      case 1 => simple() || simple()
      case _ => simple()
    }
    def canon(d: DataFrame, p: Column): Seq[String] =
      d.filter(p).collect().map(_.toString).sorted.toSeq
    var nonEmpty = 0
    (1 to 80).foreach { i =>
      val p = pred()
      val expect = canon(pq, p)
      val got = canon(st, p)
      assert(got == expect,
        s"fuzz predicate #$i diverged: $p — store ${got.length} rows vs " +
          s"parquet ${expect.length}; first diff: " +
          s"${(expect.toSet -- got.toSet).take(2)} missing, " +
          s"${(got.toSet -- expect.toSet).take(2)} extra")
      if (expect.nonEmpty) nonEmpty += 1
    }
    // the battery must actually exercise matches, not vacuously pass
    assert(nonEmpty >= 30, s"only $nonEmpty/80 predicates matched rows — " +
      "the generator drifted into a vacuous battery")
  }
}
