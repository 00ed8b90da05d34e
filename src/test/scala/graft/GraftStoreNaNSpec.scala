package graft

import java.io.File
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.sources.GraftStore

/** NaN discipline of the manifest stats, pinned end to end. Spark orders
  * doubles by a NaN-GREATEST total order (NaN > +Inf, NaN = NaN), while
  * IEEE comparisons with NaN are all false — so a writer that updates
  * min/max/mono with plain `<` silently SKIPS NaN and advertises bounds
  * and an ordering the data does not satisfy. The round-10 writer fix
  * tracks NaN explicitly; these specs pin every consumer of the
  * resulting "NaN" sentinels: the writer's mono demotion, the manifest
  * round-trip, metadata-only aggregates, compaction's stats union
  * (mergeStats), ordering advertisement / sort elision, pruning
  * soundness, planner column statistics, and the `!stats=` version
  * gate that demotes pre-fix double stats. */
class GraftStoreNaNSpec extends SparkSuite {

  private def tempTable(): String =
    graft.ops.Util.managedTempDir("graft_nan_spec_")

  private def writeDf(df: DataFrame, path: String, mode: String = "overwrite"): Unit =
    df.write.format("graft.sources.GraftStore").option("path", path)
      .mode(mode).save()

  private def readBack(path: String): DataFrame =
    spark.read.format("graft.sources.GraftStore").option("path", path).load()

  /** One double column, one single-partition file per write. */
  private def writeVals(path: String, vs: Seq[Double], mode: String): Unit = {
    import spark.implicits._
    writeDf(vs.toDF("v").coalesce(1), path, mode)
  }

  test("writer: NaN placement drives mono demotion and the NaN min/max sentinels") {
    import spark.implicits._
    val path = tempTable()
    writeVals(path, Seq(1.0, Double.NaN, 2.0), "overwrite") // interior NaN
    writeVals(path, Seq(Double.NaN, 1.0), "append")         // NaN then non-NaN
    writeVals(path, Seq(Double.NaN, Double.NaN), "append")  // all NaN
    writeVals(path, Seq(1.0, 2.0, Double.NaN), "append")    // NaN tail: sorted
    val st = GraftStore.readManifest(path).get._2.map(_.stats("v"))
    assert(st.length == 4)
    val Seq(interior, nanFirst, allNan, nanTail) = st
    // mono: only the NaN-tail arrangement is sorted under NaN-greatest
    // (all-NaN is trivially sorted: every value equal and greatest)
    assert(!interior.mono, "non-NaN after NaN is out of order — mono must drop")
    assert(!nanFirst.mono, "NaN before a non-NaN is out of order — mono must drop")
    assert(allNan.mono, "an all-NaN file is trivially sorted")
    assert(nanTail.mono, "NaNs at the tail are exactly Spark's sort order")
    // min: the non-NaN minimum; "NaN" only when every value is NaN
    assert(interior.min == "1.0" && nanFirst.min == "1.0" && nanTail.min == "1.0")
    assert(allNan.min == "NaN")
    // max: the literal "NaN" whenever any value is NaN (= Spark's max())
    assert(st.forall(_.max == "NaN"))
    // and the sentinel survives the fmtEntry/parseEntry round-trip as a
    // real Double.NaN when parsed back
    assert(allNan.min.toDouble.isNaN && interior.max.toDouble.isNaN)
  }

  test("metadata-only min/max over NaN-bearing files equals Spark's NaN-greatest aggregates") {
    import spark.implicits._
    val path = tempTable()
    val vals = Seq(3.0, Double.NaN, 1.5)
    writeVals(path, vals.take(2), "overwrite")
    writeVals(path, vals.drop(2), "append")
    // destroy the data files: if the answer still arrives, it provably
    // came from manifest lines alone
    Option(new File(path, "data").listFiles()).get.foreach(_.delete())
    val agg = readBack(path).agg(min($"v").as("mn"), max($"v").as("mx"))
    assert(agg.queryExecution.executedPlan.toString.contains("metadata-only aggregate"),
      s"NaN-bearing min/max should still answer from metadata:\n${agg.queryExecution.executedPlan}")
    val r = agg.collect()(0)
    val expected = vals.toDF("v").agg(min($"v"), max($"v")).collect()(0)
    assert(r.getDouble(0) == expected.getDouble(0) && r.getDouble(0) == 1.5,
      s"metadata MIN diverged from Spark min(): $r vs $expected")
    assert(r.getDouble(1).isNaN && expected.getDouble(1).isNaN,
      s"metadata MAX must be NaN exactly like Spark max(): $r vs $expected")
  }

  test("compaction stats union: an all-NaN file must not poison the merged minimum") {
    import spark.implicits._
    val path = tempTable()
    writeVals(path, Seq(5.0, 6.0), "overwrite")
    writeVals(path, Seq(Double.NaN, Double.NaN), "append")
    assert(GraftStore.compact(spark, path, 1L << 30) > 0)
    val merged = GraftStore.readManifest(path).get._2
    assert(merged.length == 1, "both files should pack into one")
    val st = merged.head.stats("v")
    assert(st.min == "5.0",
      s"merged min must be the real non-NaN minimum, got '${st.min}'")
    assert(st.max == "NaN", "merged max keeps the NaN-greatest sentinel")
    // [5.0, 6.0, NaN, NaN] in concat order IS sorted under NaN-greatest
    assert(st.mono, "sorted non-NaN file + all-NaN tail stays provably sorted")
    // and the metadata-only MIN over the compacted table answers the
    // true minimum (the ADVICE scenario: a "NaN" merged min would skip it)
    Option(new File(path, "data").listFiles()).get.foreach(_.delete())
    val r = readBack(path).agg(min($"v").as("mn"), max($"v").as("mx")).collect()(0)
    assert(r.getDouble(0) == 5.0 && r.getDouble(1).isNaN,
      s"metadata min/max after compaction wrong: $r")
    // content check needs the data back — re-write the same shape and
    // verify the compacted bytes actually hold all four values
    val path2 = tempTable()
    writeVals(path2, Seq(5.0, 6.0), "overwrite")
    writeVals(path2, Seq(Double.NaN, Double.NaN), "append")
    GraftStore.compact(spark, path2, 1L << 30)
    val got = readBack(path2).collect().map(_.getDouble(0))
    assert(got.length == 4 && got.count(_.isNaN) == 2 && got.sorted.take(2).toSeq == Seq(5.0, 6.0))
  }

  test("stats skipping and ordering claims stay sound over NaN-bearing doubles") {
    import spark.implicits._
    val vals = Seq(1.0, 2.0, Double.NaN, 0.5, Double.NaN)
    val path = tempTable()
    writeVals(path, vals.take(3), "overwrite")
    writeVals(path, vals.drop(3), "append")
    def expect(p: DataFrame => DataFrame): Seq[String] =
      p(vals.toDF("v")).collect().map(_.toString).toSeq.sorted
    def got(p: DataFrame => DataFrame): Seq[String] =
      p(readBack(path)).collect().map(_.toString).toSeq.sorted
    // NaN > 1.5 is TRUE in Spark (NaN-greatest): a stale max would prune
    // the NaN rows; the "NaN" max sentinel makes pruning decline instead
    for (f <- Seq[DataFrame => DataFrame](
      _.filter($"v" > 1.5), _.filter($"v" < 1.5), _.filter($"v" >= 2.0),
      _.filter($"v" <= 0.5), _.filter($"v" === Double.NaN))) {
      assert(got(f) == expect(f), "NaN-bearing filter diverged from Spark semantics")
    }
    assert(got(_.filter($"v" > 1.5)).size == 3, "2.0 and both NaN rows match > 1.5")
    // ordering: DSv2 outputOrdering is PER PARTITION (one file each).
    // Both files above are individually NaN-TAIL sorted, so advertising
    // v ASC is sound — and Spark's global orderBy still range-exchanges,
    // so the cross-file min/max overlap cannot leak a wrong global order
    assert(new graft.sources.GraftStoreScan(path).outputOrdering()
      .map(_.toString).exists(_.contains("v")),
      "per-file NaN-tail-sorted files may advertise per-partition order")
    val globalOrd = readBack(path).orderBy($"v").collect().map(_.getDouble(0))
    assert(globalOrd.take(3).toSeq == Seq(0.5, 1.0, 2.0) &&
      globalOrd.drop(3).forall(_.isNaN),
      s"global sort over per-file-sorted NaN files wrong: ${globalOrd.mkString(",")}")
    // a file with an INTERIOR NaN is not sorted under NaN-greatest — the
    // writer's mono demotion must stop any ordering advertisement
    val interiorPath = tempTable()
    writeVals(interiorPath, Seq(1.0, Double.NaN, 0.5), "overwrite")
    assert(new graft.sources.GraftStoreScan(interiorPath).outputOrdering().isEmpty,
      "an interior-NaN file must not advertise a sort order")
    // ...while a single NaN-tailed file IS sorted, may advertise, and a
    // sort over it must return exactly Spark's NaN-last order
    val sortedPath = tempTable()
    writeVals(sortedPath, Seq(1.0, 2.0, Double.NaN), "overwrite")
    assert(new graft.sources.GraftStoreScan(sortedPath).outputOrdering()
      .map(_.toString).exists(_.contains("v")))
    val ordered = readBack(sortedPath).orderBy($"v").collect().map(_.getDouble(0))
    assert(ordered(0) == 1.0 && ordered(1) == 2.0 && ordered(2).isNaN,
      s"sort-elided read must keep NaN last: ${ordered.mkString(",")}")
  }

  test("planner column statistics: non-finite bounds stay out of the CBO feed") {
    import spark.implicits._
    val path = tempTable()
    // u: all-NaN (min and max both "NaN"); w: NaN-bearing (real min, NaN
    // max); x: clean doubles — both bounds reported
    writeDf(Seq((Double.NaN, 1.0, 10.0), (Double.NaN, Double.NaN, 20.0))
      .toDF("u", "w", "x").coalesce(1), path)
    val stats = new graft.sources.GraftStoreScan(path).estimateStatistics()
    val cols = stats.columnStats()
    def statOf(c: String) = {
      val k = cols.keySet().toArray.find(_.toString == c)
      assert(k.isDefined, s"column $c missing from columnStats")
      cols.get(k.get)
    }
    val u = statOf("u")
    assert(!u.min().isPresent && !u.max().isPresent,
      "an all-NaN column must contribute no min/max to attributeStats")
    val w = statOf("w")
    assert(w.min().isPresent && w.min().get() == Double.box(1.0),
      "a NaN-bearing column's real minimum is still a sound bound")
    assert(!w.max().isPresent,
      "a NaN max sentinel must not be boxed into attributeStats")
    val x = statOf("x")
    assert(x.min().isPresent && x.max().isPresent &&
      x.min().get() == Double.box(10.0) && x.max().get() == Double.box(20.0))
    assert(u.distinctCount().isPresent, "NDV is NaN-safe and stays reported")
  }

  test("!stats version gate: pre-fix manifests have double stats demoted on read") {
    import spark.implicits._
    val path = tempTable()
    writeDf(spark.range(0, 100, 1, 1).toDF("id")
      .withColumn("v", $"id".cast("double")), path)
    val before = GraftStore.readManifest(path).get._2
    assert(before.head.stats.contains("v") && before.head.stats.contains("id"))
    // simulate a table written by the pre-NaN-fix (v1) writer: same
    // entries, no !stats header — its double stats may be unsound. A
    // pre-fix writer predates !uid stamping too, so strip both (and the
    // uid strip is load-bearing: manifests are immutable-per-uid by
    // contract, so an in-place rewrite that KEPT the uid would justly be
    // served the cached pre-rewrite parse)
    for (f <- new File(path).listFiles() if f.getName.startsWith("_manifest")) {
      val lines = new String(Files.readAllBytes(f.toPath), StandardCharsets.UTF_8)
        .split('\n').filterNot(l => l.startsWith("!stats=") || l.startsWith("!uid="))
      Files.write(Paths.get(f.getPath), lines.mkString("\n").getBytes(StandardCharsets.UTF_8))
    }
    val after = GraftStore.readManifest(path).get._2
    assert(!after.head.stats.contains("v"),
      "v1 double stats must be dropped at parse time (max/mono untrustworthy)")
    assert(after.head.stats.contains("id"),
      "integer/long stats are NaN-free and survive the demotion")
    // the demoted table still answers queries — from data, correctly
    assert(readBack(path).filter($"v" > 50.0).count() == 49)
    // and a NEW commit on the old table claims !stats=2 while carrying
    // only demoted (double-stats-free) old entries — no stale leak
    writeVals(path, Seq(1.0, 2.0), "append")
    val recommitted = GraftStore.readManifest(path).get._2
    val (oldE, newE) = recommitted.partition(_.rows == 100)
    assert(oldE.head.stats.get("v").isEmpty,
      "carried-forward v1 entries must stay double-stats-free in a v2 manifest")
    assert(newE.head.stats.get("v").exists(_.min == "1.0"),
      "entries written by the v2 writer keep their double stats")
  }
}
