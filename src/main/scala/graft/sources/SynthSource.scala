package graft.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.{Expression, Expressions, NamedReference, Transform}
import org.apache.spark.sql.connector.expressions.aggregate.{AggregateFunc, Aggregation, CountStar, Max, Min, Sum}
import org.apache.spark.sql.connector.read.{Batch, HasPartitionKey, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownAggregates, SupportsPushDownFilters, SupportsPushDownRequiredColumns, SupportsReportPartitioning, SupportsRuntimeFiltering}
import org.apache.spark.sql.connector.read.partitioning.{KeyGroupedPartitioning, Partitioning, UnknownPartitioning}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThan, GreaterThanOrEqual, In, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types.{DataType, DoubleType, IntegerType, LongType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Custom DataSource V2 connector (the full source-API surface): a
  * deterministic synthetic table `(id BIGINT, bucket INT, val DOUBLE)` for
  * `id ∈ [0, rows)` with `bucket = id % 50` and `val = id·37 mod 1000`
  * (integer-valued double, so float summation is order-independent and
  * cross-engine exact).
  *
  * Demonstrates the scan optimizations that matter at 100 TB, at the
  * CONNECTOR level rather than relying on parquet's built-ins:
  *  - filter pushdown (`SupportsPushDownFilters`): range predicates on
  *    `id` narrow the generated interval itself — the analog of a source
  *    that turns predicates into index/partition pruning, claimed fully so
  *    Spark drops its post-scan filter;
  *  - column pruning (`SupportsPushDownRequiredColumns`): the reader emits
  *    only the requested fields;
  *  - aggregate pushdown (`SupportsPushDownAggregates`): COUNT/SUM/MIN/MAX
  *    (optionally grouped by `bucket`) evaluate INSIDE the source — each
  *    input partition emits at most one row per group instead of its raw
  *    rows, so the exchange that feeds the final aggregate moves `#groups ×
  *    #partitions` rows, not the table. This is the DSv2 contract behind
  *    "push the aggregate to the storage layer" at 100 TB;
  *  - key-grouped partitioning (`partitionBy=bucket` option →
  *    `SupportsReportPartitioning` + `HasPartitionKey`): the scan exposes
  *    one input partition per bucket, each tagged with its partition key,
  *    and reports connector `KeyGroupedPartitioning` over `bucket`. With
  *    `spark.sql.sources.v2.bucketing.enabled=true` Spark plans
  *    storage-partitioned joins / aggregates on `bucket` with ZERO
  *    Exchange — the Iceberg-style SPJ machinery, exercised end-to-end by
  *    q_src_spj and pinned shuffle-free in PlanShapeSpec.
  * `slices` input partitions make the un-bucketed mode a genuinely
  * parallel scan.
  */
object SynthSource {
  val NumBuckets = 50
  val fullSchema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("bucket", IntegerType, nullable = false),
    StructField("val", DoubleType, nullable = false)))
  def bucketOf(id: Long): Int = (id % NumBuckets).toInt
  def valOf(id: Long): Double = (id * 37 % 1000).toDouble

  def colType(name: String): DataType = name match {
    case "id" => LongType
    case "bucket" => IntegerType
    case "val" => DoubleType
  }

  /** Closed set of aggregate kinds this source evaluates natively. The
    * partial values are chosen so Spark's standard final step (SUM over
    * counts/sums, MIN over mins, MAX over maxes) recombines them exactly:
    * counts are BIGINT and `val` sums stay integer-valued in a double.
    */
  sealed trait SynthAgg extends Serializable {
    def resultField(i: Int, nullable: Boolean): StructField
  }
  case object AggCount extends SynthAgg {
    def resultField(i: Int, nullable: Boolean): StructField =
      StructField(s"agg_${i}_count", LongType, nullable = false)
  }
  final case class AggSum(col: String) extends SynthAgg {
    def resultField(i: Int, nullable: Boolean): StructField =
      StructField(s"agg_${i}_sum_$col", DoubleType, nullable = nullable)
  }
  final case class AggMin(col: String) extends SynthAgg {
    def resultField(i: Int, nullable: Boolean): StructField =
      StructField(s"agg_${i}_min_$col", colType(col), nullable = nullable)
  }
  final case class AggMax(col: String) extends SynthAgg {
    def resultField(i: Int, nullable: Boolean): StructField =
      StructField(s"agg_${i}_max_$col", colType(col), nullable = nullable)
  }

  /** An accepted pushed aggregation: the funcs plus whether it groups by
    * `bucket` (the only grouping this source understands). */
  final case class AggSpec(byBucket: Boolean, funcs: Seq[SynthAgg])
      extends Serializable {
    /** Scan output schema: group columns FIRST, then one column per
      * aggregate — the layout `V2ScanRelationPushDown` wires positionally.
      * Global (ungrouped) partials are nullable: an empty partition still
      * emits one row whose sum/min/max are NULL (count 0), which the final
      * SUM/MIN/MAX ignore. Grouped mode emits no row for an empty group,
      * so its fields stay non-null. */
    def schema: StructType = {
      val nullable = !byBucket
      val group = if (byBucket) Seq(StructField("bucket", IntegerType, nullable = false)) else Nil
      StructType(group ++ funcs.zipWithIndex.map { case (f, i) => f.resultField(i, nullable) })
    }
  }
}

class SynthSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    SynthSource.fullSchema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new SynthTable(properties.getOrDefault("rows", "100000").toLong,
      properties.getOrDefault("slices", "8").toInt,
      properties.getOrDefault("partitionBy", "") == "bucket",
      properties.getOrDefault("microBatchRows", "4096").toLong,
      properties.getOrDefault("columnar", "false").toBoolean)
}

class SynthTable(rows: Long, slices: Int, byBucket: Boolean,
    microBatchRows: Long, columnar: Boolean) extends Table with SupportsRead {
  override def name(): String = s"synth($rows)"
  override def schema(): StructType = SynthSource.fullSchema
  override def partitioning(): Array[Transform] =
    if (byBucket) Array(Expressions.identity("bucket")) else Array.empty
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new SynthScanBuilder(rows, slices, byBucket, microBatchRows, columnar)
}

class SynthScanBuilder(rows: Long, slices: Int, byBucket: Boolean,
    microBatchRows: Long = 4096, columnar: Boolean = false)
    extends ScanBuilder
    with SupportsPushDownFilters with SupportsPushDownRequiredColumns
    with SupportsPushDownAggregates {
  import SynthSource._

  private var lo = 0L
  private var hi = rows
  private var pushed: Array[Filter] = Array.empty
  private var required: StructType = SynthSource.fullSchema
  private var agg: Option[AggSpec] = None

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (accepted, residual) = filters.partition {
      case GreaterThanOrEqual("id", _: Long) | GreaterThan("id", _: Long) |
           LessThan("id", _: Long) | LessThanOrEqual("id", _: Long) => true
      case _ => false
    }
    accepted.foreach {
      case GreaterThanOrEqual("id", v: Long) => lo = math.max(lo, v)
      case GreaterThan("id", v: Long) =>
        // v+1 overflows at Long.MaxValue: id > MaxValue matches nothing
        if (v == Long.MaxValue) lo = hi else lo = math.max(lo, v + 1)
      case LessThan("id", v: Long) => hi = math.min(hi, v)
      case LessThanOrEqual("id", v: Long) =>
        // id <= MaxValue matches everything: leave hi unchanged
        if (v != Long.MaxValue) hi = math.min(hi, v + 1)
      case _ =>
    }
    pushed = accepted
    residual // accepted filters are claimed FULLY: Spark drops its copy
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  private def singleField(e: Expression): Option[String] = e match {
    case nr: NamedReference if nr.fieldNames.length == 1 => Some(nr.fieldNames()(0))
    case _ => None
  }
  private def translate(f: AggregateFunc): Option[SynthAgg] = f match {
    case _: CountStar => Some(AggCount)
    case s: Sum if !s.isDistinct =>
      // only val: sum(id)/sum(bucket) would need Spark's long-sum overflow
      // semantics replicated here; val is integer-valued-in-double => exact
      singleField(s.column).filter(_ == "val").map(AggSum)
    case m: Min => singleField(m.column).map(AggMin)
    case m: Max => singleField(m.column).map(AggMax)
    case _ => None
  }
  private def groupsByBucket(a: Aggregation): Boolean =
    a.groupByExpressions.length == 1 &&
      singleField(a.groupByExpressions()(0)).contains("bucket")
  private def translateAll(a: Aggregation): Option[Seq[SynthAgg]] = {
    val t = a.aggregateExpressions.map(translate)
    if (t.exists(_.isEmpty)) None else Some(t.toSeq.flatten)
  }

  /** Complete pushdown is only claimed in bucket-partitioned mode with
    * `GROUP BY bucket`: every input partition holds exactly one bucket, so
    * per-partition results are already the FINAL per-group answers and the
    * groups across partitions are disjoint — the precondition complete
    * pushdown's "no re-aggregation" contract rests on. */
  override def supportCompletePushDown(a: Aggregation): Boolean =
    byBucket && groupsByBucket(a) && translateAll(a).isDefined

  override def pushAggregation(a: Aggregation): Boolean = {
    if (!(a.groupByExpressions.isEmpty || groupsByBucket(a))) return false
    translateAll(a) match {
      case Some(funcs) =>
        agg = Some(AggSpec(groupsByBucket(a), funcs))
        true
      case None => false
    }
  }

  override def build(): Scan =
    new SynthScan(lo, hi, slices, byBucket, required, pushed, agg,
      microBatchRows, columnar)
}

class SynthScan(lo: Long, hi: Long, slices: Int, byBucket: Boolean,
    required: StructType, pushed: Array[Filter],
    agg: Option[SynthSource.AggSpec], microBatchRows: Long = 4096,
    columnar: Boolean = false)
    extends Scan with Batch with SupportsReportPartitioning
    with SupportsRuntimeFiltering {
  import SynthSource._

  private val output: StructType = agg.map(_.schema).getOrElse(required)

  // runtime partition pruning (DPP-for-connectors): in bucketed mode the
  // scan offers `bucket` as a runtime-filterable attribute; when the
  // optimizer proves a joined dim narrows it (dynamicpruning subquery),
  // filter() arrives AFTER the dim side ran and BEFORE this scan plans
  // its partitions — whole bucket partitions are dropped, the connector
  // analog of hive-partition DPP. None = no runtime filter received.
  @volatile private var runtimeKeep: Option[Set[Int]] = None

  override def filterAttributes(): Array[NamedReference] =
    if (byBucket) Array(Expressions.column("bucket")) else Array.empty
  override def filter(filters: Array[Filter]): Unit = {
    val keeps = filters.collect {
      case In("bucket", vs) => vs.collect { case i: Int => i }.toSet
      case EqualTo("bucket", v: Int) => Set(v)
    }
    if (keeps.nonEmpty) runtimeKeep = Some(keeps.reduce(_ intersect _))
  }

  override def readSchema(): StructType = output
  override def description(): String =
    s"SynthScan range=[$lo,$hi) mode=${if (byBucket) "bucketed" else "sliced"} " +
      s"cols=${output.fieldNames.mkString(",")} " +
      s"pushed=${pushed.mkString("[", ", ", "]")} " +
      s"aggPushed=${agg.map(a => (if (a.byBucket) "byBucket:" else "global:") +
        a.funcs.mkString(",")).getOrElse("none")}"
  override def toBatch: Batch = this

  override def planInputPartitions(): Array[InputPartition] = {
    if (byBucket) {
      // one partition per bucket value, even if its slice of [lo,hi) is
      // empty — keeps the partition-value sets of two synth scans aligned
      // for storage-partitioned joins regardless of pushed ranges;
      // runtime filtering (above) may drop buckets a dim join disproved
      (0 until NumBuckets)
        .filter(b => runtimeKeep.forall(_.contains(b)))
        .map(b => SynthBucketPartition(b, lo, hi)).toArray
    } else {
      val n = math.max(1, slices)
      val span = math.max(0L, hi - lo)
      (0 until n).map { i =>
        SynthPartition(lo + span * i / n, lo + span * (i + 1) / n)
      }.filter(p => p.end > p.start).toArray
    }
  }

  /** Reported to Spark only when the scan's output still carries `bucket`
    * (raw reads selecting it, or grouped-aggregate reads): connector
    * `KeyGroupedPartitioning` over it lets joins/aggregates clustered on
    * `bucket` skip their Exchange entirely (v2 bucketing conf gates it). */
  override def outputPartitioning(): Partitioning =
    if (byBucket && output.fieldNames.contains("bucket")) {
      new KeyGroupedPartitioning(
        Array[Expression](Expressions.identity("bucket")), NumBuckets)
    } else {
      new UnknownPartitioning(planInputPartitions().length)
    }

  override def createReaderFactory(): PartitionReaderFactory =
    new SynthReaderFactory(output, agg, columnar && agg.isEmpty)

  /** Streaming half of the connector (MICRO_BATCH_READ): the same id
    * range replayed as a bounded stream, at most `microBatchRows` ids per
    * micro-batch — an admission-control stand-in for "the offsets that
    * arrived since the last trigger" in a real log-backed source (Kafka,
    * a manifest log). Offsets are plain positions in the id range, so a
    * restart resumes from the checkpoint exactly; each batch re-slices
    * its sub-range across `slices` parallel partitions. Filter pushdown
    * composes (lo/hi were already narrowed when this scan was built);
    * aggregate pushdown does not apply to streaming plans and
    * key-grouped partition mode is a batch-layout concern, so both are
    * ignored here. StreamingParitySpec proves batch/stream equality and
    * genuine multi-batch incremental progress. */
  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new SynthMicroBatchStream(lo, hi, slices, required, microBatchRows)
}

/** Offset = exclusive position in the synthetic id range. */
case class SynthOffset(pos: Long) extends Offset {
  override def json(): String = pos.toString
}

class SynthMicroBatchStream(lo: Long, hi: Long, slices: Int,
    required: StructType, microBatchRows: Long) extends MicroBatchStream
    with org.apache.spark.sql.connector.read.streaming.SupportsAdmissionControl {
  import org.apache.spark.sql.connector.read.streaming.ReadLimit
  private val step = math.max(1L, microBatchRows)

  override def initialOffset(): Offset = SynthOffset(lo)
  override def deserializeOffset(json: String): Offset = SynthOffset(json.toLong)
  // ADMISSION CONTROL through the engine's own API (round 18): the next
  // end offset derives from the START offset the ENGINE hands us —
  // which after a checkpoint restart is the restored position. The
  // previous hand-rolled variant (a `furthest` instance field advanced
  // per poll) reset to `lo` in a new incarnation, handed the engine an
  // offset BEHIND its restored position, and the next batch re-read
  // already-committed ids as fresh data — exactly-once broke on every
  // restart (caught by GraftStoreSpec's cross-incarnation restart pin).
  // Offsets must derive from engine-provided state, never from writer
  // instance memory — the same rule the sink's epoch marker follows.
  // The engine-supplied ReadLimit is HONORED, not assumed (r18 review):
  // Trigger.AvailableNow/Once pass allAvailable and must drain to `hi`
  // in one batch; maxRows bounds the quantum; composite limits take
  // their tightest rows bound.
  override def getDefaultReadLimit: ReadLimit = ReadLimit.maxRows(step)
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    import org.apache.spark.sql.connector.read.streaming.{CompositeReadLimit, ReadAllAvailable, ReadMaxRows}
    val s = math.max(start.asInstanceOf[SynthOffset].pos, lo)
    def boundOf(l: ReadLimit): Long = l match {
      case r: ReadMaxRows => math.min(hi, s + r.maxRows())
      case _: ReadAllAvailable => hi
      case c: CompositeReadLimit => c.getReadLimits.map(boundOf).min
      case _ => math.min(hi, s + step)
    }
    SynthOffset(boundOf(limit))
  }
  /** The log's true latest available position — what the
    * Trigger.AvailableNow wrapper snapshots as its end target. */
  override def reportLatestOffset(): Offset = SynthOffset(hi)
  override def latestOffset(): Offset = throw new IllegalStateException(
    "latestOffset() must not be called on a SupportsAdmissionControl source")
  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[SynthOffset].pos
    val e = end.asInstanceOf[SynthOffset].pos
    val n = math.max(1, slices)
    val span = math.max(0L, e - s)
    (0 until n).map { i =>
      SynthPartition(s + span * i / n, s + span * (i + 1) / n)
    }.filter(p => p.end > p.start).toArray
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new SynthReaderFactory(required, None)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

case class SynthPartition(start: Long, end: Long) extends InputPartition

/** Bucket partition: ids ≡ bucket (mod 50) within [lo, hi). Carries its
  * key so Spark's key-grouped machinery can line partitions up across the
  * two sides of a storage-partitioned join. */
case class SynthBucketPartition(bucket: Int, lo: Long, hi: Long)
    extends InputPartition with HasPartitionKey {
  override def partitionKey(): InternalRow =
    new GenericInternalRow(Array[Any](bucket))
  /** First id ≥ lo with id % 50 == bucket (ids are non-negative). */
  def firstId: Long = {
    val off = (bucket - lo % SynthSource.NumBuckets + SynthSource.NumBuckets) %
      SynthSource.NumBuckets
    lo + off
  }
}

class SynthReaderFactory(output: StructType,
    agg: Option[SynthSource.AggSpec], columnar: Boolean = false)
    extends PartitionReaderFactory {
  import SynthSource._

  private def bounds(partition: InputPartition): (Long, Long, Long) =
    partition match {
      case p: SynthPartition => (p.start, p.end, 1L)
      case b: SynthBucketPartition => (b.firstId, b.hi, NumBuckets.toLong)
    }

  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    agg match {
      case Some(spec) => new SynthAggReader(partition, spec)
      case None =>
        val (first, limit, step) = bounds(partition)
        new SynthRowReader(output, first, limit, step)
    }

  // the vectorized path (columnar=true option, raw reads only): the scan
  // hands Spark ColumnarBatches and the plan gets a ColumnarToRow bridge
  // feeding whole-stage codegen — the parquet-reader architecture,
  // demonstrated at the connector level
  override def supportColumnarReads(partition: InputPartition): Boolean = columnar
  override def createColumnarReader(
      partition: InputPartition): PartitionReader[org.apache.spark.sql.vectorized.ColumnarBatch] = {
    val (first, limit, step) = bounds(partition)
    new SynthColumnarReader(output, first, limit, step)
  }
}

/** Vectorized reader: fills OnHeapColumnVectors 4096 ids at a time — one
  * virtual call per BATCH instead of per row-field, and the consumer
  * reads primitive arrays directly (the reason columnar scan + WSCG is
  * the fast path for parquet; here the "decode" is the generator
  * arithmetic). The batch and its vectors are reused across next()
  * calls, as the parquet vectorized reader does. */
class SynthColumnarReader(output: StructType, first: Long, limit: Long,
    step: Long)
    extends PartitionReader[org.apache.spark.sql.vectorized.ColumnarBatch] {
  import org.apache.spark.sql.execution.vectorized.OnHeapColumnVector
  import org.apache.spark.sql.vectorized.{ColumnarBatch, ColumnVector}

  private val BatchRows = 4096
  private val vectors = OnHeapColumnVector.allocateColumns(BatchRows, output)
  private val batch = new ColumnarBatch(vectors.map(v => v: ColumnVector))
  private var cur = first

  override def next(): Boolean = {
    if (cur >= limit) return false
    var n = 0
    vectors.foreach(_.reset())
    while (n < BatchRows && cur < limit) {
      var i = 0
      while (i < output.fields.length) {
        output.fields(i).name match {
          case "id" => vectors(i).putLong(n, cur)
          case "bucket" => vectors(i).putInt(n, SynthSource.bucketOf(cur))
          case "val" => vectors(i).putDouble(n, SynthSource.valOf(cur))
        }
        i += 1
      }
      n += 1
      cur += step
    }
    batch.setNumRows(n)
    true
  }

  override def get(): ColumnarBatch = batch
  override def close(): Unit = batch.close()
}

/** Raw-row reader over an arithmetic id progression (step 1 for slice
  * partitions, step 50 for single-bucket partitions). */
class SynthRowReader(output: StructType, first: Long, limit: Long, step: Long)
    extends PartitionReader[InternalRow] {
  private var cur = first - step
  // column generators resolved once per partition, and one reusable
  // row filled in place — no per-row allocation in the inner loop
  private val gens: Array[Long => Any] = output.fields.map(_.name match {
    case "id" => (id: Long) => id
    case "bucket" => (id: Long) => SynthSource.bucketOf(id)
    case "val" => (id: Long) => SynthSource.valOf(id)
  })
  private val row = new GenericInternalRow(gens.length)
  override def next(): Boolean = { cur += step; cur < limit }
  override def get(): InternalRow = {
    var i = 0
    while (i < gens.length) { row.update(i, gens(i)(cur)); i += 1 }
    row
  }
  override def close(): Unit = ()
}

/** Pushed-aggregate reader: folds its id range into per-group accumulators
  * and emits one row per non-empty group (every group for the global
  * spec — the zero-row partial row carries NULL sum/min/max that the final
  * SUM/MIN/MAX ignore). The partition's raw rows never leave the reader:
  * this is the "aggregate evaluated at the storage layer" half of the
  * pushdown contract, the other half being Spark's final recombination. */
class SynthAggReader(partition: InputPartition, spec: SynthSource.AggSpec)
    extends PartitionReader[InternalRow] {
  import SynthSource._

  private val (first, limit, step) = partition match {
    case p: SynthPartition => (p.start, p.end, 1L)
    case b: SynthBucketPartition => (b.firstId, b.hi, NumBuckets.toLong)
  }

  // one accumulator row per live group, keyed by bucket (or the single
  // global group at key 0); groups are emitted in ascending bucket order
  // so the reader stays deterministic under any downstream ordering
  private val nGroups = if (spec.byBucket) NumBuckets else 1
  private val counts = new Array[Long](nGroups)
  private val accs: Array[Array[Double]] = Array.fill(spec.funcs.length)(
    new Array[Double](nGroups))

  locally {
    var id = first
    while (id < limit) {
      val g = if (spec.byBucket) bucketOf(id) else 0
      val n = counts(g)
      var i = 0
      while (i < spec.funcs.length) {
        val a = accs(i)
        spec.funcs(i) match {
          case AggCount => // counts array tracks it
          case AggSum(col) => a(g) += colVal(col, id)
          case AggMin(col) =>
            val v = colVal(col, id); if (n == 0 || v < a(g)) a(g) = v
          case AggMax(col) =>
            val v = colVal(col, id); if (n == 0 || v > a(g)) a(g) = v
        }
        i += 1
      }
      counts(g) = n + 1
      id += step
    }
  }

  private def colVal(col: String, id: Long): Double = col match {
    case "id" => id.toDouble // ids stay < 2^53: exact in a double
    case "bucket" => bucketOf(id).toDouble
    case "val" => valOf(id)
  }

  /** Groups this partition emits: non-empty buckets ascending, or the
    * single global row (even when empty — partial-agg contract). */
  private val emitGroups: Array[Int] =
    if (spec.byBucket) (0 until nGroups).filter(counts(_) > 0).toArray
    else Array(0)
  private var pos = -1
  private val row = new GenericInternalRow(spec.schema.length)

  override def next(): Boolean = { pos += 1; pos < emitGroups.length }
  override def get(): InternalRow = {
    val g = emitGroups(pos)
    var o = 0
    if (spec.byBucket) { row.update(o, g); o += 1 }
    var i = 0
    while (i < spec.funcs.length) {
      val empty = counts(g) == 0
      val v: Any = spec.funcs(i) match {
        case AggCount => counts(g)
        case AggSum(_) => if (empty) null else accs(i)(g)
        case AggMin(col) => if (empty) null else fromDouble(col, accs(i)(g))
        case AggMax(col) => if (empty) null else fromDouble(col, accs(i)(g))
      }
      row.update(o + i, v)
      i += 1
    }
    row
  }
  private def fromDouble(col: String, v: Double): Any = col match {
    case "id" => v.toLong
    case "bucket" => v.toInt
    case "val" => v
  }
  override def close(): Unit = ()
}
