package graft.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownFilters, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.sources.{Filter, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types.{DoubleType, IntegerType, LongType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Custom DataSource V2 connector (the full source-API surface): a
  * deterministic synthetic table `(id BIGINT, bucket INT, val DOUBLE)` for
  * `id ∈ [0, rows)` with `bucket = id % 50` and `val = id·37 mod 1000`
  * (integer-valued double, so float summation is order-independent and
  * cross-engine exact).
  *
  * Demonstrates the two scan optimizations that matter at 100 TB, at the
  * CONNECTOR level rather than relying on parquet's built-ins:
  *  - filter pushdown (`SupportsPushDownFilters`): range predicates on
  *    `id` narrow the generated interval itself — the analog of a source
  *    that turns predicates into index/partition pruning, claimed fully so
  *    Spark drops its post-scan filter;
  *  - column pruning (`SupportsPushDownRequiredColumns`): the reader emits
  *    only the requested fields.
  * `slices` input partitions make it a genuinely parallel scan.
  */
object SynthSource {
  val fullSchema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("bucket", IntegerType, nullable = false),
    StructField("val", DoubleType, nullable = false)))
  def bucketOf(id: Long): Int = (id % 50).toInt
  def valOf(id: Long): Double = (id * 37 % 1000).toDouble
}

class SynthSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    SynthSource.fullSchema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new SynthTable(properties.getOrDefault("rows", "100000").toLong,
      properties.getOrDefault("slices", "8").toInt)
}

class SynthTable(rows: Long, slices: Int) extends Table with SupportsRead {
  override def name(): String = s"synth($rows)"
  override def schema(): StructType = SynthSource.fullSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new SynthScanBuilder(rows, slices)
}

class SynthScanBuilder(rows: Long, slices: Int) extends ScanBuilder
    with SupportsPushDownFilters with SupportsPushDownRequiredColumns {
  private var lo = 0L
  private var hi = rows
  private var pushed: Array[Filter] = Array.empty
  private var required: StructType = SynthSource.fullSchema

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

  override def build(): Scan = new SynthScan(lo, hi, slices, required, pushed)
}

class SynthScan(lo: Long, hi: Long, slices: Int, required: StructType,
    pushed: Array[Filter]) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def description(): String =
    s"SynthScan range=[$lo,$hi) cols=${required.fieldNames.mkString(",")} " +
      s"pushed=${pushed.mkString("[", ", ", "]")}"
  override def toBatch: Batch = this

  override def planInputPartitions(): Array[InputPartition] = {
    val n = math.max(1, slices)
    val span = math.max(0L, hi - lo)
    (0 until n).map { i =>
      SynthPartition(lo + span * i / n, lo + span * (i + 1) / n)
    }.filter(p => p.end > p.start).toArray
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new SynthReaderFactory(required)
}

case class SynthPartition(start: Long, end: Long) extends InputPartition

class SynthReaderFactory(required: StructType)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[SynthPartition]
    new PartitionReader[InternalRow] {
      private var cur = p.start - 1
      // column generators resolved once per partition, and one reusable
      // row filled in place — no per-row allocation in the inner loop
      private val gens: Array[Long => Any] = required.fields.map(_.name match {
        case "id" => (id: Long) => id
        case "bucket" => (id: Long) => SynthSource.bucketOf(id)
        case "val" => (id: Long) => SynthSource.valOf(id)
      })
      private val row =
        new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(gens.length)
      override def next(): Boolean = { cur += 1; cur < p.end }
      override def get(): InternalRow = {
        var i = 0
        while (i < gens.length) { row.update(i, gens(i)(cur)); i += 1 }
        row
      }
      override def close(): Unit = ()
    }
  }
}
