package graft.sources

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.functions.{BoundFunction, ScalarFunction, UnboundFunction}
import org.apache.spark.sql.types.{DataType, IntegerType, LongType, StructType}

/** The engine's canonical bucket hash — defined ONCE and referenced by
  * every party that must agree on it: the V2 scalar function Spark
  * resolves `bucket(n, col)` write distributions through (so the
  * exchange routes each key to its bucket's task), the rolling writer
  * (so each file is provably single-bucket), and the scan builder's
  * bucket-equality pruning (so `k = v` drops every file of the other
  * n-1 buckets with zero I/O). A 64-bit finalizer (splitmix64) rather
  * than `v % n`: real keys are often themselves sequential or
  * power-of-two strided, and a plain modulus would alias those patterns
  * into skewed buckets — the finalizer's avalanche makes bucket loads
  * uniform regardless of key structure, which is the entire point of
  * bucketing 100 TB: equal-sized co-partitioned cells. */
object GraftBucket {
  def hash64(v: Long): Long = {
    var z = v + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }
  def bucket(n: Int, v: Long): Int = {
    val m = hash64(v) % n
    (if (m < 0) m + n else m).toInt
  }
}

/** `bucket` as a catalog V2 function (FunctionCatalog): what lets
  * Spark's write-distribution machinery resolve the
  * `PARTITIONED BY (bucket(n, k))` transform into an evaluable exchange
  * key (DistributionAndOrderingUtils.resolveTransformExpression) — the
  * Iceberg SparkFunctions pattern. Bound for int/long keys; the int
  * form rides an implicit widening cast, so the function value always
  * equals the writer's `GraftBucket.bucket(n, v.toLong)`. */
class GraftBucketUnbound extends UnboundFunction {
  override def name(): String = "bucket"
  override def description(): String =
    "bucket(numBuckets, col) — deterministic hash bucket of an int/long key"
  override def bind(inputType: StructType): BoundFunction = {
    require(inputType.fields.length == 2,
      s"bucket takes (numBuckets, value), got ${inputType.catalogString}")
    val vt = inputType.fields(1).dataType
    require(vt == IntegerType || vt == LongType,
      s"bucket supports int/long keys, got ${vt.catalogString}")
    new GraftBucketBound
  }
}

class GraftBucketBound extends ScalarFunction[Integer] {
  override def inputTypes(): Array[DataType] = Array(IntegerType, LongType)
  override def resultType(): DataType = IntegerType
  override def name(): String = "bucket"
  // SPJ compares partition transforms by canonicalName: two graft tables
  // bucketed (same n) on compatible key types are provably co-partitioned
  override def canonicalName(): String = "graft.bucket(int,bigint)"
  override def isResultNullable: Boolean = true
  override def produceResult(input: InternalRow): Integer =
    if (input.isNullAt(1)) null
    else Int.box(GraftBucket.bucket(input.getInt(0), input.getLong(1)))
}

/** The TEMPORAL transform family as catalog V2 functions (round 15) —
  * what lets Spark's write-distribution machinery resolve a NON-FINAL
  * `days(ts)` / `hours` / `months` / `years` term of a COMPOSITE spec
  * into an evaluable SORT key (the Iceberg SparkFunctions pattern,
  * completing what [[GraftBucketUnbound]] started for bucket). The
  * values returned here only need to be ORDER-ISOMORPHIC to the rolling
  * writer's derived cell indices — they are the same indices: epoch
  * days/hours from micros via floorDiv, calendar month/year index via
  * the shared helpers — so per-task ordering on them makes every
  * derived tuple contiguous and the writer rolls exactly one file per
  * cell. */
class GraftTemporalUnbound(fname: String) extends UnboundFunction {
  import org.apache.spark.sql.types.{DateType, TimestampNTZType, TimestampType}
  override def name(): String = fname
  override def description(): String =
    s"$fname(col) — the partition transform's derived cell index"
  override def bind(inputType: StructType): BoundFunction = {
    require(inputType.fields.length == 1,
      s"$fname takes one column, got ${inputType.catalogString}")
    val dt = inputType.fields(0).dataType
    val isDate = dt == DateType
    require(dt == TimestampType || dt == TimestampNTZType ||
      (isDate && fname != "hours"),
      s"$fname needs a timestamp${if (fname == "hours") "" else "/date"} " +
        s"column, got ${dt.catalogString}")
    new GraftTemporalBound(fname, dt)
  }
}

class GraftTemporalBound(fname: String, dt: DataType)
  extends ScalarFunction[java.lang.Long] {
  import org.apache.spark.sql.types.DateType
  private val isDate = dt == DateType
  override def inputTypes(): Array[DataType] = Array(dt)
  override def resultType(): DataType = LongType
  override def name(): String = fname
  override def canonicalName(): String = s"graft.$fname(${dt.typeName})"
  override def isResultNullable: Boolean = true
  override def produceResult(input: InternalRow): java.lang.Long = {
    if (input.isNullAt(0)) return null
    val day =
      if (isDate) input.getInt(0).toLong
      else Math.floorDiv(input.getLong(0), 86400000000L)
    Long.box(fname match {
      case "days" => day
      case "hours" => Math.floorDiv(input.getLong(0), 3600000000L)
      case "months" => GraftStore.monthIndexOfDay(day).toLong
      case "years" => GraftStore.yearIndexOfDay(day).toLong
    })
  }
}
