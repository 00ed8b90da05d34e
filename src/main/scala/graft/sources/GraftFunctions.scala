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
