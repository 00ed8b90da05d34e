package graft.sources

import java.io.{BufferedInputStream, BufferedOutputStream, DataInputStream, DataOutputStream, File, FileInputStream, FileOutputStream}
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardCopyOption}
import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.distributions.{Distribution, Distributions}
import org.apache.spark.sql.connector.expressions.{Expressions, SortOrder, Transform}
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, RequiresDistributionAndOrdering, SupportsTruncate, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DataSource V2 WRITE path (round-6 verdict item 4 — SynthSource covers
  * the read surface; this is the other half of the connector story): a
  * local-directory table with an Iceberg-style MANIFEST-POINTER commit
  * protocol.
  *
  * Commit protocol (the part that matters at 100 TB, where the "file
  * system" is an object store with no atomic rename-into-directory):
  *   - every task ATTEMPT writes an attempt-unique data file
  *     `data/part-<partition>-<task>.bin` (the task id is unique per
  *     attempt) and reports it in its commit MESSAGE; nothing a task
  *     writes is visible to readers by virtue of existing on disk;
  *   - the driver's `commit(messages)` writes a NEW manifest listing
  *     exactly the committed files (append = old list + new, truncate =
  *     new only) to a temp name, then ATOMIC_MOVEs it onto `_manifest`
  *     — the single atomic step; a reader sees the old table or the new
  *     table, never a mix. Data files never move or rename.
  *   - files from failed/duplicate/speculative attempts are simply never
  *     listed; `commit` garbage-collects any unreferenced files, and
  *     `abort` (job failure) deletes exactly the files its messages name.
  *   - Spark's OutputCommitCoordinator (`useCommitCoordinator` = true)
  *     guarantees at most one attempt per partition delivers a message,
  *     so duplicate attempts cannot BOTH be listed: exactly-once.
  *
  * Rows are stored as length-framed UnsafeRow bytes — Tungsten's own
  * binary layout, so ANY schema round-trips without a custom codec and
  * the reader rebuilds rows with zero parsing (the write side converts
  * non-unsafe rows with a reused UnsafeProjection).
  *
  * The Write implements RequiresDistributionAndOrdering: `clusterBy` /
  * `sortBy` options let the sink DEMAND a clustering+ordering from
  * Spark (the planner inserts the exchange/sort), so a key's rows land
  * in one data file in sorted order — the layout a downstream
  * partition-pruned reader wants, requested by the sink itself rather
  * than trusted to the caller (GraftStoreSpec proves per-file key
  * disjointness).
  *
  * Test hook: `failFirstAttemptOf=<partitionId>` makes the FIRST attempt
  * of that partition throw after writing half its rows — the
  * kill-one-task exactly-once proof (GraftStoreSpec): the retried
  * attempt's file is committed, the dead attempt's half-file is GC'd,
  * and the read-back equals the input exactly.
  */
object GraftStore {
  private[graft] val ManifestName = "_manifest"

  /** Manifest = schema JSON line, then one committed file name per line.
    * Read/written only on the driver. */
  private[graft] def readManifest(path: String): Option[(StructType, Seq[String])] = {
    val f = new File(path, ManifestName)
    if (!f.exists()) None
    else {
      val lines = new String(Files.readAllBytes(f.toPath), StandardCharsets.UTF_8)
        .split('\n').toSeq.filter(_.nonEmpty)
      Some((StructType.fromDDL(lines.head), lines.tail))
    }
  }

  private[sources] def writeManifestAtomic(
      path: String, schema: StructType, files: Seq[String]): Unit = {
    val tmp = Paths.get(path, s".manifest.tmp.${java.util.UUID.randomUUID()}")
    Files.write(tmp,
      (schema.toDDL +: files).mkString("\n").getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, Paths.get(path, ManifestName),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
  }

  /** Attempts that died before commit/abort (JVM kill) leave orphans;
    * every successful commit sweeps them. */
  private[sources] def gcUnreferenced(path: String, referenced: Set[String]): Unit = {
    val dataDir = new File(path, "data")
    Option(dataDir.listFiles()).getOrElse(Array.empty).foreach { f =>
      if (!referenced.contains(s"data/${f.getName}")) f.delete()
    }
  }
}

class GraftStore extends TableProvider {
  // write path: accept the incoming query's schema instead of demanding
  // a pre-existing table (first write CREATES the table)
  override def supportsExternalMetadata(): Boolean = true

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val path = options.get("path")
    require(path != null, "graft store requires a path option")
    GraftStore.readManifest(path)
      .map(_._1)
      .getOrElse(throw new IllegalArgumentException(
        s"no graft-store table at $path (missing ${GraftStore.ManifestName})"))
  }

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    // properties may arrive case-preserved or lowercased depending on the
    // caller (CaseInsensitiveStringMap lowercases keys)
    def opt(k: String): Option[String] =
      Option(properties.get(k)).orElse(Option(properties.get(k.toLowerCase)))
    new GraftStoreTable(opt("path").orNull, schema,
      opt("clusterBy"), opt("sortBy"),
      opt("failFirstAttemptOf").map(_.toInt),
      opt("failAllAttemptsOf").map(_.toInt))
  }
}

class GraftStoreTable(path: String, tableSchema: StructType,
    clusterBy: Option[String], sortBy: Option[String],
    failFirstAttemptOf: Option[Int], failAllAttemptsOf: Option[Int])
  extends Table with SupportsRead with SupportsWrite {

  override def name(): String = s"graft_store($path)"
  override def schema(): StructType = tableSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE,
      TableCapability.TRUNCATE)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GraftStoreScanBuilder(path)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new GraftStoreWriteBuilder(path, info.schema(), clusterBy, sortBy,
      failFirstAttemptOf, failAllAttemptsOf)
}

// ----------------------------------------------------------------- write

class GraftStoreWriteBuilder(path: String, schema: StructType,
    clusterBy: Option[String], sortBy: Option[String],
    failFirstAttemptOf: Option[Int], failAllAttemptsOf: Option[Int])
  extends WriteBuilder with SupportsTruncate {
  private var truncateFirst = false

  override def truncate(): WriteBuilder = { truncateFirst = true; this }

  override def build(): Write =
    new GraftStoreWrite(path, schema, truncateFirst, clusterBy, sortBy,
      failFirstAttemptOf, failAllAttemptsOf)
}

class GraftStoreWrite(path: String, schema: StructType, truncateFirst: Boolean,
    clusterBy: Option[String], sortBy: Option[String],
    failFirstAttemptOf: Option[Int], failAllAttemptsOf: Option[Int])
  extends Write with RequiresDistributionAndOrdering {

  override def description(): String = s"graft_store write -> $path"

  // the sink REQUESTS its layout; Spark plans the exchange/sort. With no
  // clusterBy the distribution is unspecified (no exchange inserted).
  override def requiredDistribution(): Distribution =
    clusterBy.map(c => Distributions.clustered(Array(Expressions.column(c))))
      .getOrElse(Distributions.unspecified())
  override def requiredOrdering(): Array[SortOrder] =
    sortBy.map(c => Array(Expressions.sort(Expressions.column(c),
      org.apache.spark.sql.connector.expressions.SortDirection.ASCENDING)))
      .getOrElse(Array.empty)

  override def toBatch: BatchWrite =
    new GraftStoreBatchWrite(path, schema, truncateFirst, failFirstAttemptOf,
      failAllAttemptsOf)
}

case class GraftStoreCommitMessage(file: String, rows: Long)
  extends WriterCommitMessage

class GraftStoreBatchWrite(path: String, schema: StructType,
    truncateFirst: Boolean, failFirstAttemptOf: Option[Int],
    failAllAttemptsOf: Option[Int]) extends BatchWrite {

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    new GraftStoreWriterFactory(path, schema, failFirstAttemptOf,
      failAllAttemptsOf)

  // at most one attempt per partition may deliver a commit message —
  // the coordinator half of the exactly-once argument
  override def useCommitCoordinator(): Boolean = true

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val committed = messages.map(_.asInstanceOf[GraftStoreCommitMessage].file).toSeq
    val previous =
      if (truncateFirst) Seq.empty
      else GraftStore.readManifest(path).map(_._2).getOrElse(Seq.empty)
    val files = previous ++ committed
    GraftStore.writeManifestAtomic(path, schema, files)
    GraftStore.gcUnreferenced(path, files.toSet)
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit =
    messages.foreach {
      case GraftStoreCommitMessage(f, _) => new File(path, f).delete()
      case _ =>
    }
}

class GraftStoreWriterFactory(path: String, schema: StructType,
    failFirstAttemptOf: Option[Int], failAllAttemptsOf: Option[Int])
  extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new GraftStoreDataWriter(path, schema, partitionId, taskId,
      failFirstAttemptOf, failAllAttemptsOf)
}

/** Length-framed UnsafeRow stream; file name is attempt-unique (taskId
  * increments per attempt), so a retry never collides with its dead
  * predecessor's bytes. */
class GraftStoreDataWriter(path: String, schema: StructType, partitionId: Int,
    taskId: Long, failFirstAttemptOf: Option[Int],
    failAllAttemptsOf: Option[Int])
  extends DataWriter[InternalRow] {

  private val rel = s"data/part-$partitionId-$taskId.bin"
  private val file = new File(path, rel)
  file.getParentFile.mkdirs()
  private val out = new DataOutputStream(
    new BufferedOutputStream(new FileOutputStream(file)))
  private val toUnsafe = UnsafeProjection.create(schema)
  private var rows = 0L
  private val failThis = failAllAttemptsOf.contains(partitionId) ||
    (failFirstAttemptOf.contains(partitionId) &&
      org.apache.spark.TaskContext.get() != null &&
      org.apache.spark.TaskContext.get().attemptNumber() == 0)
  private var written = 0

  override def write(row: InternalRow): Unit = {
    // kill-one-task hook: die mid-file on the first attempt, leaving a
    // half-written orphan the protocol must keep invisible and GC
    if (failThis && written == 2)
      throw new RuntimeException(
        s"injected failure: partition $partitionId attempt 0")
    val unsafe = row match {
      case u: UnsafeRow => u
      case other => toUnsafe(other)
    }
    val bytes = unsafe.getBytes
    out.writeInt(bytes.length)
    out.write(bytes)
    rows += 1
    written += 1
  }

  override def commit(): WriterCommitMessage = {
    out.close()
    GraftStoreCommitMessage(rel, rows)
  }

  override def abort(): Unit = {
    out.close()
    file.delete()
  }

  override def close(): Unit = ()
}

// ------------------------------------------------------------------ read

class GraftStoreScanBuilder(path: String) extends ScanBuilder {
  override def build(): Scan = new GraftStoreScan(path)
}

class GraftStoreScan(path: String) extends Scan with Batch {
  private val (schema, files) = GraftStore.readManifest(path)
    .getOrElse(throw new IllegalArgumentException(
      s"no graft-store table at $path"))

  override def readSchema(): StructType = schema
  override def toBatch: Batch = this
  override def description(): String =
    s"graft_store($path, files=${files.size})"

  // one input partition per committed data file — the write-side
  // clustering IS the read-side parallelism
  override def planInputPartitions(): Array[InputPartition] =
    files.map(f => GraftStoreFilePartition(new File(path, f).getAbsolutePath)
      : InputPartition).toArray

  override def createReaderFactory(): PartitionReaderFactory =
    new GraftStoreReaderFactory(schema.size)
}

case class GraftStoreFilePartition(absolutePath: String) extends InputPartition

class GraftStoreReaderFactory(numFields: Int) extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new GraftStoreFileReader(
      p.asInstanceOf[GraftStoreFilePartition].absolutePath, numFields)
}

class GraftStoreFileReader(file: String, numFields: Int)
  extends PartitionReader[InternalRow] {
  private val in = new DataInputStream(
    new BufferedInputStream(new FileInputStream(file)))
  private val row = new UnsafeRow(numFields)
  private var current: Array[Byte] = _

  override def next(): Boolean =
    try {
      // committed files end exactly on a frame boundary, so EOF can only
      // surface here, never inside readFully
      val len = in.readInt()
      current = new Array[Byte](len)
      in.readFully(current)
      true
    } catch { case _: java.io.EOFException => false }

  override def get(): InternalRow = {
    row.pointTo(current, current.length)
    row
  }

  override def close(): Unit = in.close()
}
