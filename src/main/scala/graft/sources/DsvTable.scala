package graft.sources

import java.io.{BufferedReader, InputStreamReader}
import java.nio.charset.StandardCharsets
import java.util.{Map => JMap, UUID}

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path => HPath}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.connector.write.streaming.{StreamingDataWriterFactory, StreamingWrite}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.SerializableConfiguration

/** `graft-dsv` — a delimiter-separated-values table with the FULL
  * DataSourceV2 BATCH WRITE contract, the piece the `graft-seq`
  * connector (read-only by nature) cannot demonstrate:
  *
  *   - each task's [[DataWriter]] writes to a private temp file under
  *     `<dir>/_tmp/<queryId>/` and describes it in a
  *     [[WriterCommitMessage]] — nothing a task writes is visible
  *     until the DRIVER's job-level [[BatchWrite.commit]] renames the
  *     committed attempts' files into place (`part-%05d`, the
  *     reference's sink naming — `worker/__main__.py:238`,
  *     `manager/__main__.py:344-355` for the delete-then-write
  *     overwrite semantics this table's TRUNCATE reproduces);
  *   - duplicate/speculative task attempts are fenced by Spark's
  *     output-commit coordinator (one attempt per partition wins);
  *     losing and failing attempts get [[DataWriter.abort]], which
  *     deletes their temp file — a retried task can never leave a
  *     half-written part visible;
  *   - job-level [[BatchWrite.abort]] removes the whole temp area, so
  *     a failed query leaves the previous table contents intact — the
  *     atomic-publish property object-store writers (Delta/Iceberg
  *     commit protocols) are built around.
  *
  * All file IO goes through the Hadoop FileSystem API, so the same
  * code runs against file://, hdfs:// or an object store. The
  * directory is self-describing: commit also publishes `_schema.ddl`
  * (read-side schema inference) and `_SUCCESS`. The encoding is
  * deliberately minimal — `|`-separated, `\N` for NULL, no escaping
  * (values containing the delimiter or a newline are rejected at
  * write time with a clear error): a text format mirroring the
  * reference's line-oriented data model, not a CSV replacement.
  * Supported column types: LONG, INT, DOUBLE, STRING.
  */
object DsvTable {
  val DELIM = '|'
  val NULL_TOKEN = "\\N"

  /** Age past which an orphaned `_tmp/<queryId>` subtree (a crashed
    * run's residue) is reaped by the next streaming epoch commit. A
    * live query's root refreshes its mtime every epoch, so it can
    * never look stale at micro-batch cadence. */
  val TMP_REAP_MS: Long = 24L * 3600 * 1000

  private[sources] def encode(v: Any): String = v match {
    case null => NULL_TOKEN
    case s: UTF8String =>
      val str = s.toString
      require(str.indexOf(DELIM) < 0 && str.indexOf('\n') < 0 &&
        str != NULL_TOKEN,
        s"graft-dsv cannot encode a string containing '$DELIM', a " +
          s"newline, or the literal null token: $str")
      str
    case other => other.toString
  }

  private[sources] def decode(cell: String, t: DataType): Any =
    if (cell == NULL_TOKEN) null
    else t match {
      case LongType => cell.toLong
      case IntegerType => cell.toInt
      case DoubleType => cell.toDouble
      case StringType => UTF8String.fromString(cell)
      case other => throw new IllegalArgumentException(
        s"graft-dsv does not support column type $other")
    }

  private[sources] def checkSchema(schema: StructType): Unit =
    schema.fields.foreach { f =>
      require(Set[DataType](LongType, IntegerType, DoubleType, StringType)
        .contains(f.dataType),
        s"graft-dsv supports LONG/INT/DOUBLE/STRING columns only, " +
          s"got ${f.name}: ${f.dataType}")
    }

  /** Task-side temp-file writer shared by the batch and streaming
    * factories: encodes rows to `tmp`, reports the path + row count in
    * the commit message; only a job/epoch-level commit on the driver
    * makes the file visible. */
  private[sources] def newDataWriter(tmp: HPath, types: Array[DataType],
      hadoopConf: Configuration, partitionId: Int): DataWriter[InternalRow] = {
    val fs = tmp.getFileSystem(hadoopConf)
    val out = fs.create(tmp, false)
    new DataWriter[InternalRow] {
      private var rows = 0L
      override def write(r: InternalRow): Unit = {
        val line = types.indices.map { i =>
          DsvTable.encode(if (r.isNullAt(i)) null else r.get(i, types(i)))
        }.mkString(DsvTable.DELIM.toString)
        out.write((line + "\n").getBytes(StandardCharsets.UTF_8))
        rows += 1L
      }
      override def commit(): WriterCommitMessage = {
        out.close()
        DsvCommitMessage(partitionId, tmp.toString, rows)
      }
      override def abort(): Unit = {
        try out.close() catch { case _: Exception => () }
        fs.delete(tmp, false)
      }
      override def close(): Unit = ()
    }
  }
}

class DsvDataSource extends TableProvider
    with org.apache.spark.sql.sources.DataSourceRegister {
  override def shortName(): String = "graft-dsv"
  override def supportsExternalMetadata(): Boolean = true

  private def pathOf(options: CaseInsensitiveStringMap): String = {
    val p = options.get("path")
    require(p != null && p.nonEmpty, "graft-dsv requires a path option")
    p
  }

  /** Schema inference reads the `_schema.ddl` the last committed write
    * published — the directory is self-describing, like a parquet
    * footer. */
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val dir = new HPath(pathOf(options))
    val fs = dir.getFileSystem(new Configuration())
    val ddlFile = new HPath(dir, "_schema.ddl")
    require(fs.exists(ddlFile),
      s"graft-dsv: no _schema.ddl under $dir — pass an explicit schema " +
        "or write the table first")
    val in = fs.open(ddlFile)
    val ddl = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
    finally in.close()
    StructType.fromDDL(ddl)
  }

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: JMap[String, String]): Table = {
    DsvTable.checkSchema(schema)
    new DsvFileTable(pathOf(new CaseInsensitiveStringMap(properties)), schema)
  }
}

final class DsvFileTable(dir: String, tableSchema: StructType)
    extends Table with SupportsRead with SupportsWrite {
  override def name(): String = s"graft_dsv($dir)"
  override def schema(): StructType = tableSchema
  override def capabilities(): java.util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE,
      TableCapability.TRUNCATE, TableCapability.STREAMING_WRITE).asJava

  override def newScanBuilder(o: CaseInsensitiveStringMap): ScanBuilder =
    () => new DsvScan(dir, tableSchema)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    DsvTable.checkSchema(info.schema())
    new DsvWriteBuilder(dir, info.schema(), info.queryId())
  }
}

// ---- read path -------------------------------------------------------------

final case class DsvFilePartition(path: String) extends InputPartition

final class DsvScan(dir: String, schema: StructType) extends Scan with Batch {
  override def readSchema(): StructType = schema
  override def toBatch: Batch = this
  override def description(): String = s"graft-dsv $dir"

  // one split per part file: parts are sized by the writing query's
  // partitioning, so the read-side fan-out mirrors the write-side
  // fan-out (at 100 TB a production text reader would additionally
  // split large files by byte range; a committed part here is one
  // task's output, already the granularity the cluster chose)
  override def planInputPartitions(): Array[InputPartition] = {
    val d = new HPath(dir)
    val fs = d.getFileSystem(new Configuration())
    fs.globStatus(new HPath(d, "part-*")).map(s =>
      DsvFilePartition(s.getPath.toString): InputPartition)
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new DsvReaderFactory(schema.fields.map(_.dataType),
      new SerializableConfiguration(activeHadoopConf()))

  private def activeHadoopConf(): Configuration =
    SparkSession.active.sessionState.newHadoopConf()
}

final class DsvReaderFactory(types: Array[DataType],
    conf: SerializableConfiguration) extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val path = new HPath(p.asInstanceOf[DsvFilePartition].path)
    val fs = path.getFileSystem(conf.value)
    val reader = new BufferedReader(new InputStreamReader(
      fs.open(path), StandardCharsets.UTF_8))
    new PartitionReader[InternalRow] {
      private var line: String = _
      override def next(): Boolean = { line = reader.readLine(); line != null }
      override def get(): InternalRow = {
        val cells = line.split(java.util.regex.Pattern
          .quote(DsvTable.DELIM.toString), -1)
        require(cells.length == types.length,
          s"graft-dsv row has ${cells.length} cells, expected " +
            s"${types.length}: $line")
        InternalRow.fromSeq(cells.toSeq.zip(types.toSeq).map {
          case (c, t) => DsvTable.decode(c, t)
        })
      }
      override def close(): Unit = reader.close()
    }
  }
}

// ---- write path ------------------------------------------------------------

final class DsvWriteBuilder(dir: String, schema: StructType, queryId: String)
    extends WriteBuilder with SupportsTruncate {
  private var doTruncate = false
  override def truncate(): WriteBuilder = { doTruncate = true; this }
  override def build(): Write = new DsvWrite(dir, schema, queryId, doTruncate)
}

final case class DsvCommitMessage(partitionId: Int, tmpPath: String,
    rows: Long) extends WriterCommitMessage

final class DsvWrite(dir: String, schema: StructType, queryId: String,
    truncate: Boolean) extends Write with BatchWrite {
  override def toBatch: BatchWrite = this
  override def toStreaming: StreamingWrite = {
    require(!truncate,
      "graft-dsv streaming write is append-only (epoch-fenced parts); " +
        "Complete/Update output modes are not supported")
    new DsvStreamingWrite(dir, schema, queryId)
  }
  override def description(): String =
    s"graft-dsv $dir truncate=$truncate"

  private def tmpRoot = new HPath(new HPath(dir, "_tmp"), queryId)

  override def createBatchWriterFactory(
      info: PhysicalWriteInfo): DataWriterFactory =
    new DsvWriterFactory(tmpRoot.toString, schema.fields.map(_.dataType),
      new SerializableConfiguration(
        SparkSession.active.sessionState.newHadoopConf()))

  /** Job-level ATOMIC PUBLISH, on the driver, after every partition has
    * exactly one committed attempt: clear old parts (TRUNCATE — the
    * reference's delete-then-recreate overwrite), rename each committed
    * temp to its `part-%05d` slot, then publish `_schema.ddl` +
    * `_SUCCESS`. Renames are per-file metadata ops; no data bytes move
    * at commit time. */
  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val d = new HPath(dir)
    val fs = d.getFileSystem(new Configuration())
    fs.mkdirs(d)
    if (truncate) {
      fs.globStatus(new HPath(d, "part-*")).foreach(s =>
        fs.delete(s.getPath, false))
      // a batch overwrite supersedes all streaming history: stale
      // epoch markers left behind would fence out a future streaming
      // query that happens to reuse a predecessor's query id
      fs.globStatus(new HPath(d, "_epoch-*")).foreach(s =>
        fs.delete(s.getPath, false))
    }
    messages.foreach { case DsvCommitMessage(pid, tmp, _) =>
      val dest = new HPath(d, f"part-$pid%05d")
      if (!fs.rename(new HPath(tmp), dest))
        throw new java.io.IOException(
          s"graft-dsv commit: rename $tmp -> $dest failed")
    }
    val ddl = fs.create(new HPath(d, "_schema.ddl"), true)
    try ddl.write(schema.toDDL.getBytes(StandardCharsets.UTF_8))
    finally ddl.close()
    fs.create(new HPath(d, "_SUCCESS"), true).close()
    cleanupTmp(fs)
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit =
    cleanupTmp(tmpRoot.getFileSystem(new Configuration()))

  /** Remove this query's temp area; drop the shared `_tmp` parent only
    * if empty (a concurrent writer to the same directory may still own
    * a live queryId subtree — the non-recursive delete refuses then). */
  private def cleanupTmp(fs: FileSystem): Unit = {
    fs.delete(tmpRoot, true)
    try { fs.delete(tmpRoot.getParent, false); () }
    catch { case _: java.io.IOException => () }
  }
}

final class DsvWriterFactory(tmpRoot: String, types: Array[DataType],
    conf: SerializableConfiguration) extends DataWriterFactory {
  override def createWriter(partitionId: Int,
      taskId: Long): DataWriter[InternalRow] = {
    // attempt-unique temp name: concurrent attempts of one partition
    // (speculation, retry racing) each write their own file; only the
    // coordinator-fenced winner's path reaches BatchWrite.commit
    val tmp = new HPath(tmpRoot,
      f"p$partitionId%05d-t$taskId-${UUID.randomUUID().toString.take(8)}")
    DsvTable.newDataWriter(tmp, types, conf.value, partitionId)
  }
}

// ---- streaming write path ----------------------------------------------

/** The STREAMING leg of the write contract (TableCapability
  * STREAMING_WRITE): each micro-batch flows through the same
  * temp-then-rename protocol as a batch job, published as an
  * epoch-fenced APPEND — parts named `part-e<epoch>-<pid>`, plus an
  * `_epoch-<id>` marker that makes the commit IDEMPOTENT: after a
  * restart Spark may re-execute and re-commit the last epoch of its
  * checkpointed offset log, and the marker check turns that replay
  * into a temp-discarding no-op instead of doubled rows — the
  * connector-side half of streaming exactly-once (the other half is
  * the source's replayable offsets, [[SeqMicroBatchStream]]).
  * Append-only by design: Complete/Update modes would need
  * per-epoch truncation, which this layout deliberately reserves for
  * the batch TRUNCATE path. */
final class DsvStreamingWrite(dir: String, schema: StructType,
    queryId: String) extends StreamingWrite {
  private def tmpQueryRoot = new HPath(new HPath(dir, "_tmp"), queryId)
  private def tmpEpochRoot(epochId: Long) =
    new HPath(tmpQueryRoot, s"e$epochId")

  override def createStreamingWriterFactory(
      info: PhysicalWriteInfo): StreamingDataWriterFactory =
    new DsvStreamingWriterFactory(tmpQueryRoot.toString,
      schema.fields.map(_.dataType),
      new SerializableConfiguration(
        SparkSession.active.sessionState.newHadoopConf()))

  override def commit(epochId: Long,
      messages: Array[WriterCommitMessage]): Unit = {
    val d = new HPath(dir)
    val fs = d.getFileSystem(new Configuration())
    fs.mkdirs(d)
    // the marker is scoped by the STREAMING QUERY id (stable across
    // restarts — Spark passes `id.toString`, not the per-run id, as
    // the write's queryId), so a replay of this query's epoch fences
    // while a NEW query appending to the same directory — whose epoch
    // ids restart at 0 — never collides with a predecessor's markers
    // and silently drops its data
    val marker = new HPath(d, s"_epoch-$queryId-$epochId")
    if (fs.exists(marker)) {
      // replayed epoch after a restart: already published — renaming
      // this attempt's temps would double the rows
      cleanupEpochTmp(fs, epochId)
      return
    }
    messages.foreach { case DsvCommitMessage(pid, tmp, _) =>
      // part names carry the query id for the same reason the marker
      // does: two queries appending to one directory both publish an
      // epoch 0, and unscoped names would collide at rename time
      val dest = new HPath(d, f"part-e$epochId%06d-$pid%05d-$queryId")
      // a failed rename must fail the epoch BEFORE the marker exists:
      // marking a partially-published epoch committed would convert
      // Spark's recovery replay into a data-losing no-op
      if (!fs.rename(new HPath(tmp), dest))
        throw new java.io.IOException(
          s"graft-dsv epoch $epochId: rename $tmp -> $dest failed")
    }
    // schema is fixed for the query's lifetime: write the DDL only
    // when absent — an every-epoch overwrite opens a truncation
    // window for a concurrent inferSchema reader
    val ddlFile = new HPath(d, "_schema.ddl")
    if (!fs.exists(ddlFile)) {
      val ddl = fs.create(ddlFile, false)
      try ddl.write(schema.toDDL.getBytes(StandardCharsets.UTF_8))
      finally ddl.close()
    }
    fs.create(marker, true).close()
    val success = new HPath(d, "_SUCCESS")
    if (!fs.exists(success)) fs.create(success, false).close()
    cleanupEpochTmp(fs, epochId)
  }

  override def abort(epochId: Long,
      messages: Array[WriterCommitMessage]): Unit =
    cleanupEpochTmp(tmpQueryRoot.getFileSystem(new Configuration()), epochId)

  /** Remove the epoch's temp area; drop the per-query and shared
    * `_tmp` parents only when empty (the batch-path [[DsvWrite]] rule:
    * a concurrent writer may own a live sibling subtree — the
    * non-recursive delete refuses then). Sibling query roots whose
    * mtime is older than [[DsvTable.TMP_REAP_MS]] are reaped too: a
    * crashed run's temps would otherwise outlive it forever (its
    * restart gets the same queryId but new epoch dirs, and a DIFFERENT
    * query's cleanup never touches them) — a live writer's root cannot
    * look stale because every epoch refreshes its mtime. */
  private def cleanupEpochTmp(fs: FileSystem, epochId: Long): Unit = {
    fs.delete(tmpEpochRoot(epochId), true)
    val shared = tmpQueryRoot.getParent
    try {
      val cutoff = System.currentTimeMillis() - DsvTable.TMP_REAP_MS
      fs.listStatus(shared)
        .filter(st => st.isDirectory && st.getPath != tmpQueryRoot &&
          st.getModificationTime < cutoff)
        .foreach(st => fs.delete(st.getPath, true))
    } catch { case _: java.io.IOException => () }
    try { fs.delete(tmpQueryRoot, false); () }
    catch { case _: java.io.IOException => () }
    try { fs.delete(shared, false); () }
    catch { case _: java.io.IOException => () }
  }
}

final class DsvStreamingWriterFactory(tmpQueryRoot: String,
    types: Array[DataType], conf: SerializableConfiguration)
    extends StreamingDataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long,
      epochId: Long): DataWriter[InternalRow] = {
    val tmp = new HPath(new HPath(tmpQueryRoot, s"e$epochId"),
      f"p$partitionId%05d-t$taskId-${UUID.randomUUID().toString.take(8)}")
    DsvTable.newDataWriter(tmp, types, conf.value, partitionId)
  }
}
