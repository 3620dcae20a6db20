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
    } else {
      // batch part names (`part-%05d`, the reference layout) are not
      // job-unique, so appending into a non-empty table would collide
      // mid-rename and strand a partial mix of old and new parts.
      // Refuse BEFORE any rename — append-style accumulation is the
      // streaming sink's epoch-fenced job.
      val existing = fs.globStatus(new HPath(d, "part-*"))
      if (existing != null && existing.nonEmpty)
        throw new IllegalStateException(
          s"graft-dsv batch write into non-empty $dir requires overwrite " +
            "(TRUNCATE); for append-style accumulation use the streaming " +
            "sink, whose part names are epoch- and query-scoped")
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
  * the batch TRUNCATE path. Markers and part names are query-scoped
  * as of the round-12 hardening; directories written by the earlier
  * unscoped protocol are outside the compat contract (a legacy-marker
  * shim would reintroduce the silent-discard bug for new queries).
  *
  * Fence scope: crash-then-replay, i.e. Spark's contract that one
  * driver commits a query's epochs SEQUENTIALLY. Two live drivers
  * committing the same epoch concurrently (a zombie after failover)
  * could interleave the recovery pre-clean with each other's renames;
  * fencing that needs a conditional-put metadata log (the
  * Delta/Iceberg commit answer), which plain rename cannot express —
  * the same boundary Spark's own FileStreamSink draws. */
object DsvStreamingWrite {
  /** Committed-epoch markers kept per query beyond the newest one.
    * Spark replays at most the last epoch of its offset log after a
    * restart, so 1 would suffice; a small tail keeps the fence robust
    * to an operator hand-rolling checkpoint surgery. */
  val MARKER_TAIL = 2L
}

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
    // No marker but (query, epoch)-named parts on disk ⇒ a prior
    // attempt of THIS epoch crashed between its renames and its
    // marker. Those parts were never acknowledged (the marker is the
    // acknowledgment), so superseding them is safe — and REQUIRED:
    // the replay may re-execute with different partitioning (shuffle
    // partition count changed across the restart), so keeping the old
    // attempt's part where a dest exists while publishing new parts
    // for the rest would mix two row-to-partition mappings, dropping
    // or doubling rows. Delete ALL of the dead attempt's parts first,
    // then publish this attempt whole — which also keeps recovery
    // livelock-free on rename-returns-false filesystems (HDFS, object
    // stores): after the pre-clean no rename can hit an existing dest.
    val leftovers = fs.globStatus(
      new HPath(d, f"part-e$epochId%06d-*-$queryId"))
    if (leftovers != null) leftovers.foreach(s => fs.delete(s.getPath, false))
    messages.foreach { case DsvCommitMessage(pid, tmp, _) =>
      // part names carry the query id for the same reason the marker
      // does: two queries appending to one directory both publish an
      // epoch 0, and unscoped names would collide at rename time
      val dest = new HPath(d, f"part-e$epochId%06d-$pid%05d-$queryId")
      // a failed rename must fail the epoch BEFORE the marker exists:
      // marking a partially-published epoch committed would convert
      // Spark's recovery replay into a data-losing no-op. The
      // pre-clean above removed every prior-attempt dest, and pids are
      // unique per commit (one coordinator-fenced winner per
      // partition), so any failure here is a genuine IO error.
      if (!fs.rename(new HPath(tmp), dest))
        throw new java.io.IOException(
          s"graft-dsv epoch $epochId: rename $tmp -> $dest failed")
    }
    // schema is fixed for the query's lifetime: publish the DDL once,
    // via temp + rename — an every-epoch overwrite opens a truncation
    // window for concurrent inferSchema readers, and a direct
    // create(absent) leaves a permanently empty file if the writer
    // dies mid-write (no later epoch would repair it). The temp lives
    // in this epoch's temp dir, so every cleanup path collects it; a
    // racing same-directory query's rename winning is fine (first
    // writer wins, both wrote the same role of file).
    val ddlFile = new HPath(d, "_schema.ddl")
    if (!fs.exists(ddlFile)) {
      val ddlTmp = new HPath(tmpEpochRoot(epochId), "_schema.ddl.tmp")
      val ddl = fs.create(ddlTmp, true)
      try ddl.write(schema.toDDL.getBytes(StandardCharsets.UTF_8))
      finally ddl.close()
      if (!fs.rename(ddlTmp, ddlFile)) fs.delete(ddlTmp, false)
    }
    fs.create(marker, true).close()
    // Marker retention: epochs are strictly sequential within a query
    // and Spark only ever replays the tail of its offset log, so once
    // epoch N is committed, markers older than N - MARKER_TAIL can
    // never fence anything again — on a long-running query they would
    // accumulate one file per micro-batch forever, bloating the
    // directory listings the read path and every commit glob. Reap
    // them here (this query's namespace only; a concurrent query's
    // markers carry its own id and never match the glob).
    val stale = fs.globStatus(new HPath(d, s"_epoch-$queryId-*"))
    if (stale != null) {
      val prefixLen = s"_epoch-$queryId-".length
      stale.foreach { s =>
        val suffix = s.getPath.getName.drop(prefixLen)
        // length cap: a foreign digits-only name longer than any real
        // epoch id must not NumberFormatException the commit
        if (suffix.nonEmpty && suffix.length <= 18 &&
            suffix.forall(_.isDigit) &&
            suffix.toLong < epochId - DsvStreamingWrite.MARKER_TAIL)
          fs.delete(s.getPath, false)
      }
    }
    // _SUCCESS is advisory: tolerate a concurrent same-directory
    // query creating it between the exists check and ours
    val success = new HPath(d, "_SUCCESS")
    if (!fs.exists(success)) {
      try fs.create(success, false).close()
      catch { case _: java.io.IOException => () }
    }
    cleanupEpochTmp(fs, epochId)
  }

  override def abort(epochId: Long,
      messages: Array[WriterCommitMessage]): Unit =
    cleanupEpochTmp(tmpQueryRoot.getFileSystem(new Configuration()), epochId)

  /** Remove the epoch's temp area plus any DEAD sibling epoch dirs of
    * THIS query: epochs are strictly sequential within a query, so on
    * committing epoch N every `e<M>` with M ≤ N is residue of a
    * crashed previous RUN (same stable queryId) and safe to reap — no
    * mtime heuristic, and never another writer's subtree (a concurrent
    * query shares only the `_tmp` parent, which is dropped non-
    * recursively and only when empty, the batch-path [[DsvWrite]]
    * rule). A query id abandoned forever (checkpoint deleted, never
    * restarted) leaks its last in-flight epoch dir — the deliberate
    * price of refusing to guess at live concurrent writers. */
  private def cleanupEpochTmp(fs: FileSystem, epochId: Long): Unit = {
    fs.delete(tmpEpochRoot(epochId), true)
    try {
      fs.listStatus(tmpQueryRoot)
        .filter { st =>
          val n = st.getPath.getName
          n.startsWith("e") && n.length > 1 &&
            n.drop(1).forall(_.isDigit) && n.drop(1).toLong <= epochId
        }
        .foreach(st => fs.delete(st.getPath, true))
    } catch { case _: java.io.IOException => () }
    try { fs.delete(tmpQueryRoot, false); () }
    catch { case _: java.io.IOException => () }
    try { fs.delete(tmpQueryRoot.getParent, false); () }
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
