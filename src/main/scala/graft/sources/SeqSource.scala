package graft.sources

import java.util.{Map => JMap}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThan, GreaterThanOrEqual, IsNotNull, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** `graft-seq` — a from-scratch DataSourceV2 connector (the engine's
  * demonstration that its source layer is not limited to the built-in
  * formats): a deterministic integer-sequence table
  * `(id BIGINT, bucket INT = id % 16, v BIGINT = (id*37+11) % 1000,
  * payload STRING)` over `[start, end)`, exposed through the full V2
  * read contract:
  *
  *   - [[SupportsPushDownFilters]]: comparison predicates on `id` are
  *     CONSUMED by the source — `planInputPartitions` narrows the
  *     generated range so pruned slices are never planned, and the
  *     consumed filters do not reappear as a post-scan `Filter`
  *     operator. This is the scan-level contract that makes a 100 TB
  *     table readable: a predicate on the clustering key must prune
  *     splits at PLANNING time (the parquet row-group/partition-pruning
  *     analogue, here exact because the source knows its own layout).
  *   - [[SupportsPushDownRequiredColumns]]: the reader materializes
  *     ONLY the pruned schema — a query that never touches `payload`
  *     never pays for it (columnar projection pushdown; the reason
  *     wide-table scans stay cheap).
  *   - Slice width derives from the session's `defaultParallelism`
  *     (never a literal), so the same plan fans out on a 1000-executor
  *     cluster.
  *
  * Registered as `graft-seq` via the `DataSourceRegister` service file
  * (`META-INF/services`), so `spark.read.format("graft-seq")` resolves
  * it exactly like a built-in format. The DuckDB oracle re-derives the
  * same sequence relationally (`row_number() OVER () - 1` over a fixture
  * table of the same cardinality), so the correctness gate certifies the
  * generator formulas, the pushed range arithmetic, and the pruned-read
  * path together.
  *
  * Reference scope: the reference engine reads only newline-delimited
  * text from a shared directory (`manager/__main__.py:320-327`); a
  * pluggable connector API is part of this engine's §2.C source
  * extension surface.
  */
object SeqSource {
  val ID = "id"
  val BUCKET = "bucket"
  val V = "v"
  val PAYLOAD = "payload"

  val fullSchema: StructType = StructType(Seq(
    StructField(ID, LongType, nullable = false),
    StructField(BUCKET, IntegerType, nullable = false),
    StructField(V, LongType, nullable = false),
    StructField(PAYLOAD, StringType, nullable = false)))

  def bucketOf(id: Long): Int = (id % 16L).toInt
  def vOf(id: Long): Long = (id * 37L + 11L) % 1000L
  def payloadOf(id: Long): String = "p" + (id % 7L)
}

class SeqDataSource extends TableProvider
    with org.apache.spark.sql.sources.DataSourceRegister {
  override def shortName(): String = "graft-seq"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    SeqSource.fullSchema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: JMap[String, String]): Table =
    new SeqTable(new CaseInsensitiveStringMap(properties))
}

final class SeqTable(options: CaseInsensitiveStringMap)
    extends Table with SupportsRead {
  private val start = options.getLong("start", 0L)
  private val end = options.getLong("end", 0L)

  override def name(): String = s"graft_seq($start, $end)"
  override def schema(): StructType = SeqSource.fullSchema
  override def capabilities(): java.util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava

  override def newScanBuilder(o: CaseInsensitiveStringMap): ScanBuilder =
    new SeqScanBuilder(start, end)
}

/** Accumulates the pushed `id` range and the pruned schema. Filters on
  * `id` are fully consumed (the generator emits exactly `[lo, hi)`), so
  * `pushFilters` returns only the residual set for Spark to re-apply.
  */
final class SeqScanBuilder(start: Long, end: Long) extends ScanBuilder
    with SupportsPushDownFilters with SupportsPushDownRequiredColumns {

  private var lo = start
  private var hi = end
  private var pushed: Array[Filter] = Array.empty
  private var required: StructType = SeqSource.fullSchema

  // saturating bound updates; EqualTo pins both ends
  private def consume(f: Filter): Boolean = f match {
    case GreaterThanOrEqual(SeqSource.ID, x: Long) => lo = math.max(lo, x); true
    case GreaterThan(SeqSource.ID, x: Long) => lo = math.max(lo, x + 1); true
    case LessThan(SeqSource.ID, x: Long) => hi = math.min(hi, x); true
    case LessThanOrEqual(SeqSource.ID, x: Long) => hi = math.min(hi, x + 1); true
    case EqualTo(SeqSource.ID, x: Long) =>
      lo = math.max(lo, x); hi = math.min(hi, x + 1); true
    case IsNotNull(SeqSource.ID) => true // every generated id is non-null
    case _ => false
  }

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (consumed, residual) = filters.partition(consume)
    pushed = consumed
    residual
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan =
    new SeqScan(start, end, lo, math.max(lo, hi), required, pushed)
}

final class SeqScan(tableStart: Long, tableEnd: Long, lo: Long, hi: Long,
    required: StructType, pushed: Array[Filter]) extends Scan with Batch {

  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-seq [$lo, $hi) PushedFilters: [${pushed.mkString(", ")}], " +
      s"ReadSchema: ${required.catalogString}"

  override def planInputPartitions(): Array[InputPartition] = {
    if (hi <= lo) return Array.empty
    // the slice grid is fixed by the TABLE's extent (one slice per core
    // at session parallelism — the cluster-scaling knob, a file-split
    // analogue); the pushed range then selects only OVERLAPPING grid
    // slices, so a selective predicate plans fewer partitions — the
    // partition-pruning contract, not just emptier readers
    val total = math.max(1L, tableEnd - tableStart)
    val target = SparkSession.active.sparkContext.defaultParallelism.toLong
    val slice = math.max(1L, (total + target - 1L) / target)
    val first = (lo - tableStart) / slice
    val last = (hi - 1L - tableStart) / slice
    (first to last).iterator
      .map { i =>
        val s = tableStart + i * slice
        SeqSlice(math.max(lo, s), math.min(hi, s + slice)): InputPartition
      }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new SeqReaderFactory(required.fieldNames)
}

final case class SeqSlice(s: Long, e: Long) extends InputPartition

final class SeqReaderFactory(cols: Array[String])
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val SeqSlice(s, e) = p.asInstanceOf[SeqSlice]
    new PartitionReader[InternalRow] {
      private var id = s - 1
      override def next(): Boolean = { id += 1; id < e }
      override def get(): InternalRow =
        InternalRow.fromSeq(cols.toSeq.map {
          case SeqSource.ID => id
          case SeqSource.BUCKET => SeqSource.bucketOf(id)
          case SeqSource.V => SeqSource.vOf(id)
          case SeqSource.PAYLOAD => UTF8String.fromString(SeqSource.payloadOf(id))
        })
      override def close(): Unit = ()
    }
  }
}
