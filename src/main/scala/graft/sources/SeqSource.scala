package graft.sources

import java.util.{Map => JMap}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.{Expressions, NamedReference, SortDirection, SortOrder => V2SortOrder, Transform, Expression => V2Expression}
import org.apache.spark.sql.connector.expressions.aggregate.{AggregateFunc, Aggregation, Count, CountStar, Max, Min, Sum}
import java.util.OptionalLong

import org.apache.spark.sql.connector.expressions.filter.Predicate
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.partitioning.{KeyGroupedPartitioning, Partitioning => V2Partitioning}
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
  *   - [[SupportsPushDownTopN]]/[[SupportsPushDownLimit]]: ORDER BY on
  *     the unique clustering key `id` + LIMIT n (and bare LIMIT) are
  *     answered FULLY by the source — Catalyst removes the Sort and
  *     Limit operators and the scan emits exactly the n requested rows
  *     from the right end of the range (one output-sized partition).
  *     Orders led by any other column decline and keep the engine's
  *     sort — fully-pushed top-n must never approximate tie semantics.
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

  /** Hard extent cap (10^15 ids): keeps every closed-form Long
    * aggregate below 2^63 (max per-id v is 999, so any SUM(v) ≤
    * ~10^18 < Long.MaxValue) — the source never wraps where an exact
    * engine wouldn't. */
  val MAX_END = 1000000000000000L

  val fullSchema: StructType = StructType(Seq(
    StructField(ID, LongType, nullable = false),
    StructField(BUCKET, IntegerType, nullable = false),
    StructField(V, LongType, nullable = false),
    StructField(PAYLOAD, StringType, nullable = false)))

  def bucketOf(id: Long): Int = (id % 16L).toInt
  def vOf(id: Long): Long = (id * 37L + 11L) % 1000L
  def payloadOf(id: Long): String = "p" + (id % 7L)

  /** Estimated in-memory width of one row at a pruned schema — feeds
    * [[org.apache.spark.sql.connector.read.SupportsReportStatistics]]
    * (`defaultSize` per column; payload is a 2-char string). */
  private[sources] def rowWidth(schema: StructType): Long =
    math.max(1L, schema.fields.map(_.dataType.defaultSize.toLong).sum)

  /** Exact scan statistics: the generator knows its own cardinality, so
    * `numRows` is exact — the connector analog of catalog/footer stats,
    * and what lets the planner BROADCAST a selectively-filtered side of
    * a join without a hint. */
  private[sources] def statsOf(rows: Long, schema: StructType): Statistics =
    new Statistics {
      override def sizeInBytes(): OptionalLong =
        OptionalLong.of(math.max(1L, rows) * rowWidth(schema))
      override def numRows(): OptionalLong = OptionalLong.of(rows)
    }

  /** Reported per-partition ordering: every planned slice walks ids
    * ASCENDING (range slices, bucket slices stepping 16, runtime id
    * sets — all ascending by construction), and `id` is UNIQUE, so the
    * rows are vacuously also sorted by any column list LED by `id`.
    * Declaring `(id, bucket)` lets a storage-partitioned sort-merge
    * join on those keys skip BOTH local sorts — combined with
    * KeyGroupedPartitioning, a seq⋈seq join runs with zero exchanges
    * AND zero sorts, entirely from storage layout. */
  private[sources] def idOrdering(required: StructType): Array[V2SortOrder] = {
    val names = required.fieldNames.map(_.toLowerCase).toSet
    if (!names.contains(ID)) Array.empty // no id column, nothing to claim
    else {
      val cols = Seq(ID) ++ (if (names.contains(BUCKET)) Seq(BUCKET) else Nil)
      cols.map(c =>
        Expressions.sort(Expressions.column(c), SortDirection.ASCENDING))
        .toArray
    }
  }

  // ---- closed-form aggregate layer (SupportsPushDownAggregates) ----------
  // `bucket` has period 16 in id and `v` period 1000 (gcd(37,1000)=1),
  // so the joint (bucket, v) structure repeats every lcm = 2000 ids —
  // any COUNT/SUM/MIN/MAX over an id range decomposes into
  // whole-period multiples (alignment-independent: a full period
  // covers every residue class mod 2000 exactly once) plus a < 2000-id
  // remainder loop. O(period) work no matter how many ids the range
  // spans — the connector-side analogue of answering an aggregate from
  // parquet footer statistics instead of scanning rows.
  private val PERIOD = 2000L
  private val PER_BUCKET_PER_PERIOD = PERIOD / 16L // 125

  private lazy val (periodSumV, periodMinV, periodMaxV) = {
    val s = new Array[Long](16)
    val mn = Array.fill(16)(Long.MaxValue)
    val mx = Array.fill(16)(Long.MinValue)
    var k = 0L
    while (k < PERIOD) {
      val b = bucketOf(k)
      val v = vOf(k)
      s(b) += v
      if (v < mn(b)) mn(b) = v
      if (v > mx(b)) mx(b) = v
      k += 1L
    }
    (s, mn, mx)
  }

  /** Per-bucket exact stats over `[lo, hi)`. */
  final case class BucketStat(bucket: Int, cnt: Long, sumV: Long,
      minId: Long, maxId: Long, minV: Long, maxV: Long)

  def bucketStats(lo: Long, hi: Long): Seq[BucketStat] = {
    if (hi <= lo) return Seq.empty
    val nFull = (hi - lo) / PERIOD
    val cnt = new Array[Long](16)
    val sumV = new Array[Long](16)
    val minV = Array.fill(16)(Long.MaxValue)
    val maxV = Array.fill(16)(Long.MinValue)
    if (nFull > 0) {
      var b = 0
      while (b < 16) {
        cnt(b) = nFull * PER_BUCKET_PER_PERIOD
        sumV(b) = nFull * periodSumV(b)
        minV(b) = periodMinV(b)
        maxV(b) = periodMaxV(b)
        b += 1
      }
    }
    var id = lo + nFull * PERIOD
    while (id < hi) {
      val b = bucketOf(id)
      val v = vOf(id)
      cnt(b) += 1L
      sumV(b) += v
      if (v < minV(b)) minV(b) = v
      if (v > maxV(b)) maxV(b) = v
      id += 1L
    }
    (0 until 16).iterator.filter(cnt(_) > 0L).map { b =>
      // first/last id ≡ b (mod 16) inside [lo, hi): pure arithmetic
      val first = lo + (((b - lo) % 16L + 16L) % 16L)
      val last = (hi - 1L) - (((hi - 1L - b) % 16L + 16L) % 16L)
      BucketStat(b, cnt(b), sumV(b), first, last, minV(b), maxV(b))
    }.toSeq
  }
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
  // `cluster=bucket`: serve the rows grouped by `bucket` — one input
  // partition per bucket value, each declaring its key — so the scan
  // reports [[KeyGroupedPartitioning]] and Spark's storage-partitioned
  // join runs seq⋈seq on (…, bucket) with ZERO exchange.
  private val clustered =
    options.getOrDefault("cluster", "") == SeqSource.BUCKET
  // micro-batch admission: at most this many ids per trigger (the
  // streaming read path; default serves the whole remaining extent in
  // one batch)
  private val rowsPerBatch = options.getLong("rowsPerBatch", Long.MaxValue)
  require(start >= 0L && end <= SeqSource.MAX_END,
    s"graft-seq extent must lie in [0, ${SeqSource.MAX_END}), " +
      s"got [$start, $end)")

  override def name(): String = s"graft_seq($start, $end)"
  override def schema(): StructType = SeqSource.fullSchema
  override def partitioning(): Array[Transform] =
    if (clustered) Array(Expressions.identity(SeqSource.BUCKET))
    else Array.empty
  override def capabilities(): java.util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ).asJava

  override def newScanBuilder(o: CaseInsensitiveStringMap): ScanBuilder =
    new SeqScanBuilder(start, end, clustered, rowsPerBatch)
}

/** Accumulates the pushed `id` range and the pruned schema. Filters on
  * `id` are fully consumed (the generator emits exactly `[lo, hi)`), so
  * `pushFilters` returns only the residual set for Spark to re-apply.
  *
  * [[SupportsPushDownAggregates]] with COMPLETE pushdown: when the
  * query's aggregate is `COUNT(*) / COUNT(col) / SUM(v|bucket) /
  * MIN / MAX(id|v|bucket)`, optionally grouped by `bucket`, the source
  * answers it in closed form over the pushed id range
  * ([[SeqSource.bucketStats]]) and the planner erases the Aggregate
  * node entirely — the plan degenerates to a driver-local row set
  * ([[LocalScan]]). A `COUNT(*)` over 10^14 generated ids costs the
  * same as over 10^2: the connector contract that lets a catalog
  * answer `SELECT count(*) FROM t` from manifest statistics instead of
  * scanning 100 TB. Unsupported shapes (`SUM(id)`, distinct aggs, AVG
  * partials) return false and fall back to the ordinary row scan —
  * pushdown must never change semantics, only cost. */
final class SeqScanBuilder(start: Long, end: Long,
    clustered: Boolean = false, rowsPerBatch: Long = Long.MaxValue)
    extends ScanBuilder
    with SupportsPushDownFilters with SupportsPushDownRequiredColumns
    with SupportsPushDownAggregates
    with SupportsPushDownTopN with SupportsPushDownLimit {

  private var lo = start
  private var hi = end
  private var pushed: Array[Filter] = Array.empty
  private var required: StructType = SeqSource.fullSchema
  private var aggPlan: Option[SeqAggPlan] = None
  // (descending, n): a fully-answered ORDER BY id [ASC|DESC] LIMIT n;
  // None = no order/limit pushed. A bare LIMIT is (ascending, n) — any
  // n rows satisfy un-ordered LIMIT, and ascending-from-lo keeps the
  // source deterministic.
  private var topN: Option[(Boolean, Int)] = None

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

  override def supportCompletePushDown(a: Aggregation): Boolean =
    SeqAggPlan.translate(a).isDefined

  override def pushAggregation(a: Aggregation): Boolean =
    SeqAggPlan.translate(a) match {
      case some @ Some(_) => aggPlan = some; true
      case None => false
    }

  // ---- ORDER BY … LIMIT n (SupportsPushDownTopN) ---------------------------
  // `id` is the generator's clustering key AND unique, so a leading
  // sort key on `id` is answerable in closed form — the top n of
  // [lo, hi) is just one end of the range — and any FURTHER sort keys
  // are dead (a unique leading key already totally orders the rows),
  // so they are accepted and ignored. Orders led by any other column
  // decline: v/bucket top-n would need tie semantics the fully-pushed
  // contract (Spark REMOVES the Sort + Limit) must not approximate.
  // Fully pushed (isPartiallyPushed = false): the scan emits EXACTLY
  // the top n rows in the requested order.
  override def pushTopN(orders: Array[V2SortOrder], limit: Int): Boolean =
    if (aggPlan.isDefined || orders.isEmpty || limit < 0) false
    else orders.head.expression() match {
      case nr: NamedReference if nr.fieldNames.length == 1 &&
          nr.fieldNames()(0).equalsIgnoreCase(SeqSource.ID) =>
        topN = Some(
          (orders.head.direction() == SortDirection.DESCENDING, limit))
        true
      case _ => false
    }

  // Bare LIMIT n (no ORDER BY): any n rows are a correct answer; the
  // source serves the first n of the pushed range (deterministic).
  override def pushLimit(limit: Int): Boolean =
    if (aggPlan.isDefined || limit < 0) false
    else { topN = Some((false, limit)); true }

  override def isPartiallyPushed(): Boolean = false

  override def build(): Scan = (aggPlan, topN) match {
    case (Some(p), _) => new SeqAggScan(lo, math.max(lo, hi), p, pushed)
    case (None, Some((desc, n))) =>
      new SeqTopNScan(lo, math.max(lo, hi), n, desc, required, pushed)
    case _ if clustered =>
      new SeqClusteredScan(lo, math.max(lo, hi), required, pushed,
        rowsPerBatch)
    case _ => new SeqScan(start, end, lo, math.max(lo, hi), required, pushed,
      rowsPerBatch)
  }
}

/** The pushed ORDER-BY-id/LIMIT scan: ONE partition of at most `n`
  * rows from the requested end of `[lo, hi)`, emitted in the requested
  * order — output-sized, like every fully-pushed top-n must be (the
  * Sort and Limit operators are GONE from the plan, so the scan's row
  * set and order ARE the result). */
final class SeqTopNScan(lo: Long, hi: Long, n: Int, desc: Boolean,
    required: StructType, pushed: Array[Filter]) extends Scan with Batch {

  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-seq topN [$lo, $hi) limit=$n order=id ${if (desc) "DESC" else "ASC"}, " +
      s"PushedFilters: [${pushed.mkString(", ")}], " +
      s"ReadSchema: ${required.catalogString}"

  override def planInputPartitions(): Array[InputPartition] = {
    if (hi <= lo || n == 0) return Array.empty
    val take = math.min(n.toLong, hi - lo)
    val slice =
      if (desc) SeqOrderedSlice(hi - 1L, take, -1L)
      else SeqOrderedSlice(lo, take, 1L)
    Array(slice)
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new SeqReaderFactory(required.fieldNames)
}

/** `count` ids starting at `first`, stepping `step` (±1). */
final case class SeqOrderedSlice(first: Long, count: Long, step: Long)
  extends InputPartition

/** One bucket's ids within the pushed range: `count` ids from `first`
  * stepping 16, all ≡ `bucket` (mod 16). [[HasPartitionKey]] declares
  * the bucket value so Spark can key-group the partitions. */
final case class SeqBucketSlice(bucket: Int, first: Long, count: Long)
    extends InputPartition with HasPartitionKey {
  override def partitionKey(): InternalRow =
    new GenericInternalRow(Array[Any](bucket))
}

/** The bucket-clustered row scan ([[SupportsReportPartitioning]]): one
  * input partition per bucket value present in the pushed range, each
  * declaring its key, the whole scan reporting
  * [[KeyGroupedPartitioning]] over `identity(bucket)`.
  *
  * This is the DSv2-native analog of a bucketed catalog table (the
  * storage-partitioned-join contract Iceberg/Delta tables use): with
  * `spark.sql.sources.v2.bucketing.enabled`, a join of two clustered
  * graft-seq scans whose keys include `bucket` satisfies both sides'
  * ClusteredDistribution straight from storage — Catalyst plans NO
  * exchange on either side, and a downstream `GROUP BY bucket` reuses
  * the same partitioning. At 100 TB this is the single biggest shuffle
  * lever a recurring fact⋈fact join has: co-locating by construction
  * removes the two largest exchanges from the plan entirely.
  *
  * Parallelism = #buckets (16 here) — exactly the bucketed-table trade:
  * the cluster width is fixed by the layout, not the data size, which
  * is why real tables choose bucket counts in the hundreds-to-thousands.
  * Pushed `id` predicates still narrow the per-bucket ranges (planning-
  * time pruning composes with the clustering). */
final class SeqClusteredScan(lo: Long, hi: Long,
    required: StructType, pushed: Array[Filter],
    rowsPerBatch: Long = Long.MaxValue)
    extends Scan with Batch with SupportsReportPartitioning
    with SupportsReportStatistics with SupportsReportOrdering {

  // clustering is a BATCH layout property; a streaming read of a
  // clustered table still gets the micro-batch source (the table
  // advertises MICRO_BATCH_READ unconditionally, so this override must
  // exist — Scan's default throws at query start)
  override def toMicroBatchStream(checkpointLocation: String)
      : org.apache.spark.sql.connector.read.streaming.MicroBatchStream =
    new SeqMicroBatchStream(lo, hi, rowsPerBatch, required)

  override def estimateStatistics(): Statistics =
    SeqSource.statsOf(math.max(0L, hi - lo), required)

  // bucket slices step 16, so ids ascend within every partition; with
  // the key-grouped partitioning this makes the SPJ sort-merge join
  // sort-free as well as exchange-free
  override def outputOrdering(): Array[V2SortOrder] =
    SeqSource.idOrdering(required)

  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-seq clustered [$lo, $hi) by=bucket, " +
      s"PushedFilters: [${pushed.mkString(", ")}], " +
      s"ReadSchema: ${required.catalogString}"

  private lazy val slices: Array[InputPartition] =
    (0 until 16).iterator.flatMap { b =>
      if (hi <= lo) Iterator.empty
      else {
        // first id ≡ b (mod 16) in [lo, hi)
        val first = lo + (((b - lo) % 16L + 16L) % 16L)
        if (first >= hi) Iterator.empty
        else {
          val count = (hi - 1L - first) / 16L + 1L
          Iterator.single(SeqBucketSlice(b, first, count): InputPartition)
        }
      }
    }.toArray

  override def planInputPartitions(): Array[InputPartition] = slices

  override def outputPartitioning(): V2Partitioning =
    new KeyGroupedPartitioning(
      Array(Expressions.identity(SeqSource.BUCKET)), slices.length)

  override def createReaderFactory(): PartitionReaderFactory =
    new SeqReaderFactory(required.fieldNames)
}

/** A translated, fully-answerable pushed aggregation: optional
  * group-by-`bucket` plus per-function evaluators over
  * [[SeqSource.BucketStat]]. Translation is total-or-nothing — one
  * unsupported function rejects the whole Aggregation, because
  * complete pushdown replaces the Aggregate node wholesale. */
final case class SeqAggPlan(groupByBucket: Boolean,
    fields: Seq[(String, DataType, SeqSource.BucketStat => Any)]) {
  def schema: StructType = {
    val group = if (groupByBucket)
      Seq(StructField(SeqSource.BUCKET, IntegerType, nullable = false))
    else Seq.empty
    StructType(group ++ fields.map { case (n, t, _) =>
      StructField(n, t, nullable = true)
    })
  }
}

object SeqAggPlan {
  import SeqSource.BucketStat

  private def colOf(e: V2Expression): Option[String] = e match {
    case nr: NamedReference if nr.fieldNames.length == 1 =>
      Some(nr.fieldNames()(0).toLowerCase)
    case _ => None
  }

  private def fn(f: AggregateFunc)
      : Option[(String, DataType, BucketStat => Any)] = f match {
    case _: CountStar => Some(("cnt", LongType, s => s.cnt))
    // every generated column is non-null, so COUNT(col) == COUNT(*)
    case c: Count if !c.isDistinct && colOf(c.column).exists(
        Set(SeqSource.ID, SeqSource.BUCKET, SeqSource.V, SeqSource.PAYLOAD)) =>
      Some(("cnt", LongType, s => s.cnt))
    case c: Sum if !c.isDistinct => colOf(c.column) match {
      // SUM(id) is deliberately unsupported: no wrap-free closed form
      // at full extent, and a silent Long wrap is exactly the
      // divergence pushdown must not introduce. Falls back to row scan.
      case Some(SeqSource.V) => Some(("sum_v", LongType, s => s.sumV))
      case Some(SeqSource.BUCKET) =>
        Some(("sum_b", LongType, s => s.bucket.toLong * s.cnt))
      case _ => None
    }
    case m: Min => colOf(m.column) match {
      case Some(SeqSource.ID) => Some(("min_id", LongType, s => s.minId))
      case Some(SeqSource.V) => Some(("min_v", LongType, s => s.minV))
      case Some(SeqSource.BUCKET) =>
        Some(("min_b", IntegerType, s => s.bucket))
      case _ => None
    }
    case m: Max => colOf(m.column) match {
      case Some(SeqSource.ID) => Some(("max_id", LongType, s => s.maxId))
      case Some(SeqSource.V) => Some(("max_v", LongType, s => s.maxV))
      case Some(SeqSource.BUCKET) =>
        Some(("max_b", IntegerType, s => s.bucket))
      case _ => None
    }
    case _ => None
  }

  def translate(a: Aggregation): Option[SeqAggPlan] = {
    val groupBy = a.groupByExpressions.toSeq.map(colOf)
    val groupOk = groupBy match {
      case Seq() => Some(false)
      case Seq(Some(SeqSource.BUCKET)) => Some(true)
      case _ => None
    }
    for {
      g <- groupOk
      fs <- {
        val t = a.aggregateExpressions.toSeq.map(fn)
        if (t.forall(_.isDefined)) Some(t.flatten) else None
      }
    } yield SeqAggPlan(g, fs)
  }
}

/** The pushed-aggregate scan: a [[LocalScan]] whose rows are computed
  * on the driver from [[SeqSource.bucketStats]] — O(period), never a
  * cluster job. Global (ungrouped) aggregation over an empty range
  * follows SQL semantics: COUNT = 0, MIN/MAX/SUM = NULL. */
final class SeqAggScan(lo: Long, hi: Long, plan: SeqAggPlan,
    pushedFilters: Array[Filter]) extends LocalScan {

  override def readSchema(): StructType = plan.schema
  override def description(): String =
    s"graft-seq agg [$lo, $hi) groupByBucket=${plan.groupByBucket} " +
      s"aggs=[${plan.fields.map(_._1).mkString(", ")}], " +
      s"PushedFilters: [${pushedFilters.mkString(", ")}]"

  override def rows(): Array[InternalRow] = {
    val stats = SeqSource.bucketStats(lo, hi)
    if (plan.groupByBucket) {
      stats.map { st =>
        InternalRow.fromSeq(st.bucket +: plan.fields.map(_._3(st)))
      }.toArray
    } else if (stats.isEmpty) {
      Array(InternalRow.fromSeq(plan.fields.map {
        case ("cnt", _, _) => 0L
        case _ => null
      }))
    } else {
      // fold the per-bucket stats into one global BucketStat; the
      // bucket field itself is unused by any ungrouped evaluator
      // except min_b/max_b, which read the folded extremes below
      val cnt = stats.map(_.cnt).sum
      val global = SeqSource.BucketStat(
        bucket = stats.map(_.bucket).min,
        cnt = cnt,
        sumV = stats.map(_.sumV).sum,
        minId = stats.map(_.minId).min,
        maxId = stats.map(_.maxId).max,
        minV = stats.map(_.minV).min,
        maxV = stats.map(_.maxV).max)
      Array(InternalRow.fromSeq(plan.fields.map {
        case ("sum_b", _, _) =>
          stats.map(st => st.bucket.toLong * st.cnt).sum
        case ("max_b", _, _) => stats.map(_.bucket).max
        case (_, _, eval) => eval(global)
      }))
    }
  }
}

/** The ordinary row scan, plus [[SupportsRuntimeV2Filtering]] — the
  * connector analog of dynamic partition pruning: when this scan is the
  * probe side of a broadcast join keyed on `id`, Spark collects the
  * build side's distinct `id` values at RUNTIME and hands them to
  * [[filter]] as an IN predicate before [[planInputPartitions]] runs.
  * The scan narrows the generated range to the values' [min, max] hull
  * AND keeps the exact sorted value set, so the planned partitions and
  * the emitted rows shrink from "the whole fact range" to "exactly the
  * ids the join can match". At 100 TB this is the difference between
  * scanning the fact table and scanning the join's footprint — the DPP
  * contract parquet tables get from partition directories, here exact
  * to the row because the source knows its own layout. Unparseable or
  * non-`id` runtime predicates are ignored: runtime filters are an
  * OPTIMIZATION contract (the join above re-applies the condition), so
  * dropping one can never change results, only cost. */
final class SeqScan(tableStart: Long, tableEnd: Long, lo0: Long, hi0: Long,
    required: StructType, pushed: Array[Filter],
    rowsPerBatch: Long = Long.MaxValue)
    extends Scan with Batch with SupportsRuntimeV2Filtering
    with SupportsReportStatistics with SupportsReportOrdering {

  private var lo = lo0
  private var hi = hi0
  /** Exact runtime id set (sorted), when an IN filter arrived; null =
    * no runtime filter, serve the whole [lo, hi) range. */
  private var idSet: Array[Long] = null

  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-seq [$lo, $hi) PushedFilters: [${pushed.mkString(", ")}], " +
      s"ReadSchema: ${required.catalogString}"

  override def estimateStatistics(): Statistics = {
    val rows =
      if (idSet != null) idSet.count(id => id >= lo && id < hi).toLong
      else math.max(0L, hi - lo)
    SeqSource.statsOf(rows, required)
  }

  override def outputOrdering(): Array[V2SortOrder] =
    SeqSource.idOrdering(required)

  override def filterAttributes(): Array[NamedReference] =
    Array(Expressions.column(SeqSource.ID))

  /** The sorted id set implied by one runtime predicate, if it is an
    * integral IN over `id` — None means "not parseable, skip THIS
    * predicate" (never the whole batch: each runtime filter narrows
    * independently, and dropping one only costs pruning, not
    * correctness). */
  private def inIdSet(p: Predicate): Option[Array[Long]] = {
    if (p.name() != "IN" || p.children().isEmpty) return None
    val onId = p.children()(0) match {
      case nr: NamedReference => nr.fieldNames.length == 1 &&
        nr.fieldNames()(0).equalsIgnoreCase(SeqSource.ID)
      case _ => false
    }
    if (!onId) return None
    type Lit = org.apache.spark.sql.connector.expressions.Literal[_]
    val lits = p.children().drop(1)
    if (!lits.forall(_.isInstanceOf[Lit])) return None
    val longs: Array[Option[Long]] =
      lits.iterator.map(_.asInstanceOf[Lit].value: Any).map {
        case l: java.lang.Long => Some(l.longValue())
        case i: java.lang.Integer => Some(i.longValue())
        case _ => None // non-integral literal
      }.toArray
    if (longs.forall(_.isDefined)) Some(longs.flatten.sorted.distinct)
    else None
  }

  override def filter(predicates: Array[Predicate]): Unit =
    predicates.foreach { p =>
      inIdSet(p).foreach { vals =>
        // intersect with any earlier runtime set; clamp the range hull
        idSet = if (idSet == null) vals
          else vals.filter(java.util.Arrays.binarySearch(idSet, _) >= 0)
        if (idSet.isEmpty) { lo = hi }
        else {
          lo = math.max(lo, idSet.head)
          hi = math.min(hi, idSet.last + 1L)
        }
      }
    }

  override def planInputPartitions(): Array[InputPartition] = {
    if (hi <= lo) return Array.empty
    val target = SparkSession.active.sparkContext.defaultParallelism
    if (idSet != null) {
      // exact runtime set: plan output-sized partitions over the ids
      // still inside the (statically + dynamically narrowed) range
      val live = idSet.filter(id => id >= lo && id < hi)
      if (live.isEmpty) return Array.empty
      val perSlice = math.max(1, (live.length + target - 1) / target)
      return live.grouped(perSlice)
        .map(ids => SeqIdsSlice(ids): InputPartition).toArray
    }
    // the slice grid is fixed by the TABLE's extent (one slice per core
    // at session parallelism — the cluster-scaling knob, a file-split
    // analogue); the pushed range then selects only OVERLAPPING grid
    // slices, so a selective predicate plans fewer partitions — the
    // partition-pruning contract, not just emptier readers
    val total = math.max(1L, tableEnd - tableStart)
    val slice = math.max(1L, (total + target.toLong - 1L) / target.toLong)
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

  override def toMicroBatchStream(checkpointLocation: String)
      : org.apache.spark.sql.connector.read.streaming.MicroBatchStream =
    new SeqMicroBatchStream(lo, hi, rowsPerBatch, required)
}

/** An explicit id list (runtime-filtered scans): already range-checked
  * at planning, the reader walks the array. */
final case class SeqIdsSlice(ids: Array[Long]) extends InputPartition

/** Streaming offset: the next unserved id (everything below it is
  * committed). JSON form is the bare number. */
final case class SeqOffset(id: Long)
    extends org.apache.spark.sql.connector.read.streaming.Offset {
  override def json(): String = id.toString
}

/** The connector's STREAMING read leg ([[SeqScanBuilder]] →
  * `toMicroBatchStream`): graft-seq as a micro-batch source, the
  * RateSource shape every ingest connector implements. Offsets are id
  * positions; each trigger serves the next `rowsPerBatch` ids of the
  * pushed `[lo, hi)` range ([[SupportsAdmissionControl]] — the knob
  * that keeps a catch-up read from planning one 100 TB batch), sliced
  * across the session's parallelism by the same grid as the batch
  * scan and read by the SAME [[SeqReaderFactory]] (columnar batches
  * included). The range's end behaves like a bounded topic:
  * `Trigger.AvailableNow` drains `[lo, hi)` in
  * ceil(extent/rowsPerBatch) batches and stops; the oracle-checked
  * q192 aggregate over the drained sink therefore certifies
  * exactly-once delivery across batch boundaries (any dropped or
  * double-served id shifts a bucket's count/sum). Offsets restart
  * from the checkpoint via [[deserializeOffset]]; commit is a no-op
  * (the generator is stateless — replay is idempotent by
  * construction). */
final class SeqMicroBatchStream(lo: Long, hi: Long, rowsPerBatch: Long,
    required: StructType)
    extends org.apache.spark.sql.connector.read.streaming.MicroBatchStream
    with org.apache.spark.sql.connector.read.streaming.SupportsTriggerAvailableNow {
  import org.apache.spark.sql.connector.read.streaming.{Offset => SOffset, ReadLimit}

  // AvailableNow contract: pin the drain target when the trigger
  // starts. The generator's extent is immutable, so the target IS the
  // table end — nothing to snapshot.
  override def prepareForTriggerAvailableNow(): Unit = ()

  override def initialOffset(): SOffset = SeqOffset(lo)
  override def deserializeOffset(json: String): SOffset =
    SeqOffset(json.trim.toLong)

  override def latestOffset(): SOffset =
    throw new UnsupportedOperationException(
      "latestOffset(start, limit) should be called instead")

  override def latestOffset(start: SOffset, limit: ReadLimit): SOffset = {
    val s = start.asInstanceOf[SeqOffset].id
    val step = math.min(rowsPerBatch, hi - s)
    SeqOffset(if (step <= 0L) s else s + step)
  }

  /** The true end of the readable extent — what AvailableNow drains to. */
  override def reportLatestOffset(): SOffset = SeqOffset(hi)

  override def planInputPartitions(start: SOffset, end: SOffset)
      : Array[InputPartition] = {
    val s = start.asInstanceOf[SeqOffset].id
    val e = end.asInstanceOf[SeqOffset].id
    if (e <= s) return Array.empty
    val target = SparkSession.active.sparkContext.defaultParallelism.toLong
    val slice = math.max(1L, (e - s + target - 1L) / target)
    (s until e by slice)
      .map(b => SeqSlice(b, math.min(e, b + slice)): InputPartition).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new SeqReaderFactory(required.fieldNames)

  override def commit(end: SOffset): Unit = ()
  override def stop(): Unit = ()
}

final case class SeqSlice(s: Long, e: Long) extends InputPartition

/** Row AND columnar readers over every slice shape. Columnar is the
  * default read path ([[supportColumnarReads]]): partitions emit
  * [[org.apache.spark.sql.vectorized.ColumnarBatch]]es of 4096 rows
  * into on-heap column vectors, and Spark plans the codegen'd
  * `ColumnarToRow` bridge above the scan — the same vectorized shape
  * the built-in parquet reader produces, here from a from-scratch
  * connector. The per-batch loop is column-major over primitive
  * vectors (no per-row boxing, no per-row InternalRow allocation),
  * which is what makes wide scans CPU-bound instead of
  * allocation-bound at 100 TB. The row reader remains for the
  * zero-column edge (`select(count(*))`-style plans whose aggregate
  * was NOT pushable) where a columnar batch has no vectors to carry. */
final class SeqReaderFactory(cols: Array[String])
    extends PartitionReaderFactory {

  // id enumerator per slice shape: range slices walk ascending; pushed
  // top-n slices walk from the range's requested end; bucket slices
  // step 16; runtime-filtered slices walk an explicit array
  private def shapeOf(p: InputPartition): (Long => Long, Long) = p match {
    case SeqIdsSlice(ids) => ((i: Long) => ids(i.toInt), ids.length.toLong)
    case SeqSlice(s, e) => ((i: Long) => s + i, e - s)
    case SeqOrderedSlice(f, c, st) => ((i: Long) => f + i * st, c)
    case SeqBucketSlice(_, f, c) => ((i: Long) => f + i * 16L, c)
  }

  override def supportColumnarReads(p: InputPartition): Boolean =
    cols.nonEmpty

  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val (nextId, count) = shapeOf(p)
    new PartitionReader[InternalRow] {
      private var i = -1L
      private var id = 0L
      override def next(): Boolean = {
        i += 1
        if (i < count) { id = nextId(i); true } else false
      }
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

  override def createColumnarReader(p: InputPartition)
      : PartitionReader[org.apache.spark.sql.vectorized.ColumnarBatch] = {
    import org.apache.spark.sql.execution.vectorized.OnHeapColumnVector
    import org.apache.spark.sql.vectorized.{ColumnVector, ColumnarBatch}
    val (nextId, count) = shapeOf(p)
    val schema = StructType(cols.map(c =>
      SeqSource.fullSchema(SeqSource.fullSchema.fieldIndex(c))))
    new PartitionReader[ColumnarBatch] {
      private val capacity = 4096
      private val vectors = OnHeapColumnVector.allocateColumns(capacity, schema)
      private val batch =
        new ColumnarBatch(vectors.map(v => v: ColumnVector).toArray)
      private var pos = 0L
      override def next(): Boolean = {
        if (pos >= count) return false
        val n = math.min(capacity.toLong, count - pos).toInt
        var c = 0
        while (c < cols.length) {
          val vec = vectors(c)
          vec.reset()
          cols(c) match {
            case SeqSource.ID =>
              var i = 0
              while (i < n) { vec.putLong(i, nextId(pos + i)); i += 1 }
            case SeqSource.BUCKET =>
              var i = 0
              while (i < n) {
                vec.putInt(i, SeqSource.bucketOf(nextId(pos + i))); i += 1
              }
            case SeqSource.V =>
              var i = 0
              while (i < n) {
                vec.putLong(i, SeqSource.vOf(nextId(pos + i))); i += 1
              }
            case SeqSource.PAYLOAD =>
              var i = 0
              while (i < n) {
                val b = SeqSource.payloadOf(nextId(pos + i))
                  .getBytes(java.nio.charset.StandardCharsets.UTF_8)
                vec.putByteArray(i, b, 0, b.length); i += 1
              }
          }
          c += 1
        }
        batch.setNumRows(n)
        pos += n
        true
      }
      override def get(): ColumnarBatch = batch
      override def close(): Unit = batch.close()
    }
  }
}
