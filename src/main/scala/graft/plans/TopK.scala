package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute,
  AttributeSet, EqualTo, Expression, GreaterThan, GreaterThanOrEqual,
  IntegerLiteral, JoinedRow, LessThan, LessThanOrEqual, PredicateHelper,
  RowNumber, SortOrder, SpecifiedWindowFrame, UnsafeProjection, UnsafeRow,
  WindowExpression, WindowSpecDefinition}
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.expressions.{CurrentRow, RowFrame,
  UnboundedPreceding}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan,
  UnaryNode, Window}
import org.apache.spark.sql.catalyst.plans.physical.{AllTuples,
  ClusteredDistribution, Distribution, Partitioning, UnspecifiedDistribution}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy,
  UnaryExecNode}
import org.apache.spark.sql.execution.metric.{SQLMetric, SQLMetrics}

/** Whole-operator custom plan: bounded-state top-k per key.
  *
  * The declarative spelling every user writes —
  * `row_number() OVER (PARTITION BY p ORDER BY o) <= k` under a filter
  * — plans, by default, as sort + window: EVERY row of every group is
  * shuffled on `p`, locally sorted on `(p, o)`, and walked by
  * WindowExec just to keep k of them. Spark 3.5+'s InferWindowGroupLimit
  * improves this (a partial WindowGroupLimitExec drops rows beyond rank
  * k before the exchange) but keeps both full local SORTS and the
  * Window operator: cost O(n log n) per partition either way.
  *
  * This file is the brief's custom-operator ladder rung (c) — a custom
  * `LogicalPlan` + `Rule[LogicalPlan]` + `SparkStrategy` + `SparkPlan`
  * registered through `SparkSessionExtensions`: the same filter-over-
  * window pattern is rewritten to a heap-based partial/final pair.
  * The partial exec keeps one bounded k-row heap per key per input
  * partition — O(n log k), NO sort — and forwards at most k rows per
  * (key, partition); EnsureRequirements inserts the hash exchange the
  * final exec's ClusteredDistribution demands; the final exec re-trims
  * co-located survivors and emits ranks 1..k from the heap order. At
  * 100 TB the shuffle carries k·|keys|·|partitions| rows instead of n,
  * and nothing is ever sorted: the q97 typed-Aggregator result
  * (bounded state beats window-sort), promoted from an API the user
  * must know to an optimization the engine applies to the plan every
  * SQL/DataFrame user already writes.
  *
  * Rewrite safety: only fires on a Window whose ONLY window expression
  * is `row_number()` with the standard frame, with a non-empty
  * deterministic ORDER BY, under a Filter conjunct bounding the rank by
  * a literal k (`<= k`, `< k+1`, `= k`, reversed forms). The original
  * Filter stays above the rewritten node, so non-rank conjuncts and
  * exact-rank predicates (`rn = 2`) keep their semantics. Ties in the
  * ORDER BY get an arbitrary-but-valid assignment, exactly like
  * row_number itself — any query whose result must be deterministic
  * already needs a total order under EITHER plan. Opt out per session
  * with `spark.graft.topkRewrite.enabled=false`; ranks beyond
  * `spark.graft.topkRewrite.maxK` (default 1000) keep the window plan
  * (a million-row heap per key would trade a sort for a worse cache
  * profile — WindowGroupLimit's regime).
  */
object TopK {
  val EnabledKey = "spark.graft.topkRewrite.enabled"
  val MaxKKey = "spark.graft.topkRewrite.maxK"
}

/** Logical bounded top-k per key: at most `limit` rows per distinct
  * `partitionSpec` value, the first `limit` under `orderSpec`, with the
  * row_number output re-exposed as `rankAttr` (the original window
  * alias's exprId, so references above resolve unchanged). */
case class TopKPerKey(
    partitionSpec: Seq[Expression],
    orderSpec: Seq[SortOrder],
    limit: Int,
    rankAttr: Attribute,
    child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output :+ rankAttr
  override def producedAttributes: AttributeSet = AttributeSet(rankAttr)
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(newChild: LogicalPlan)
      : TopKPerKey = copy(child = newChild)
}

/** Optimizer rule: Filter(rank-bound ∧ …, Window(row_number)) →
  * Filter(unchanged, TopKPerKey). Injected via
  * `SparkSessionExtensions.injectOptimizerRule`, so it runs inside the
  * operator-optimization batch — BEFORE InferWindowGroupLimit, which
  * then has no Window left to act on. */
case class TopKRewrite(session: SparkSession)
    extends Rule[LogicalPlan] with PredicateHelper {

  private def enabled: Boolean =
    conf.getConfString(TopK.EnabledKey, "true").toBoolean
  private def maxK: Int =
    conf.getConfString(TopK.MaxKKey, "1000").toInt

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!enabled) plan
    else plan.transformUp {
      case f @ Filter(cond, w: Window) if eligible(w) =>
        val rank = w.windowExpressions.head.toAttribute
        rankBound(cond, rank) match {
          case Some(k) if k >= 1 && k <= maxK =>
            Filter(cond,
              TopKPerKey(w.partitionSpec, w.orderSpec, k, rank, w.child))
          case _ => f
        }
    }

  private def eligible(w: Window): Boolean = w.windowExpressions match {
    case Seq(Alias(WindowExpression(RowNumber(),
        WindowSpecDefinition(_, _, frame)), _)) =>
      w.orderSpec.nonEmpty &&
        w.partitionSpec.forall(_.deterministic) &&
        w.orderSpec.forall(_.child.deterministic) &&
        (frame match {
          case SpecifiedWindowFrame(RowFrame, UnboundedPreceding, CurrentRow) =>
            true
          case _ => false
        })
    case _ => false
  }

  /** Tightest rank bound k implied by the filter's conjuncts, if any.
    * Only plain int-literal comparisons against the rank attribute —
    * a Cast'd or non-literal bound keeps the window plan. */
  private def rankBound(cond: Expression, rank: Attribute): Option[Int] = {
    val bounds = splitConjunctivePredicates(cond).flatMap {
      case LessThanOrEqual(a: Attribute, IntegerLiteral(v))
        if a.semanticEquals(rank) => Some(v)
      case LessThan(a: Attribute, IntegerLiteral(v))
        if a.semanticEquals(rank) => Some(v - 1)
      case EqualTo(a: Attribute, IntegerLiteral(v))
        if a.semanticEquals(rank) => Some(v)
      case GreaterThanOrEqual(IntegerLiteral(v), a: Attribute)
        if a.semanticEquals(rank) => Some(v)
      case GreaterThan(IntegerLiteral(v), a: Attribute)
        if a.semanticEquals(rank) => Some(v - 1)
      case EqualTo(IntegerLiteral(v), a: Attribute)
        if a.semanticEquals(rank) => Some(v)
      case _ => None
    }
    if (bounds.isEmpty) None else Some(bounds.min)
  }
}

/** Plans the logical node as the partial/final exec pair. The partial
  * runs on the child's partitioning (map side); the final declares
  * ClusteredDistribution, so EnsureRequirements inserts exactly one
  * hash exchange between them — over the trimmed rows. */
case class TopKStrategy(session: SparkSession) extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKey(part, order, k, rankAttr, child) =>
      val partial =
        TopKPerKeyExec(part, order, k, rankAttr, partial = true,
          planLater(child))
      TopKPerKeyExec(part, order, k, rankAttr, partial = false,
        partial) :: Nil
    case _ => Nil
  }
}

/** Heap-based top-k physical operator.
  *
  * partial=true: one bounded k-row heap per key in an open hash map;
  * rows provably outside their key's top k (worse than k already-kept
  * rows of the same key in this partition) are dropped at O(log k).
  * State is capped at [[TopKPerKeyExec.MaxPartialKeys]] keys per
  * partition — when a partition carries more distinct keys, overflow
  * keys' rows pass through un-trimmed (correct: the final exec re-trims
  * everything; the cap only bounds MEMORY, mirroring hash-aggregate's
  * partial-skip fallback).
  *
  * partial=false: same heap build over co-located rows (every row of a
  * key is now in one partition, so the heap IS the key's true top k),
  * then ranks 1..size emitted by draining each heap worst-first into a
  * fixed array. Per-partition state is output-sized (≤ k rows per key).
  */
case class TopKPerKeyExec(
    partitionSpec: Seq[Expression],
    orderSpec: Seq[SortOrder],
    limit: Int,
    rankAttr: Attribute,
    partial: Boolean,
    child: SparkPlan) extends UnaryExecNode {

  override def nodeName: String =
    if (partial) "TopKPerKey (partial)" else "TopKPerKey (final)"

  override def output: Seq[Attribute] =
    if (partial) child.output else child.output :+ rankAttr

  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) Seq(UnspecifiedDistribution)
    else if (partitionSpec.isEmpty) Seq(AllTuples)
    else Seq(ClusteredDistribution(partitionSpec))

  override def outputPartitioning: Partitioning = child.outputPartitioning

  override lazy val metrics: Map[String, SQLMetric] = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "output rows"))

  override protected def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    val part = partitionSpec
    val order = orderSpec
    val k = limit
    val isPartial = partial
    val rank = rankAttr
    val outAttrs = output
    val numOutputRows = longMetric("numOutputRows")
    val maxPartialKeys = TopKPerKeyExec.MaxPartialKeys
    child.execute().mapPartitions({ iter =>
      val keyProj = UnsafeProjection.create(part, childOutput)
      val ord = GenerateOrdering.generate(order, childOutput)
      // Reversed comparator: the heap head is the WORST kept row —
      // the eviction candidate.
      val heapCmp = new java.util.Comparator[InternalRow] {
        override def compare(a: InternalRow, b: InternalRow): Int =
          ord.compare(b, a)
      }
      val heaps = new java.util.LinkedHashMap[UnsafeRow,
        java.util.PriorityQueue[InternalRow]]()
      val maxKeys = if (isPartial) maxPartialKeys else Int.MaxValue

      def offer(row: InternalRow): Boolean = {
        val key = keyProj(row)
        var heap = heaps.get(key)
        if (heap == null) {
          if (heaps.size() >= maxKeys) return false // caller passes through
          heap = new java.util.PriorityQueue[InternalRow](k + 1, heapCmp)
          heaps.put(key.copy(), heap)
        }
        if (heap.size() < k) heap.offer(row.copy())
        else if (ord.compare(row, heap.peek()) < 0) {
          heap.poll(); heap.offer(row.copy())
        }
        true
      }

      val appendRank = if (isPartial) null
        else UnsafeProjection.create(outAttrs, childOutput :+ rank)
      def flush(): Iterator[InternalRow] = {
        val entries = heaps.values().iterator()
        new Iterator[InternalRow] {
          private var buf: Array[InternalRow] = Array.empty
          private var i = 0
          private val joined = new JoinedRow
          private val rankRow =
            new org.apache.spark.sql.catalyst.expressions
              .GenericInternalRow(1)
          override def hasNext: Boolean = {
            while (i >= buf.length && entries.hasNext) {
              val h = entries.next()
              buf = new Array[InternalRow](h.size())
              // poll() yields worst-first; fill back-to-front so buf
              // is ascending in the window order = rank order.
              var j = buf.length - 1
              while (j >= 0) { buf(j) = h.poll(); j -= 1 }
              i = 0
            }
            i < buf.length
          }
          override def next(): InternalRow = {
            val row = buf(i); i += 1
            numOutputRows += 1
            if (isPartial) row
            else {
              rankRow.setInt(0, i) // rank = 1-based position
              appendRank(joined(row, rankRow))
            }
          }
        }
      }

      // Streaming driver: trims input into the heaps, passing overflow
      // rows straight through (partial only); flushes heaps at end.
      new Iterator[InternalRow] {
        private var flushed: Iterator[InternalRow] = null
        private var pending: InternalRow = null
        override def hasNext: Boolean = {
          if (pending != null) return true
          while (flushed == null) {
            if (iter.hasNext) {
              val row = iter.next()
              if (!offer(row)) { pending = row; numOutputRows += 1; return true }
            } else flushed = flush()
          }
          flushed.hasNext
        }
        override def next(): InternalRow = {
          if (pending != null) { val r = pending; pending = null; r }
          else flushed.next()
        }
      }
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan)
      : TopKPerKeyExec = copy(child = newChild)
}

object TopKPerKeyExec {
  /** Partial-state cap: at most this many per-key heaps per input
    * partition (≈ k × this rows buffered). Beyond it, new keys' rows
    * pass through to the exchange un-trimmed — the same memory-over-
    * network trade hash aggregation makes when its hash map fills.
    * A system property (read per doExecute, driver side — the closure
    * captures the resolved value) lets tests force the overflow path;
    * production runs never set it. */
  def MaxPartialKeys: Int =
    sys.props.get("graft.topk.maxPartialKeys").map(_.toInt)
      .getOrElse(1 << 20)
}
