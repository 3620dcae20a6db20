package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute,
  AttributeSet, EqualTo, Expression, GreaterThan, GreaterThanOrEqual,
  IntegerLiteral, JoinedRow, LessThan, LessThanOrEqual, PredicateHelper,
  Rank, RowNumber, SortOrder, SpecifiedWindowFrame, UnsafeProjection,
  UnsafeRow, WindowExpression, WindowSpecDefinition}
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
  * is `row_number()` or `rank()` with the standard frame, with a
  * non-empty deterministic ORDER BY, under a Filter conjunct bounding
  * the rank by a literal k (`<= k`, `< k+1`, `= k`, reversed forms).
  * The original Filter stays above the rewritten node, so non-rank
  * conjuncts and exact-rank predicates (`rn = 2`) keep their
  * semantics. row_number ties in the ORDER BY get an
  * arbitrary-but-valid assignment, exactly like row_number itself —
  * any query whose result must be deterministic under EITHER plan
  * already needs a total order.
  *
  * rank() (ties-aware, the WindowGroupLimit semantics): every row
  * tying the kth order value has rank ≤ k and must be KEPT, so the
  * partial exec passes boundary-tied rows through UNTRIMMED (state
  * stays k-bounded; the wire carries the ties) and the final exec
  * buffers the exact boundary tie set (output-bounded by definition —
  * every buffered row is emitted) and assigns value-aware ranks.
  * Rank-value exactness across the partial trim: a partial drops a row
  * x only when its heap holds k rows STRICTLY before x, all of which
  * survive to the final (heap membership only improves; boundary ties
  * are never dropped) — so for any emitted row with true rank ≤ k, no
  * strict predecessor was ever dropped and the final's survivor-computed
  * rank equals the true rank; a row whose predecessors WERE dropped has
  * ≥ k surviving strict predecessors, computed rank > k, and the Filter
  * above removes it. dense_rank stays on the window plan: its kth
  * DISTINCT value bound is not k-heap-boundable.
  *
  * Opt out per session with `spark.graft.topkRewrite.enabled=false`;
  * ranks beyond `spark.graft.topkRewrite.maxK` (default 1000) keep the
  * window plan (a million-row heap per key would trade a sort for a
  * worse cache profile — WindowGroupLimit's regime). One more regime
  * maxK cannot bound, because it is DATA-dependent rather than
  * k-dependent: with rank() on a low-cardinality ORDER BY key, almost
  * every row ties the partial's heap boundary and passes through
  * un-trimmed — memory stays k-bounded but the exchange carries nearly
  * the whole input, so the rewrite degenerates to the window plan's
  * wire cost (never worse: the window plan shuffles everything too,
  * and it also sorts). The partial exec's `numTiePassThrough` metric
  * makes the regime visible in the SQL UI; pass-through ≈ input rows
  * means the ORDER BY key is too coarse for rank-k trimming to bite,
  * and the fix is a finer order (add a tiebreaker column) or
  * `enabled=false` for that query.
  */
object TopK {
  val EnabledKey = "spark.graft.topkRewrite.enabled"
  val MaxKKey = "spark.graft.topkRewrite.maxK"
}

/** Logical bounded top-k per key: at most `limit` rows per distinct
  * `partitionSpec` value (plus boundary ties when `withTies`), the
  * first `limit` under `orderSpec`, with the row_number/rank output
  * re-exposed as `rankAttr` (the original window alias's exprId, so
  * references above resolve unchanged). `withTies` selects rank()
  * semantics: keep every row tying the kth order value, assign
  * value-aware ranks. */
case class TopKPerKey(
    partitionSpec: Seq[Expression],
    orderSpec: Seq[SortOrder],
    limit: Int,
    rankAttr: Attribute,
    withTies: Boolean,
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
      case f @ Filter(cond, w: Window) =>
        eligible(w) match {
          case Some(withTies) =>
            val rank = w.windowExpressions.head.toAttribute
            rankBound(cond, rank) match {
              case Some(k) if k >= 1 && k <= maxK =>
                Filter(cond, TopKPerKey(w.partitionSpec, w.orderSpec, k,
                  rank, withTies, w.child))
              case _ => f
            }
          case None => f
        }
    }

  /** Some(withTies) when the window is rewritable: row_number →
    * Some(false), rank → Some(true), anything else → None. */
  private def eligible(w: Window): Option[Boolean] = w.windowExpressions match {
    case Seq(Alias(WindowExpression(fn, WindowSpecDefinition(_, _, frame)), _))
        if w.orderSpec.nonEmpty &&
          w.partitionSpec.forall(_.deterministic) &&
          w.orderSpec.forall(_.child.deterministic) &&
          (frame match {
            case SpecifiedWindowFrame(RowFrame, UnboundedPreceding,
              CurrentRow) => true
            case _ => false
          }) =>
      fn match {
        case RowNumber() => Some(false)
        case Rank(_) => Some(true)
        case _ => None
      }
    case _ => None
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
    case TopKPerKey(part, order, k, rankAttr, ties, child) =>
      val partial =
        TopKPerKeyExec(part, order, k, rankAttr, ties, partial = true,
          planLater(child))
      TopKPerKeyExec(part, order, k, rankAttr, ties, partial = false,
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
  * partial-skip fallback). With `withTies` (rank semantics), rows tying
  * the heap's current worst — and evicted rows that tie the new worst —
  * also pass through un-trimmed instead of being buffered: partial
  * state stays at k rows per key, and the exchange carries the
  * boundary ties for the final to adjudicate.
  *
  * partial=false: same heap build over co-located rows (every row of a
  * key is now in one partition, so the heap IS the key's true top k),
  * then ranks emitted by draining each heap worst-first into a fixed
  * array — positional 1..size for row_number; value-aware (equal order
  * values share the earlier rank) for `withTies`, where an exact
  * boundary tie buffer rides beside the heap (every buffered row ties
  * the kth value, so it IS part of the output — the buffer is
  * output-sized by definition). Per-partition state is output-sized.
  */
case class TopKPerKeyExec(
    partitionSpec: Seq[Expression],
    orderSpec: Seq[SortOrder],
    limit: Int,
    rankAttr: Attribute,
    withTies: Boolean,
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
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "output rows")) ++
    // withTies perf regime, made observable: tie volume is DATA-
    // dependent, not k-dependent — on a low-cardinality ORDER BY key
    // (say a boolean) almost every row ties the boundary and the
    // partial degenerates to near-zero trimming, the wire carrying
    // nearly the whole input (memory stays k-bounded; only trimming is
    // lost — the window plan would shuffle the same rows). This metric
    // is the diagnosis: pass-through ≈ input rows ⇒ the ORDER BY key
    // is too coarse for rank-k trimming to bite.
    (if (partial && withTies) Map("numTiePassThrough" ->
      SQLMetrics.createMetric(sparkContext, "boundary-tie pass-through rows"))
     else Map.empty)

  override protected def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    val part = partitionSpec
    val order = orderSpec
    val k = limit
    val isPartial = partial
    val ties = withTies
    val rank = rankAttr
    val outAttrs = output
    val numOutputRows = longMetric("numOutputRows")
    val numTiePassThrough =
      if (partial && withTies) longMetric("numTiePassThrough") else null
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
      final class KeyState {
        val heap = new java.util.PriorityQueue[InternalRow](k + 1, heapCmp)
        // Exact boundary ties (final + withTies only): rows equal in
        // the window order to the heap's current worst — all of them
        // rank ≤ k, so the buffer is part of the output, never trimmed
        // intermediate state.
        var tieBuf: java.util.ArrayList[InternalRow] = null
        def ties(): java.util.ArrayList[InternalRow] = {
          if (tieBuf == null) tieBuf = new java.util.ArrayList[InternalRow]()
          tieBuf
        }
      }
      val heaps = new java.util.LinkedHashMap[UnsafeRow, KeyState]()
      val maxKeys = if (isPartial) maxPartialKeys else Int.MaxValue

      /** Offer `row` to its key's heap. Returns null when the row was
        * absorbed (or provably outside the top k and dropped); a
        * non-null row when the caller must PASS IT THROUGH to the
        * exchange — the offered row itself (key-map overflow, or a
        * partial-side boundary tie) or an evicted row that still ties
        * the new boundary. Only the partial ever returns non-null. */
      def offer(row: InternalRow): InternalRow = {
        val key = keyProj(row)
        var st = heaps.get(key)
        if (st == null) {
          if (heaps.size() >= maxKeys) return row // caller passes through
          st = new KeyState
          heaps.put(key.copy(), st)
        }
        val heap = st.heap
        if (heap.size() < k) { heap.offer(row.copy()); null }
        else {
          val c = ord.compare(row, heap.peek())
          if (c < 0) {
            val evicted = heap.poll()
            heap.offer(row.copy())
            if (!ties) null
            // rank: the evicted row still ranks ≤ k iff it ties the
            // new kth value — forward it (partial) / buffer it (final)
            else if (ord.compare(evicted, heap.peek()) == 0) {
              if (isPartial) { numTiePassThrough += 1; evicted }
              else { st.ties().add(evicted); null }
            } else {
              // boundary moved strictly: previously buffered ties are
              // now provably rank > k
              if (!isPartial && st.tieBuf != null) st.tieBuf.clear()
              null
            }
          } else if (ties && c == 0) {
            // ties the kth value → rank ≤ k, must be kept
            if (isPartial) { numTiePassThrough += 1; row }
            else { st.ties().add(row.copy()); null }
          } else null // strictly worse than k kept rows: rank > k
        }
      }

      val appendRank = if (isPartial) null
        else UnsafeProjection.create(outAttrs, childOutput :+ rank)
      def flush(): Iterator[InternalRow] = {
        val entries = heaps.values().iterator()
        new Iterator[InternalRow] {
          private var buf: Array[InternalRow] = Array.empty
          private var ranks: Array[Int] = Array.empty
          private var i = 0
          private val joined = new JoinedRow
          private val rankRow =
            new org.apache.spark.sql.catalyst.expressions
              .GenericInternalRow(1)
          override def hasNext: Boolean = {
            while (i >= buf.length && entries.hasNext) {
              val st = entries.next()
              val h = st.heap
              val nTies =
                if (st.tieBuf == null) 0 else st.tieBuf.size()
              buf = new Array[InternalRow](h.size() + nTies)
              // poll() yields worst-first; fill back-to-front so the
              // heap's rows are ascending in the window order = rank
              // order; boundary ties (all equal to the kth value) go
              // after them.
              var j = buf.length - nTies - 1
              while (j >= 0) { buf(j) = h.poll(); j -= 1 }
              var t = 0
              while (t < nTies) {
                buf(buf.length - nTies + t) = st.tieBuf.get(t); t += 1
              }
              if (!isPartial) {
                ranks = new Array[Int](buf.length)
                var r = 0
                while (r < buf.length) {
                  // positional for row_number; value-aware for rank
                  // (equal order values inherit the earlier rank)
                  ranks(r) =
                    if (r > 0 && ties &&
                        ord.compare(buf(r - 1), buf(r)) == 0) ranks(r - 1)
                    else r + 1
                  r += 1
                }
              }
              i = 0
            }
            i < buf.length
          }
          override def next(): InternalRow = {
            val row = buf(i); i += 1
            numOutputRows += 1
            if (isPartial) row
            else {
              rankRow.setInt(0, ranks(i - 1))
              appendRank(joined(row, rankRow))
            }
          }
        }
      }

      // Streaming driver: trims input into the heaps, passing overflow
      // and boundary-tie rows straight through (partial only); flushes
      // heaps at end.
      new Iterator[InternalRow] {
        private var flushed: Iterator[InternalRow] = null
        private var pending: InternalRow = null
        override def hasNext: Boolean = {
          if (pending != null) return true
          while (flushed == null) {
            if (iter.hasNext) {
              val through = offer(iter.next())
              if (through != null) {
                pending = through; numOutputRows += 1; return true
              }
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
