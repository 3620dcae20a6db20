package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext,
  ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Norm-ordered, bound-pruned EXACT nearest-centroid assignment for the
  * semantic-dedup family (q104/q115).
  *
  * The replaced plan materialized all n×K candidate rows
  * (`crossJoin(broadcast(cents))` → `min_by` hash aggregate) and paid
  * Θ(n×K) 64-dim dot products plus an n×K-row aggregate. This is the
  * brief's next tier — a custom Catalyst `Expression` — computing the
  * same arg-min per ROW, with most centroid distances skipped by a
  * norm bound that keeps the result EXACT:
  *
  *   d²(x,c) = ‖x‖² − 2·x·c + ‖c‖² ≥ (‖x‖ − ‖c‖)²   (Cauchy–Schwarz)
  *
  * Centroids are pre-sorted by norm; the search expands outward from
  * the query's norm position (two pointers, always taking the smaller
  * norm gap next), so gap² is non-decreasing over the visit order and
  * the FIRST gap² exceeding the incumbent distance prunes every
  * unvisited centroid at once. This is the classic norm/triangle-
  * inequality pruning of the exact k-means literature (Elkan 2003,
  * "Using the Triangle Inequality to Accelerate k-Means"; Hamerly
  * 2010), specialized to a single assignment pass over norm-sorted
  * centers. All inputs are integral doubles (the quantized-embedding
  * contract), so true distances are exact integers; the stop rule
  * `gap² > best + 1.0` absorbs the sqrt rounding error with integer
  * headroom and can therefore never prune the winner or a tie.
  *
  * Scale shape: the assignment becomes ONE narrow projection pass over
  * the corpus — no n×K rows, no aggregate, no shuffle. The centroid
  * table (K = n/256 rows of 64 doubles) rides to executors as a plan
  * reference object, the same bytes the replaced plan broadcast; the
  * operator's documented boundary (K ∝ n ⇒ centroid set eventually
  * outgrows a single node) is unchanged, with the flat ANN family as
  * the at-scale alternative.
  */
final class CentroidIndex private (
    val cids: Array[Long],
    val cvs: Array[Array[Double]],
    val ccs: Array[Double],
    val norms: Array[Double]) extends Serializable {

  def k: Int = cids.length

  /** Number of distance evaluations in the last [[search]] on this
    * thread — drill/spec instrumentation only. Lazy: a plain
    * @transient val is null after the plan deserializes on executors. */
  @transient private lazy val lastProbes = new ThreadLocal[Int] {
    override def initialValue(): Int = 0
  }
  def probesOfLastSearch: Int = lastProbes.get()

  /** arg-min over centroids of (d², cid) for the quantized vector `sv`
    * with self-dot `xx`. Distances accumulate as Σ(xᵢ−cᵢ)², which for
    * the integral-double inputs of the quantized-embedding contract is
    * EXACTLY equal to the `xx − 2·x·c + cc` form of the plan this
    * replaces (diffs ≤ 6000, squares ≤ 3.6·10⁷, 64-term sums ≪ 2^53 —
    * every intermediate is an exactly-represented integer), so results
    * are bit-equal at every rung. The diff form adds a second EXACT
    * prune the dot form cannot express — partial-distance early
    * abandonment (checked every 16 dims): once the partial sum exceeds
    * the incumbent, the final d² can only be larger, so the centroid
    * can neither win nor tie. On shell-concentrated random embeddings
    * (norms nearly equal — the regime where the norm bound alone
    * degenerates) this is the prune that actually carries the load. */
  def search(sv: ArrayData, xx: Double): Long = {
    val n = k
    val nx = math.sqrt(xx)
    // insertion point of nx in the sorted norms
    var p = java.util.Arrays.binarySearch(norms, nx)
    if (p < 0) p = -p - 1
    var i = p - 1 // expands left (norms below nx)
    var j = p // expands right (norms at/above nx)
    var best = Double.PositiveInfinity
    var bestCid = Long.MaxValue
    var probes = 0
    while (i >= 0 || j < n) {
      val gapL = if (i >= 0) nx - norms(i) else Double.PositiveInfinity
      val gapR = if (j < n) norms(j) - nx else Double.PositiveInfinity
      val takeLeft = gapL <= gapR
      val gap = if (takeLeft) gapL else gapR
      // every unvisited centroid (both sides) has a norm gap ≥ this
      // one, hence d² ≥ gap² > best + 1 > any winning or tying value
      if (gap * gap > best + 1.0) { lastProbes.set(probes); return bestCid }
      val c = if (takeLeft) i else j
      if (takeLeft) i -= 1 else j += 1
      val cv = cvs(c)
      var acc = 0.0
      var t = 0
      val len = math.min(sv.numElements(), cv.length)
      var alive = true
      while (alive && t < len) {
        val lim = math.min(t + 16, len)
        while (t < lim) {
          val diff = sv.getDouble(t) - cv(t)
          acc += diff * diff
          t += 1
        }
        // partial > best ⇒ final d² ≥ partial > best: no win, no tie
        if (acc > best) alive = false
      }
      probes += 1
      if (alive && (acc < best || (acc == best && cids(c) < bestCid))) {
        best = acc
        bestCid = cids(c)
      }
    }
    lastProbes.set(probes)
    bestCid
  }
}

object CentroidIndex {
  /** Build from (cid, centroid vector, self-dot) rows; order-insensitive
    * (sorted internally by (norm, cid)). */
  def build(cents: Seq[(Long, Array[Double], Double)]): CentroidIndex = {
    require(cents.nonEmpty, "nearest_centroid needs at least one centroid")
    val sorted = cents.sortBy { case (cid, _, cc) => (math.sqrt(cc), cid) }
    new CentroidIndex(
      sorted.map(_._1).toArray,
      sorted.map(_._2).toArray,
      sorted.map(_._3).toArray,
      sorted.map(c => math.sqrt(c._3)).toArray)
  }
}

/** `nearest_centroid(sv, xx)` over a plan-embedded [[CentroidIndex]]:
  * LongType cid of the exact arg-min centroid. The index object is not
  * an Expression child — it ships to executors with the serialized
  * plan and enters generated code via `addReferenceObj`, keeping the
  * projection inside whole-stage codegen (the search loop itself runs
  * as compiled Scala behind one virtual call per row). */
case class NearestCentroid(left: Expression, right: Expression,
    index: CentroidIndex) extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "nearest_centroid"

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType,
      right.dataType) match {
    case (ArrayType(DoubleType, _), DoubleType) =>
      TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs (array<double>, double), got " +
        s"${l.catalogString} / ${r.catalogString}")
  }

  override def nullable: Boolean = left.nullable || right.nullable

  override protected def nullSafeEval(sv: Any, xx: Any): Any =
    index.search(sv.asInstanceOf[ArrayData], xx.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val idx = ctx.addReferenceObj("centroidIndex", index,
      classOf[CentroidIndex].getName)
    nullSafeCodeGen(ctx, ev, (sv, xx) =>
      s"${ev.value} = $idx.search($sv, $xx);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): NearestCentroid =
    copy(left = newLeft, right = newRight)
}

object CentroidOps {
  /** Column-level entry point; the index is a driver-built object, so
    * this bypasses the function registry (registry builders only see
    * child Columns). */
  def nearestCentroid(index: CentroidIndex, sv: Column,
      xx: Column): Column =
    ColumnBridge.column(NearestCentroid(
      ColumnBridge.expression(sv), ColumnBridge.expression(xx), index))
}
