package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The custom bounded top-k vertical (graft.plans): the optimizer rule
  * must rewrite exactly the declarative filter-over-row_number pattern
  * — and nothing else — and the heap exec must return the identical
  * rows and ranks the window plan returns.
  */
class TopKSpec extends AnyFunSuite {

  lazy val spark = Spec.spark
  import spark.implicits._

  /** 1000 rows, 7 groups, a total order inside each group. */
  private def base: DataFrame =
    spark.range(1000).select(
      (col("id") % 7).as("g"),
      ((col("id") * 37) % 251).as("v"),
      col("id"))

  private def topkQuery(k: Int): DataFrame = {
    val w = Window.partitionBy(col("g")).orderBy(col("v").desc, col("id"))
    base.withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
  }

  private def planOf(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  private def withConf[A](k: String, v: String)(body: => A): A = {
    val prev = spark.conf.getOption(k)
    spark.conf.set(k, v)
    try body
    finally prev match {
      case Some(p) => spark.conf.set(k, p)
      case None => spark.conf.unset(k)
    }
  }

  /** Ground truth computed driver-side from first principles. */
  private def expected(k: Int): Set[(Long, Long, Long, Int)] =
    base.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1).iterator.flatMap { case (_, rows) =>
        rows.sortBy(t => (-t._2, t._3)).take(k).zipWithIndex
          .map { case ((g, v, id), i) => (g, v, id, i + 1) }
      }.toSet

  private def collected(df: DataFrame): Set[(Long, Long, Long, Int)] =
    df.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3))).toSet

  test("rewrite fires: plan has TopKPerKey partial+final, no Window/Sort") {
    val df = topkQuery(5)
    val p = planOf(df)
    assert(p.contains("TopKPerKey (partial)"), p)
    assert(p.contains("TopKPerKey (final)"), p)
    assert(!p.contains("Window"), p)
    assert(!p.contains("Sort "), p)
  }

  test("heap exec returns exactly the window plan's rows and ranks") {
    assert(collected(topkQuery(5)) === expected(5))
    assert(collected(topkQuery(1)) === expected(1))
    // and agrees with the un-rewritten window plan, row for row
    val windowRows = withConf(plans.TopK.EnabledKey, "false") {
      val df = topkQuery(5)
      assert(planOf(df).contains("Window"), "opt-out must keep the window")
      collected(df)
    }
    assert(collected(topkQuery(5)) === windowRows)
  }

  test("exact-rank and extra conjuncts keep their filter semantics") {
    val w = Window.partitionBy(col("g")).orderBy(col("v").desc, col("id"))
    val second = base.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 2 && col("g") =!= 3)
    assert(planOf(second).contains("TopKPerKey"), planOf(second))
    val got = collected(second)
    assert(got === expected(2).filter(t => t._4 == 2 && t._1 != 3))
  }

  test("global top-k (no PARTITION BY) plans through AllTuples final") {
    val df = base
      .withColumn("rn", row_number().over(
        Window.orderBy(col("v").desc, col("id"))))
      .filter(col("rn") <= 4)
    assert(planOf(df).contains("TopKPerKey"), planOf(df))
    val got = collected(df)
    val exp = base.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(t => (-t._2, t._3)).take(4).zipWithIndex
      .map { case ((g, v, id), i) => (g, v, id, i + 1) }.toSet
    assert(got === exp)
  }

  test("rule declines: dense_rank, multi-expression windows, non-literal bounds") {
    val w = Window.partitionBy(col("g")).orderBy(col("v").desc, col("id"))
    // dense_rank's kth DISTINCT value bound is not k-heap-boundable
    val dense = base.withColumn("rn", dense_rank().over(w))
      .filter(col("rn") <= 3)
    assert(!planOf(dense).contains("TopKPerKey"), planOf(dense))
    // a second window expression rides the same Window node
    val multi = base.withColumn("rn", row_number().over(w))
      .withColumn("mx", max(col("v")).over(Window.partitionBy(col("g"))))
      .filter(col("rn") <= 3)
    assert(!planOf(multi).contains("TopKPerKey"), planOf(multi))
    // non-literal bound
    val nonLit = base.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= col("g"))
    assert(!planOf(nonLit).contains("TopKPerKey"), planOf(nonLit))
  }

  // ---- rank() (ties-aware) -------------------------------------------------

  /** Tie-heavy base: v = id % 13 gives ~11 rows per (g, v) value, so
    * every rank boundary lands mid-tie. The non-ordering `id` column
    * distinguishes tied rows in the result set. */
  private def tieBase: DataFrame =
    spark.range(1000).select(
      (col("id") % 7).as("g"),
      (col("id") % 13).as("v"),
      col("id"))

  private def rankQuery(k: Int): DataFrame = {
    val w = Window.partitionBy(col("g")).orderBy(col("v").desc)
    tieBase.withColumn("rn", rank().over(w)).filter(col("rn") <= k)
  }

  /** rank ground truth from first principles: keep every row whose
    * strict-predecessor count is < k; rank = that count + 1. */
  private def expectedRankOf(df: DataFrame, k: Int)
      : Set[(Long, Long, Long, Int)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1).iterator.flatMap { case (_, rows) =>
        rows.flatMap { case (g, v, id) =>
          val before = rows.count(_._2 > v) // DESC order: strictly better
          if (before < k) Some((g, v, id, before + 1)) else None
        }
      }.toSet

  private def expectedRank(k: Int): Set[(Long, Long, Long, Int)] =
    expectedRankOf(tieBase, k)

  test("rank(): rewrite fires, keeps ALL boundary ties, exact rank values") {
    val df = rankQuery(3)
    val p = planOf(df)
    assert(p.contains("TopKPerKey (partial)"), p)
    assert(p.contains("TopKPerKey (final)"), p)
    assert(!p.contains("Window"), p)
    assert(!p.contains("Sort "), p)
    assert(collected(df) === expectedRank(3))
    assert(collected(rankQuery(1)) === expectedRank(1))
    // row-for-row parity with the un-rewritten window plan
    val windowRows = withConf(plans.TopK.EnabledKey, "false") {
      val w = rankQuery(3)
      assert(planOf(w).contains("Window"), "opt-out must keep the window")
      collected(w)
    }
    assert(collected(rankQuery(3)) === windowRows)
    // ties genuinely exceed k rows per group (the semantics under test)
    val perGroup = rankQuery(3).groupBy("g").count().collect()
      .map(_.getLong(1))
    assert(perGroup.forall(_ > 3), perGroup.toSeq)
  }

  test("rank(): partial-state cap and tie passthrough stay exact") {
    val prop = "graft.topk.maxPartialKeys"
    sys.props(prop) = "2"
    try assert(collected(rankQuery(2)) === expectedRank(2))
    finally sys.props.remove(prop)
  }

  test("rank(): coarse-order-key pass-through regime is metric-observable") {
    // ORDER BY a 3-value key: most rows tie the heap boundary, the
    // partial degenerates to near-zero trimming (the documented
    // data-dependent regime maxK cannot bound) — the partial exec's
    // numTiePassThrough metric must expose it, and results stay exact.
    // AQE off for this test only: the partial exec lands inside a
    // ShuffleQueryStageExec LEAF under AQE, unreachable from a plan
    // collect — the metric itself is plan-mode-independent.
    withConf("spark.sql.adaptive.enabled", "false") {
      val coarse = spark.range(900).select((col("id") % 2).as("g"),
        (col("id") % 3).as("v"), col("id"))
      val w = Window.partitionBy(col("g")).orderBy(col("v").desc)
      val df = coarse.withColumn("rn", rank().over(w)).filter(col("rn") <= 1)
      assert(planOf(df).contains("TopKPerKey (partial)"), planOf(df))
      // rank ≤ 1 with v ∈ {0,1,2}: every row with v = 2 ranks 1 (300
      // rows). collect() (not count()) so the metric lands on THIS
      // DataFrame's QueryExecution — count() builds a separate one.
      assert(df.collect().length === 300)
      val partials = df.queryExecution.executedPlan.collect {
        case e: plans.TopKPerKeyExec if e.partial => e
      }
      assert(partials.nonEmpty, "partial exec must be in the plan")
      val passed = partials.map(_.metrics("numTiePassThrough").value).sum
      assert(passed > 0,
        s"coarse order key must register boundary-tie pass-through, got $passed")
    }
  }

  test("rank(): exact-rank conjunct keeps its filter semantics") {
    // Mixed base: unique high values on top (every 11th id), tie
    // blocks below — so rank = 2 is NONEMPTY and boundary ties still
    // occur further down.
    val mixed = spark.range(1000).select(
      (col("id") % 7).as("g"),
      when(col("id") % 11 === 0, lit(1000) + col("id"))
        .otherwise(col("id") % 13).as("v"),
      col("id"))
    val w = Window.partitionBy(col("g")).orderBy(col("v").desc)
    val second = mixed.withColumn("rn", rank().over(w))
      .filter(col("rn") === 2 && col("g") =!= 3)
    assert(planOf(second).contains("TopKPerKey"), planOf(second))
    val exp = expectedRankOf(mixed, 2).filter(t => t._4 == 2 && t._1 != 3)
    assert(exp.nonEmpty, "fixture must exercise a nonempty rank-2 slice")
    assert(collected(second) === exp)
  }

  test("maxK threshold keeps the window plan for huge k") {
    withConf(plans.TopK.MaxKKey, "3") {
      val df = topkQuery(5)
      assert(!planOf(df).contains("TopKPerKey"), planOf(df))
      assert(planOf(df).contains("Window"))
    }
    // and the threshold is a plan choice, not a semantics change
    assert(collected(withConf(plans.TopK.MaxKKey, "3")(topkQuery(5)))
      === expected(5))
  }

  test("partial-state cap falls back to passthrough, not wrong answers") {
    // A 2-key cap forces 5 of the 7 groups to stream through the
    // partial exec un-trimmed; the final exec must still produce exact
    // ranks for every group — the cap bounds MEMORY, never results.
    val prop = "graft.topk.maxPartialKeys"
    sys.props(prop) = "2"
    try {
      val df = topkQuery(3)
      assert(planOf(df).contains("TopKPerKey (partial)"))
      assert(collected(df) === expected(3))
    } finally sys.props.remove(prop)
    // sanity: the shipped default admits ≥ 2^20 keys
    assert(plans.TopKPerKeyExec.MaxPartialKeys >= (1 << 20))
  }
}
