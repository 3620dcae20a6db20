package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The round-7 sketch/layout operators: the two sketch-prefiltered
  * queries must be EXACT (sketches affect cost, never results), the
  * bloom probe must be the native codegen'd expression (not a UDF),
  * and the Z-order cells must be the bounded rectangles the data-
  * skipping story depends on.
  */
class SketchLayoutSpec extends AnyFunSuite {
  private lazy val spark = Spec.spark

  test("q129 bloom prefilter changes cost, not results") {
    // the sketch-free reference plan: same eval set, same threshold,
    // no bloom stage — results must be identical, because the bloom's
    // false positives are removed by the exact join confirm
    val got = SparkEntry.queries("q129_bloom_decontamination")(spark, Spec.sfDir)
    val docs = Tables.documents(spark, Spec.sfDir)
    val t = col("toks")
    val idx = when(size(t) >= 3, sequence(lit(0), size(t) - 3))
      .otherwise(array().cast("array<int>"))
    val shingles = docs
      .select(col("doc_id"), split(lower(col("text")), " ", -1).as("toks"))
      .select(col("doc_id"), explode(array_distinct(transform(idx, i =>
        concat_ws(" ", get(t, i), get(t, i + 1), get(t, i + 2)))))
        .as("shingle"))
    val bench = shingles.filter(col("doc_id") % 89 === 0)
      .select(col("shingle")).distinct()
    val expected = shingles.filter(col("doc_id") % 89 =!= 0)
      .join(bench, "shingle")
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_overlap"))
      .filter(col("n_overlap") >= 3)
    assert(got.count() > 0)
    assert(got.exceptAll(expected).isEmpty && expected.exceptAll(got).isEmpty)
  }

  test("q129's bloom probe is the native expression inside codegen") {
    val plan = SparkEntry.queries("q129_bloom_decontamination")(
      spark, Spec.sfDir).queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"),
      s"expected the native BloomFilterMightContain probe:\n$plan")
    assert(!plan.toLowerCase.contains("batchevalpython") &&
      !plan.contains("UDF"), s"bloom probe fell back to a UDF:\n$plan")
  }

  test("q130 sketch candidates are a superset, exact confirm seals it") {
    // the KMG guarantee the plan relies on: the direct full-vocabulary
    // aggregation (what the oracle computes) equals the sketch-pruned
    // result on any partitioning
    val got = SparkEntry.queries("q130_frequent_tokens")(spark, Spec.sfDir)
    val toks = Tables.documents(spark, Spec.sfDir)
      .select(explode(split(lower(col("text")), " ", -1)).as("token"))
    val thr = toks.count() / 1000
    val expected = toks.groupBy(col("token")).agg(count(lit(1)).as("n"))
      .filter(col("n") > thr)
    assert(got.count() > 0)
    val g = got.select(col("token"), col("n"))
    assert(g.exceptAll(expected).isEmpty && expected.exceptAll(g).isEmpty)
  }

  test("q131 zcells are 16x16 rectangles and conserve the row count") {
    val cells = SparkEntry.queries("q131_zorder_layout")(spark, Spec.sfDir)
      .persist()
    val bad = cells.filter(
      col("x_hi") - col("x_lo") > 15 || col("y_hi") - col("y_lo") > 15 ||
        col("zcell") < 0 || col("zcell") > 255).count()
    assert(bad == 0, "a zcell exceeded its 16x16 bounding rectangle")
    val total = cells.agg(sum(col("n"))).head().getLong(0)
    assert(total == Tables.lineitem(spark, Spec.sfDir).count())
    cells.unpersist(blocking = false)
  }
}
