package graft

import org.apache.spark.sql.Observation
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pipeline observability without extra passes: `observe()` attaches
  * named aggregates to a plan node and reports them as a side effect of
  * whatever action runs anyway. At 100 TB the alternative — a separate
  * count()/agg() per audit metric — doubles the scan; curation gates
  * should publish their before/after counts from the SAME job.
  */
class ObservabilitySpec extends AnyFunSuite {

  lazy val spark = Spec.spark

  test("a curation gate reports in/out counts from one pass") {
    val obs = Observation("gate")
    val docs = Tables.documents(spark, Spec.sfDir)
    val kept = docs
      .observe(obs, count(lit(1)).as("n_in"),
        sum(col("n_chars")).as("chars_in"))
      .filter(col("n_chars") >= 100)
    val nOut = kept.count() // the ONLY action — metrics ride along
    val m = obs.get
    val nIn = m("n_in").asInstanceOf[Long]
    assert(nIn == docs.count())
    assert(nOut <= nIn)
    assert(m("chars_in").asInstanceOf[Long] > 0)
    // the gate actually filtered something at this fixture scale, so
    // the before/after pair is informative, not degenerate
    assert(nOut < nIn)
  }
}
