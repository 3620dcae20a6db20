package graft

import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The `graft-seq` DataSourceV2 connector's contracts
  * ([[sources.SeqSource]]): planning-time partition pruning under
  * pushed `id` predicates, consumed-filter elision (no redundant
  * post-scan Filter), projection pruning down to the read schema, and
  * per-column generator correctness (including `payload`, which q178's
  * pruned query never reads).
  */
class DsvSourceSpec extends AnyFunSuite {

  lazy val spark = Spec.spark

  private val N = 10000L

  private def seq() =
    spark.read.format("graft-seq").option("end", N).load()

  private def scanOf(df: org.apache.spark.sql.DataFrame): BatchScanExec =
    df.queryExecution.executedPlan.collectFirst {
      case b: BatchScanExec => b
    }.getOrElse(fail("no BatchScanExec in plan"))

  test("short name resolves through the DataSourceRegister service file") {
    // format("graft-seq") (not the class name) — the registration path
    assert(seq().schema.fieldNames.toSeq ===
      Seq("id", "bucket", "v", "payload"))
  }

  test("generator columns match their formulas, payload included") {
    val rows = seq().filter(col("id") < 100).collect()
    assert(rows.length === 100)
    rows.foreach { r =>
      val id = r.getLong(0)
      assert(r.getInt(1) === (id % 16).toInt)
      assert(r.getLong(2) === (id * 37 + 11) % 1000)
      assert(r.getString(3) === "p" + (id % 7))
    }
  }

  test("pushed id range prunes planned partitions, not just rows") {
    val all = scanOf(seq().select("v")).inputRDD.getNumPartitions
    val pruned = scanOf(
      seq().filter(col("id") >= N / 2 && col("id") < N / 2 + 10)
        .select("v")).inputRDD.getNumPartitions
    assert(all > 1, "unfiltered scan should fan out")
    assert(pruned === 1, s"10-id range must plan one slice, got $pruned")
  }

  private def filterNodes(df: org.apache.spark.sql.DataFrame) =
    df.queryExecution.executedPlan.collect {
      case f: org.apache.spark.sql.execution.FilterExec => f
    }

  test("consumed filters do not reappear as a post-scan Filter") {
    val df = seq().filter(col("id") >= 10 && col("id") < 20).select("v")
    assert(filterNodes(df).isEmpty)
    assert(df.count() === 10)
  }

  test("residual (non-id) filters stay post-scan and stay correct") {
    val df = seq().filter(col("id") < 160 && col("bucket") === 3)
    assert(filterNodes(df).nonEmpty)
    assert(df.count() === 10) // ids 3, 19, 35, … 147
  }

  test("projection pushdown narrows the read schema") {
    val s = scanOf(seq().filter(col("id") >= 1).select("bucket", "v"))
    assert(s.scan.readSchema().fieldNames.toSet === Set("bucket", "v"))
  }

  test("empty pushed range plans zero partitions") {
    assert(seq().filter(col("id") >= N + 5).count() === 0)
  }
}
