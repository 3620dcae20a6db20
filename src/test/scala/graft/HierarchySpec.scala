package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Relational

/** The recursive-hierarchy operator (q132): path doubling must resolve
  * the same (root, depth) as the plain arithmetic chase, in log-depth
  * rounds, and the rollup must conserve the row count.
  */
class HierarchySpec extends AnyFunSuite {
  private lazy val spark = Spec.spark

  test("path doubling matches the arithmetic root/depth chase") {
    val parts = Tables.part(spark, Spec.sfDir)
      .select(col("p_partkey").cast("long").as("part"))
    val edges = parts.filter(col("part") >= 10)
      .select(col("part").as("node"),
        floor(col("part") / 10).cast("long").as("parent"))
    val got = Relational.terminalAncestors(edges, maxDepth = 8)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getInt(2))))
      .toMap
    val keys = parts.collect().map(_.getLong(0))
    for (p <- keys if p >= 10) {
      var (node, depth) = (p, 0)
      while (node >= 10) { node /= 10; depth += 1 }
      assert(got(p) == ((node, depth)),
        s"part $p: got ${got(p)}, expected ($node, $depth)")
    }
    // roots (single-digit keys) must NOT appear: they have no edge row
    assert(keys.filter(_ < 10).forall(p => !got.contains(p)))
  }

  test("q132 rollup conserves parts and emits only single-digit roots") {
    val df = SparkEntry.queries("q132_hierarchy_rollup")(spark, Spec.sfDir)
    val rows = df.collect()
    val nParts = Tables.part(spark, Spec.sfDir).count()
    assert(rows.map(_.getLong(2)).sum == nParts)
    // fixture keys are 0-based, so key 0 is itself a (depth-0) root
    assert(rows.forall(r => r.getLong(0) >= 0 && r.getLong(0) <= 9))
    assert(rows.forall(_.getInt(1) >= 0))
  }

  test("a depth-1 forest needs zero doubling rounds") {
    // maxDepth = 1 → the edge list IS the answer; terminalAncestors
    // must not self-join at all (its plan is the projected edges)
    import spark.implicits._
    val edges = Seq((10L, 1L), (11L, 1L), (25L, 2L))
      .toDF("node", "parent")
    val out = Relational.terminalAncestors(edges, maxDepth = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(out.toSet == Set((10L, 1L, 1), (11L, 1L, 1), (25L, 2L, 1)))
  }
}
