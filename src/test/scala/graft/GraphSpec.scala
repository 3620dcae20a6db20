package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The degree-oriented triangle count (q133): the oriented enumeration
  * must agree with the naive a<b<c enumeration (a structurally
  * different plan), and the orientation must deliver its O(√m)
  * out-degree bound — the property that bounds the wedge blowup on a
  * power-law graph.
  */
class GraphSpec extends AnyFunSuite {
  private lazy val spark = Spec.spark

  private lazy val edges = {
    val li = Tables.lineitem(spark, Spec.sfDir)
      .filter(col("l_quantity") >= 25)
      .select(col("l_orderkey").as("o"), col("l_partkey").cast("long").as("p"))
      .distinct()
    li.select(col("o"), col("p").as("u"))
      .join(li.select(col("o").as("o2"), col("p").as("v")),
        col("o") === col("o2") && col("u") < col("v"))
      .select(col("u"), col("v")).distinct()
      .cache()
  }

  test("oriented enumeration matches the naive a<b<c enumeration") {
    val e = edges
    // naive: mirrors the oracle SQL's two self-joins of the u<v list
    val e2 = e.select(col("u").as("b"), col("v").as("c"))
    val e3 = e.select(col("u").as("a2"), col("v").as("c2"))
    val naive = e.join(e2, col("v") === col("b"))
      .join(e3, col("u") === col("a2") && col("c") === col("c2"))
      .select(col("u").as("a"), col("b"), col("c"))
    val naiveByPart = naive
      .select(explode(array(col("a"), col("b"), col("c"))).as("part"))
      .groupBy(col("part")).agg(count(lit(1)).as("n_tri"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val got = SparkEntry.queries("q133_triangle_parts")(spark, Spec.sfDir)
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    assert(got.nonEmpty, "fixture co-purchase graph has no triangles")
    got.foreach { case (p, n) =>
      assert(naiveByPart.get(p).contains(n), s"part $p: oriented $n")
    }
  }

  test("degree orientation bounds every out-degree by sqrt(2m)") {
    val e = edges
    val m = e.count()
    val deg = e.select(col("u").as("n"))
      .unionAll(e.select(col("v").as("n")))
      .groupBy(col("n")).agg(count(lit(1)).as("dg"))
    val oriented = e
      .join(deg.select(col("n").as("u2"), col("dg").as("du")),
        col("u") === col("u2"))
      .join(deg.select(col("n").as("v2"), col("dg").as("dv")),
        col("v") === col("v2"))
      .select(when(col("du") < col("dv") ||
          (col("du") === col("dv") && col("u") < col("v")), col("u"))
        .otherwise(col("v")).as("s"))
    val maxOut = oriented.groupBy(col("s")).agg(count(lit(1)).as("od"))
      .agg(max(col("od"))).head().getLong(0)
    // out-neighbors of v all have degree >= deg(v) >= outdeg(v), so
    // outdeg(v)^2 <= sum of degrees = 2m
    assert(maxOut <= math.ceil(math.sqrt(2.0 * m)).toLong,
      s"max out-degree $maxOut exceeds sqrt(2m) for m=$m")
  }

  test("bounded BFS labels equal a driver-side queue BFS exactly") {
    // q147's K-round self-loop relaxation must produce the SAME map as
    // the textbook frontier BFS run in plain Scala on the collected
    // edge list — every reached node, no extras, min hop each.
    val adj = operators.Dedup.nearDupEdges(spark, Spec.sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).toSet }
    val seeds = Tables.documents(spark, Spec.sfDir)
      .select(col("doc_id")).collect().map(_.getLong(0)).filter(_ % 97 == 0)
    assert(seeds.nonEmpty)
    var dist = seeds.map(_ -> 0L).toMap
    var frontier = seeds.toSet
    for (h <- 1 to 3) {
      val next = frontier.flatMap(n => adj.getOrElse(n, Set.empty[Long]))
        .filterNot(dist.contains)
      dist ++= next.map(_ -> h.toLong)
      frontier = next
    }
    val got = SparkEntry.queries("q147_contamination_radius")(spark, Spec.sfDir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == dist,
      s"BFS mismatch: missing=${(dist.keySet -- got.keySet).take(5)} " +
        s"extra=${(got.keySet -- dist.keySet).take(5)}")
  }

  test("k-core peel equals a driver-side peeling of the same graph") {
    // three rounds of plain-Scala peeling on the collected edge list
    // must reproduce q156's surviving nodes and residual degrees
    var e = operators.Dedup.nearDupEdges(spark, Spec.sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    for (_ <- 1 to 3) {
      val deg = e.groupBy(_._1).map { case (n, es) => n -> es.size }
      val kept = deg.filter(_._2 >= 2).keySet
      e = e.filter(p => kept(p._1) && kept(p._2))
    }
    val expected = e.groupBy(_._1)
      .map { case (n, es) => n -> es.size.toLong }
    val got = SparkEntry.queries("q156_kcore_peel")(spark, Spec.sfDir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expected,
      s"core mismatch: missing=${(expected.keySet -- got.keySet).take(5)} " +
        s"extra=${(got.keySet -- expected.keySet).take(5)}")
  }
}
