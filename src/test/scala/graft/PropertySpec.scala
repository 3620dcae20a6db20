package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.MapReduce

/** Property-based layer (SURVEY §5 carry-over): invariants that must
  * hold for ALL inputs, not just the fixture corpora. Raw ScalaCheck
  * (no scalatest bridge in the offline cache); each test asserts the
  * whole property run passed.
  */
class PropertySpec extends AnyFunSuite {

  private def check(prop: Prop, n: Int = 50): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(n), prop)
    assert(res.passed, res.status.toString)
  }

  test("Md5Partitioner always lands in [0, R) and is deterministic") {
    check(Prop.forAll { (key: String, r0: Int) =>
      val r = 1 + math.abs(r0 % 64)
      val p = new MapReduce.Md5Partitioner(r)
      val x = p.getPartition(key)
      x >= 0 && x < r && x == p.getPartition(key)
    })
  }

  test("Md5Partitioner(1) sends every key to partition 0 (degenerate R)") {
    check(Prop.forAll { (key: String) =>
      new MapReduce.Md5Partitioner(1).getPartition(key) == 0
    })
  }

  test("wcMapPy tokenization is exactly whitespace-run split, empties dropped") {
    import Spec.spark.implicits._
    val lineGen = Gen.listOfN(6, Gen.oneOf("a b", "x\ty", " lead", "trail ",
      "", "A  B", "mIxEd Case", "one"))
    check(Prop.forAll(lineGen) { lines =>
      val got = MapReduce.wcMapPy(lines.toDS())
        .collect().map(_.getString(0)).sorted.toSeq
      val expected = lines
        .flatMap(_.split("\\s+", -1).filter(_.nonEmpty)).sorted
      got == expected
    }, n = 10)
  }

  test("salted join equals the plain join for arbitrary key skew") {
    import Spec.spark.implicits._
    import org.apache.spark.sql.functions._
    val gen = Gen.listOfN(40,
      Gen.zip(Gen.choose(0, 4), Gen.choose(0, 100)))
    check(Prop.forAll(gen) { rows =>
      val big = rows.toDF("k", "v")
      val dim = Seq((0, "zero"), (1, "one"), (2, "two"), (3, "three"))
        .toDF("k", "name")
      val salted = graft.operators.Skew
        .saltedJoin(big, dim, "k", saltBy = struct(col("k"), col("v")),
          numSalts = 4)
        .select("k", "v", "name").collect()
        .map(r => (r.getInt(0), r.getInt(1), r.getString(2))).sorted.toSeq
      val plain = big.join(dim, Seq("k"))
        .select("k", "v", "name").collect()
        .map(r => (r.getInt(0), r.getInt(1), r.getString(2))).sorted.toSeq
      salted == plain
    }, n = 3)
  }
}
