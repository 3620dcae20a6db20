package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.{Q, Tables}

/** Skew-mitigation joins. AQE's skew-join split (on in every engine
  * session, see [[graft.Session]]) handles moderate runtime skew; this
  * is the deterministic fallback for the pathological case — one join
  * key so hot a single shuffle partition cannot hold it.
  *
  * `saltedJoin` spreads each key of the big (probe) side over
  * `numSalts` sub-partitions via a deterministic row-content salt, and
  * replicates the small (build) side once per salt value, joining on
  * (key, salt). Result set is IDENTICAL to the plain join — the q45
  * oracle is the plain SQL join — the only change is that no shuffle
  * partition ever holds more than 1/numSalts of a hot key.
  */
object Skew {

  /** Join `big` with `dim` on equal `key` columns, salting `big`'s rows
    * by a hash of `saltBy` (any expression varying within a key group;
    * row-content hashes work) and replicating `dim` `numSalts` times. */
  def saltedJoin(big: DataFrame, dim: DataFrame, key: String,
                 saltBy: Column, numSalts: Int): DataFrame = {
    val saltedBig = big.withColumn("__salt", pmod(hash(saltBy), lit(numSalts)))
    val repDim = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(numSalts - 1))))
    saltedBig.join(repDim, Seq(key, "__salt")).drop("__salt")
  }

  private def sumMoney(c: Column, scale: Int = 2): Column =
    sum(c.cast(s"decimal(18,$scale)")).cast("double")

  val queries: Seq[Q] = Seq(

    // ----- salted join, oracle = the equivalent PLAIN join -----------------
    // Revenue by order priority over lineitem ⋈ orders, with lineitem
    // salted 8 ways. Hash-matching the plain-join oracle proves the
    // salting transform is result-invariant.
    Q("q45_skew_salted_join",
      """SELECT o_orderpriority,
        |  CAST(count(*) AS BIGINT) AS n_items,
        |  CAST(sum(CAST(l_extendedprice * (1 - l_discount)
        |    AS DECIMAL(18,4))) AS DOUBLE) AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority""".stripMargin) { (s, d) =>
      val li = Tables.lineitem(s, d)
        .select(col("l_orderkey").as("okey"),
          col("l_linenumber"), col("l_extendedprice"), col("l_discount"))
      val ord = Tables.orders(s, d)
        .select(col("o_orderkey").as("okey"), col("o_orderpriority"))
      saltedJoin(li, ord, "okey",
          saltBy = struct(col("okey"), col("l_linenumber")), numSalts = 8)
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_items"),
          sumMoney(col("l_extendedprice") * (lit(1) - col("l_discount")), 4)
            .as("revenue"))
    }
  )
}
