package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

import graft.{Q, Tables}

/** Custom typed aggregation surface (`Aggregator[IN, BUF, OUT]` +
  * `functions.udaf`) — the idiomatic replacement for the reference's
  * sorted-stream reducer executables (SURVEY §2.C UDF/UDAF row) when
  * the logic lives in the JVM instead of a subprocess.
  */
object Aggregators {

  /** Quantity-weighted average price. The buffer is integer cents ×
    * integer quantity (never a running double), so partial aggregation
    * is EXACT and merge-order independent — the property that makes a
    * custom UDAF oracle-checkable across engines and partitionings. */
  object WeightedAvgPrice
      extends Aggregator[(Double, Double), (Long, Long), Double] {
    def zero: (Long, Long) = (0L, 0L)
    // math.round (not toLong truncation) for the quantity so the
    // double→long conversion matches the oracle's CAST(... AS BIGINT)
    // rounding on non-integral quantities, not only TPC-H integers
    def reduce(b: (Long, Long), a: (Double, Double)): (Long, Long) =
      (b._1 + math.round(a._1 * 100) * math.round(a._2), b._2 + math.round(a._2))
    def merge(x: (Long, Long), y: (Long, Long)): (Long, Long) =
      (x._1 + y._1, x._2 + y._2)
    def finish(b: (Long, Long)): Double = (b._1 / 100.0) / b._2
    def bufferEncoder: Encoder[(Long, Long)] =
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong)
    def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  val queries: Seq[Q] = Seq(

    Q("q59_custom_udaf",
      """SELECT l_returnflag,
        |  (CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
        |     * CAST(l_quantity AS BIGINT)) AS DOUBLE) / 100.0)
        |    / CAST(sum(CAST(l_quantity AS BIGINT)) AS DOUBLE) AS wavg_price,
        |  CAST(count(*) AS BIGINT) AS n
        |FROM lineitem
        |GROUP BY l_returnflag""".stripMargin) { (s, d) =>
      val wavg = udaf(WeightedAvgPrice)
      Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(
          wavg(col("l_extendedprice"), col("l_quantity")).as("wavg_price"),
          count(lit(1)).as("n"))
    }
  )
}
