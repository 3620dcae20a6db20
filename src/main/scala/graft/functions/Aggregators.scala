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

  /** Bounded-state top-k per group: the buffer holds at most K
    * (sort_key, id) entries, inserted and trimmed on every reduce/merge,
    * so partial aggregation ships K rows per group per partition instead
    * of the window-rank alternative — which shuffles and SORTS every
    * group's full contents just to keep K. At 100 TB with millions of
    * rows per group, bounded state is the difference between a top-k
    * that runs and one that spills. Ordering (key desc, id asc) is a
    * total order, so the result is partition- and merge-order
    * independent. */
  final class TopK(k: Int)
      extends Aggregator[(Long, Long), Seq[(Long, Long)], Seq[(Long, Long)]] {
    // an Ordering, not arithmetic negation: -Long.MinValue overflows to
    // itself (the SMALLEST value), so sortBy(-key) would rank a
    // MinValue key FIRST — as if it were the largest key
    private val ord: Ordering[(Long, Long)] =
      Ordering.by[(Long, Long), Long](_._1).reverse.orElseBy(_._2)
    private def trim(s: Seq[(Long, Long)]): Seq[(Long, Long)] =
      s.sorted(ord).take(k)
    def zero: Seq[(Long, Long)] = Seq.empty
    def reduce(b: Seq[(Long, Long)], a: (Long, Long)): Seq[(Long, Long)] =
      trim(b :+ a)
    def merge(x: Seq[(Long, Long)], y: Seq[(Long, Long)]): Seq[(Long, Long)] =
      trim(x ++ y)
    def finish(b: Seq[(Long, Long)]): Seq[(Long, Long)] = b
    def bufferEncoder: Encoder[Seq[(Long, Long)]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
    def outputEncoder: Encoder[Seq[(Long, Long)]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
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
    },

    // ----- bounded-state top-k per group (no window sort) -------------------
    // Top-3 longest docs per language via [[TopK]]: the window-rank
    // equivalent (the oracle's formulation) shuffles and sorts every
    // group in full; the Aggregator ships at most K entries per group
    // per partition. Same rows, radically different shuffle volume at
    // scale. The aggregated array is exploded back to flat rows (rank =
    // position in the total order) before the sink.
    Q("q97_topk_per_group",
      """SELECT lang, doc_id, n_chars, CAST(rk AS INTEGER) AS rk
        |FROM (
        |  SELECT lang, doc_id, n_chars,
        |    row_number() OVER (PARTITION BY lang
        |      ORDER BY n_chars DESC, doc_id) AS rk
        |  FROM documents) t
        |WHERE rk <= 3""".stripMargin) { (s, d) =>
      val top3 = udaf(new TopK(3))
      Tables.documents(s, d)
        .groupBy(col("lang"))
        .agg(top3(col("n_chars"), col("doc_id")).as("top"))
        .select(col("lang"), posexplode(col("top")))
        .select(col("lang"), col("col._2").as("doc_id"),
          col("col._1").as("n_chars"),
          (col("pos") + 1).cast("int").as("rk"))
    }
  )
}
