package graft.tools

import java.util.concurrent.Executors

import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration.Duration

import graft.{Session, SparkEntry}

/** Concurrent-throughput drill (SURVEY §19.4's measurement half): runs
  * a mixed operator panel sequentially for a WARM baseline, then the
  * same panel ×2 on an N-thread pool against the one shared session,
  * and prints both walls plus the speedup. Unlike ConcurrencySpec
  * (sf0.001, correctness under contention), this is the number for the
  * bench fixture: how much of the sequential wall a concurrent serving
  * layer recovers when queries share the session's caches, artifacts,
  * and the local[*] scheduler.
  *
  * Usage: `runMain graft.tools.ConcurrencyDrill [sfDir] [threads]`
  * (defaults /root/testdata/sf0.1 and 8). Correctness is asserted the
  * same way the spec does — row-multiset equality to the sequential
  * baseline — so a throughput number can never come from a wrong
  * answer.
  */
object ConcurrencyDrill {
  private val panel = Seq(
    "q01_pricing_summary", "q03_join3_topk", "q07_window_topk",
    "q14_sort_limit", "q24_token_stats", "q30_minhash_lsh",
    "q32_ngram_jaccard", "q44_ann_ivf", "q57_dup_clusters",
    "q58_spark_sql", "q63_tfidf", "q97_topk_per_group",
    "q134_setsim_join", "q142_equidepth_histogram",
    "q151_zonemap_prune", "q184_pq_ann")

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val threads = if (args.length > 1) args(1).toInt else 8
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Session.build(s"local[$cpus]", cpus.toInt, "graft-conc")
    spark.sparkContext.setLogLevel("WARN")
    // FAIR scheduling: FIFO (the default) would serialize the panel's
    // stages anyway and measure queueing, not concurrency
    spark.sparkContext.setLocalProperty("spark.scheduler.mode", "FAIR")
    def rows(name: String): Seq[String] =
      SparkEntry.queries(name)(spark, sfDir).collect()
        .map(_.toString).sorted.toSeq
    // warm pass: JVM/codegen/artifact-chain cost out of both timings
    panel.foreach(rows)
    val t0 = System.nanoTime()
    val baseline = panel.map(q => q -> rows(q)).toMap
    val seqSec = (System.nanoTime() - t0) / 1e9
    val pool = Executors.newFixedThreadPool(threads)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    val t1 = System.nanoTime()
    val futs = (panel ++ panel.reverse).map(q => Future(q -> rows(q)))
    val got = Await.result(Future.sequence(futs), Duration.Inf)
    val conSec = (System.nanoTime() - t1) / 1e9
    pool.shutdown()
    val bad = got.filter { case (q, r) => r != baseline(q) }
    require(bad.isEmpty, s"diverged under concurrency: ${bad.map(_._1)}")
    println(f"[conc-drill] sf=$sfDir threads=$threads warm-seq " +
      f"${panel.size} queries ${seqSec}%.2f s; concurrent " +
      f"${panel.size * 2} queries ${conSec}%.2f s " +
      f"(per-query throughput x${2 * seqSec / conSec}%.2f, all results equal)")
    spark.stop()
  }
}
