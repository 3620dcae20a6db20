package graft.tools

import java.nio.file.{Files, Paths}
import java.util.concurrent.Executors

import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration.Duration

import graft.{Bench, Session, SparkEntry}

/** Concurrent-throughput drill (SURVEY §19.4's measurement half): runs
  * a mixed operator panel sequentially for a WARM baseline, then the
  * same panel ×2 on an N-thread pool against the one shared session,
  * and emits both walls plus the speedup — to stdout AND as a JSON
  * artifact (`CONC_OUT.json` / `SPARK_GRAFT_CONC_OUT`), so rounds can
  * compare serving throughput the way benchnorm compares sequential
  * walls instead of re-reading SURVEY prose.
  *
  * Scheduling: the session is built with `spark.scheduler.mode=FAIR`
  * IN THE SPARKCONF — the mode is read once at TaskScheduler
  * initialization, so a post-hoc setLocalProperty cannot change it
  * (the round-13 drill's bug: it measured FIFO queueing while
  * claiming concurrency). Each worker thread additionally runs in its
  * own on-the-fly pool (`spark.scheduler.pool` local property):
  * default-weight pools share the executor fairly BETWEEN queries,
  * which is the serving-layer setup this drill models — without
  * per-thread pools every job lands in the single default pool, whose
  * internal scheduling is FIFO again.
  *
  * Usage: `runMain graft.tools.ConcurrencyDrill [sfDir] [threads]`
  * (defaults /root/testdata/sf0.1 and 8). Correctness is asserted the
  * same way ConcurrencySpec does — row-multiset equality to the
  * sequential baseline, checked BEFORE any number prints — so a
  * throughput number can never come from a wrong answer.
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
    val spark = Session.build(s"local[$cpus]", cpus.toInt, "graft-conc",
      extra = Map("spark.scheduler.mode" -> "FAIR"))
    spark.sparkContext.setLogLevel("WARN")
    require(spark.sparkContext.getConf.get("spark.scheduler.mode") == "FAIR",
      "drill requires FAIR scheduling at TaskScheduler init")
    def rows(name: String): Seq[String] =
      SparkEntry.queries(name)(spark, sfDir).collect()
        .map(_.toString).sorted.toSeq
    def timedRows(name: String): (String, Seq[String], Double) = {
      val t0 = System.nanoTime()
      val r = rows(name)
      (name, r, (System.nanoTime() - t0) / 1e9)
    }
    // warm pass: JVM/codegen/artifact-chain cost out of both timings
    panel.foreach(rows)
    val calib = Bench.spinProbeMs()
    val memCalib = Bench.memProbeMs()
    val t0 = System.nanoTime()
    val seqRuns = panel.map(timedRows)
    val seqSec = (System.nanoTime() - t0) / 1e9
    val baseline = seqRuns.map { case (q, r, _) => q -> r }.toMap
    val pool = Executors.newFixedThreadPool(threads)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    val t1 = System.nanoTime()
    val futs = (panel ++ panel.reverse).zipWithIndex.map { case (q, i) =>
      Future {
        // one on-the-fly pool per in-flight query: fair sharing is
        // BETWEEN pools; local properties are inheritable-thread-local,
        // so this binds the pool to exactly this future's jobs
        spark.sparkContext.setLocalProperty("spark.scheduler.pool", s"drill-$i")
        try timedRows(q)
        finally spark.sparkContext.setLocalProperty("spark.scheduler.pool", null)
      }
    }
    val got = Await.result(Future.sequence(futs), Duration.Inf)
    val conSec = (System.nanoTime() - t1) / 1e9
    pool.shutdown()
    val bad = got.filter { case (q, r, _) => r != baseline(q) }
    require(bad.isEmpty, s"diverged under concurrency: ${bad.map(_._1)}")
    def jstr(s: String) = "\"" + s + "\""
    def ms(v: Double) = f"$v%.3f"
    val seqJson = seqRuns.map { case (q, _, w) => s"${jstr(q)}:${ms(w)}" }
      .mkString("{", ",", "}")
    // concurrent per-query medians (each query ran twice)
    val concMed = got.groupBy(_._1).map { case (q, rs) =>
      val s = rs.map(_._3).sorted; (q, s(s.size / 2))
    }
    val concJson = panel.map(q => s"${jstr(q)}:${ms(concMed(q))}")
      .mkString("{", ",", "}")
    val json =
      s"""{"metric":"conc_drill","sf":${jstr(sfDir)},"threads":$threads,""" +
      s""""cpus":$cpus,"panel_n":${panel.size},""" +
      s""""seq_wall_sec":${ms(seqSec)},"conc_wall_sec":${ms(conSec)},""" +
      s""""conc_queries":${panel.size * 2},""" +
      s""""throughput_x":${ms(2 * seqSec / conSec)},""" +
      s""""calib_ms":${f"$calib%.2f"},"memcalib_ms":${f"$memCalib%.2f"},""" +
      s""""seq_sec":$seqJson,"conc_med_sec":$concJson}"""
    val outPath = sys.env.getOrElse("SPARK_GRAFT_CONC_OUT", "CONC_OUT.json")
    Files.writeString(Paths.get(outPath), json + "\n")
    println(json)
    println(f"[conc-drill] sf=$sfDir threads=$threads warm-seq " +
      f"${panel.size} queries ${seqSec}%.2f s; concurrent " +
      f"${panel.size * 2} queries ${conSec}%.2f s " +
      f"(per-query throughput x${2 * seqSec / conSec}%.2f, all results equal)")
    spark.stop()
  }
}
