package graft

import java.nio.file.{Files, Paths}

/** Benchmark main: times every `SparkEntry.queries` entry on
  * `SPARK_GRAFT_SF_DIR` and emits line-oriented JSON. Output contract
  * (shaped by how the driver captures stdout — round 5's artifact
  * arrived front-truncated and unparseable):
  *
  *   - the FULL result (per-query medians + all individual reps) is
  *     written to `SPARK_GRAFT_BENCH_OUT` (default `BENCH_OUT.json`);
  *   - stdout gets the full JSON line FIRST, then a compact one-line
  *     summary (`{"metric":"total","value":…,"failed":…,"n":…}`) LAST,
  *     so a tail-capture of any length still yields the headline
  *     numbers as valid JSON.
  *
  * Each query is timed `SPARK_GRAFT_BENCH_REPS` times (default 3) and
  * reported as the per-query MEDIAN: judge-measured full sessions
  * showed 10–25 s stalls roaming to a different heavy query each run
  * (VERDICT r5), and a median over ≥3 reps keeps one unlucky stall from
  * reading as a plan regression. Timings are rounded to milliseconds —
  * 9-digit fractions tripled the JSON size for noise.
  *
  * Failures are NOT swallowed: each failed query records an `err`
  * string (and its wall time), failures are counted in the JSON, and
  * the process exits nonzero so a regression can't hide behind a
  * plausible total.
  */
object Bench {

  /** Per-rep attribution listener (opt-in, `SPARK_GRAFT_BENCH_PROFILE=1`):
    * sums task-reported GC/run/spill between `snap()` calls so a wall-time
    * stall can be attributed to GC vs compute vs spill instead of guessed
    * at. Driver == executor JVM at local[N], so the GC MXBean delta also
    * covers pauses that landed outside any task.
    */
  private final class Profiler extends org.apache.spark.scheduler.SparkListener {
    import java.util.concurrent.atomic.AtomicLong
    val gc = new AtomicLong; val run = new AtomicLong; val spill = new AtomicLong
    override def onTaskEnd(
        t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
      val m = t.taskMetrics
      if (m != null) {
        gc.addAndGet(m.jvmGCTime); run.addAndGet(m.executorRunTime)
        spill.addAndGet(m.memoryBytesSpilled + m.diskBytesSpilled)
      }
    }
    private def beanGcMs: Long = {
      import scala.jdk.CollectionConverters._
      java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
        .asScala.map(_.getCollectionTime.max(0L)).sum
    }
    private var lastBean = beanGcMs
    /** (taskGcMs, taskRunMs, spillBytes, driverGcDeltaMs) since last call. */
    def snap(): (Long, Long, Long, Long) = {
      val b = beanGcMs; val d = b - lastBean; lastBean = b
      (gc.getAndSet(0), run.getAndSet(0), spill.getAndSet(0), d)
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt.max(1)
    val spark = Session.build(s"local[$cpus]", cpus.toInt, "graft-bench")
    spark.sparkContext.setLogLevel("WARN")
    val profiler =
      if (sys.env.get("SPARK_GRAFT_BENCH_PROFILE").contains("1")) {
        val p = new Profiler; spark.sparkContext.addSparkListener(p); Some(p)
      } else None
    // Deterministic block release at the query boundary (see clearCache
    // note below). SPARK_GRAFT_KEEP_RDDS=1 disables it for leak A/B runs.
    val freeRdds = !sys.env.get("SPARK_GRAFT_KEEP_RDDS").contains("1")

    // Optional comma-separated subset for local iteration (shared
    // contract), e.g. SPARK_GRAFT_ONLY=q30_minhash_lsh,q32_ngram_jaccard
    val selected = QuerySubset.select("bench")

    // Warm-up action outside the timed loop: JVM/codegen/parquet-footer
    // warm-up otherwise lands on whichever query happens to run first
    // (q06 absorbed ~6 s of it in round 1). Warm up with the FIRST
    // SELECTED query so subset runs touch the tables they'll time.
    selected.headOption.foreach { case (name, fn) =>
      try { fn(spark, sfDir).count(); spark.catalog.clearCache() }
      catch { case e: Throwable =>
        System.err.println(s"[bench] warm-up ($name) failed: $e") }
    }
    // (name, per-rep seconds sorted ascending, first error if any)
    val results = selected.map { case (name, fn) =>
      val runs = (1 to reps).map { rep =>
        val t0 = System.nanoTime()
        val err = try { fn(spark, sfDir).count(); None } catch {
          case e: Throwable =>
            Some(e.toString.linesIterator.next().take(200))
        }
        val wall = (System.nanoTime() - t0) / 1e9
        // release per-query persisted artifacts (signature/shingle/code
        // tables) — a long session must not accumulate dead cache
        spark.catalog.clearCache()
        // localCheckpoint blocks (the iterative queries' FINAL round)
        // live outside the catalog, so clearCache misses them; they are
        // otherwise reclaimed only when a *driver GC* collects the RDD
        // reference and the async ContextCleaner catches up — on a large
        // heap that can be minutes, during which the dead blocks squeeze
        // unified memory for every later query. Single-threaded boundary,
        // so a blanket sweep can only touch finished queries' blocks.
        if (freeRdds)
          spark.sparkContext.getPersistentRDDs.values
            .foreach(_.unpersist(blocking = false))
        profiler.foreach { p =>
          val (tgc, trun, sp, dgc) = p.snap()
          val stored = spark.sparkContext.getRDDStorageInfo
          System.err.println(
            f"[prof] $name rep=$rep wall=$wall%.3f taskGcMs=$tgc " +
            f"taskRunMs=$trun spillMB=${sp / (1 << 20)} gcBeanMs=$dgc " +
            f"rddBlocks=${stored.length} " +
            f"rddMB=${stored.map(i => i.memSize + i.diskSize).sum / (1 << 20)}")
        }
        (wall, err)
      }
      (name, runs.map(_._1).sorted, runs.flatMap(_._2).headOption)
    }

    def jstr(s: String): String =
      "\"" + s.flatMap {
        case '"' => "\\\""
        case '\\' => "\\\\"
        case c if c < ' ' => f"\\u${c.toInt}%04x"
        case c => c.toString
      } + "\""
    def ms(v: Double): String = f"$v%.3f"
    def med(sorted: Seq[Double]): Double = sorted(sorted.size / 2)
    val qs = results.map { case (k, r, _) => s"${jstr(k)}:${ms(med(r))}" }
      .mkString("{", ",", "}")
    val runsJson = results
      .map { case (k, r, _) => s"${jstr(k)}:${r.map(ms).mkString("[", ",", "]")}" }
      .mkString("{", ",", "}")
    val errs = results.collect { case (k, _, Some(e)) => s"${jstr(k)}:${jstr(e)}" }
      .mkString("{", ",", "}")
    val total = results.map(r => med(r._2)).sum
    val nFailed = results.count(_._3.isDefined)
    val common =
      s""""unit":"sec","failed":$nFailed,"n":${results.size},"reps":$reps,""" +
      s""""sf":${jstr(sfDir)},"cpus":$cpus,""" +
      s""""xmx_mb":${Runtime.getRuntime.maxMemory / (1 << 20)}"""
    val full =
      s"""{"metric":"total","value":${ms(total)},$common,"queries":$qs,"runs":$runsJson,"errors":$errs}"""
    // headline-only line — small enough to survive ANY tail capture
    val summary = s"""{"metric":"total","value":${ms(total)},$common}"""

    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "BENCH_OUT.json")
    Files.writeString(Paths.get(outPath), full + "\n" + summary + "\n")
    println(full)
    println(summary)
    spark.stop()
    if (nFailed > 0) sys.exit(1)
  }
}
