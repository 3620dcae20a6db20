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
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt.max(1)
    val spark = Session.build(s"local[$cpus]", cpus.toInt, "graft-bench")
    spark.sparkContext.setLogLevel("WARN")

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
      val runs = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        val err = try { fn(spark, sfDir).count(); None } catch {
          case e: Throwable =>
            Some(e.toString.linesIterator.next().take(200))
        }
        // release per-query persisted artifacts (signature/shingle/code
        // tables) — a long session must not accumulate dead cache
        spark.catalog.clearCache()
        ((System.nanoTime() - t0) / 1e9, err)
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
