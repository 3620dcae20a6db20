package graft

import java.nio.file.{Files, Paths}

/** Benchmark main: times every `SparkEntry.queries` entry on
  * `SPARK_GRAFT_SF_DIR` and emits ONE JSON line. The JSON is also
  * written to a file (`SPARK_GRAFT_BENCH_OUT`, default `BENCH_OUT.json`
  * in the cwd) because sbt wraps stdout in `[info]` prefixes that break
  * line-oriented JSON parsing downstream.
  *
  * Failures are NOT swallowed: each failed query records an `err` string
  * (and its wall time), failures are counted in the JSON, and the
  * process exits nonzero so a regression can't hide behind a plausible
  * total.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
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
    val results = selected.map { case (name, fn) =>
      val t0 = System.nanoTime()
      val err = try { fn(spark, sfDir).count(); None } catch {
        case e: Throwable =>
          Some(e.toString.linesIterator.next().take(200))
      }
      // release per-query persisted artifacts (signature/shingle/code
      // tables) — a long session must not accumulate dead cache
      spark.catalog.clearCache()
      (name, (System.nanoTime() - t0) / 1e9, err)
    }

    def jstr(s: String): String =
      "\"" + s.flatMap {
        case '"' => "\\\""
        case '\\' => "\\\\"
        case c if c < ' ' => f"\\u${c.toInt}%04x"
        case c => c.toString
      } + "\""
    val qs = results.map { case (k, v, _) => s"${jstr(k)}:$v" }
      .mkString("{", ",", "}")
    val errs = results.collect { case (k, _, Some(e)) => s"${jstr(k)}:${jstr(e)}" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val nFailed = results.count(_._3.isDefined)
    val json =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errs,"failed":$nFailed,"sf":${jstr(sfDir)},"cpus":$cpus,"xmx_mb":${Runtime.getRuntime.maxMemory / (1 << 20)}}"""

    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "BENCH_OUT.json")
    Files.writeString(Paths.get(outPath), json + "\n")
    println(json)
    spark.stop()
    if (nFailed > 0) sys.exit(1)
  }
}
