package graft

import org.apache.spark.sql.SparkSession

/** One place to construct engine SparkSessions so every entry point
  * (Bench, Verify, RefParity, Submit, specs) runs with identical
  * semantics-bearing configuration.
  */
object Session {

  /** `extra` lets fault-injection harnesses (FaultDemo) tighten the
    * speculation knobs or point executors at the right classpath while
    * still running THIS config — the point is to exercise the session
    * as shipped, not a parallel hand-built one. */
  def build(master: String, shufflePartitions: Int,
            appName: String = "graft",
            extra: Map[String, String] = Map.empty): SparkSession = {
    val base = SparkSession.builder()
      .withExtensions(new GraftExtensions)
      .master(master)
      .appName(appName)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // `events.parquet` stores ts as Parquet TIMESTAMP(NANOS), which the
      // reader otherwise rejects; session-level (not hidden in a loader)
      // so no table getter mutates shared state mid-query.
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // Fault tolerance is config, not code, on Spark (SURVEY §2.A A13):
      // the reference detects dead workers by heartbeat timeout and
      // re-queues their in-flight task from a pristine copy
      // (/root/reference/mapreduce/manager/__main__.py:294-311, :474-482).
      // Spark's analog: per-task retry + speculative re-launch of
      // stragglers (the reference's wc_map_slow.sh scenario,
      // tests/test_manager_05.py:75-95).
      .config("spark.task.maxFailures", "4")
      .config("spark.speculation", "true")
      .config("spark.speculation.multiplier", "4")
      // AQE re-plans at runtime: skew-join splitting and partition
      // coalescing are the 100 TB safety nets for every shuffle here.
      .config("spark.sql.adaptive.enabled", "true")
      // NOTE deliberately keeping coalescePartitions.parallelismFirst at
      // its default (true): measured at sf0.1/local[32], size-based
      // coalescing (false) serialized the CPU-heavy post-shuffle stages
      // (candidate verification in the LSH queries) and cost ~10% on the
      // heavy-query subset. At 100 TB the advisory size wins either way
      // because partitions are data-bound, not core-bound.
    extra.foldLeft(base) { case (b, (k, v)) => b.config(k, v) }
      .getOrCreate()
  }
}
