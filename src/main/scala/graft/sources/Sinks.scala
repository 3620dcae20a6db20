package graft.sources

import org.apache.spark.sql.DataFrame

/** Write-side table maintenance. The small-files problem is the classic
  * 100 TB sink failure: a shuffle with thousands of reducers writing a
  * partitioned table emits thousands of tiny files per partition, and
  * every later scan pays per-file open/footer cost until someone
  * compacts. (Read-side mitigation already exists — the parquet scan
  * merges small inputs up to `spark.sql.files.maxPartitionBytes` per
  * split — but the files themselves must eventually be rewritten.)
  */
object Sinks {

  /** Rewrite `df` as parquet in `dir` with bounded, roughly-equal file
    * sizes: a count sizes the job at ceil(n / recordsPerFile) writers
    * (a round-robin repartition — no keys, no skew), and
    * `maxRecordsPerFile` hard-caps stragglers so no single file can
    * exceed the target even if the repartition is uneven. The input is
    * persisted across the count + write pair — `df` may be an arbitrary
    * computed plan, and without the persist the whole computation would
    * run twice (once to count, once to write). Returns the row count
    * it compacted. */
  def writeCompacted(df: DataFrame, dir: String,
      recordsPerFile: Long): Long = {
    // only manage a cache WE created — unconditionally unpersisting
    // would silently drop a cache the caller established (Spark cache
    // entries are not refcounted)
    val ownCache =
      df.storageLevel == org.apache.spark.storage.StorageLevel.NONE
    if (ownCache) df.persist()
    try {
      val n = df.count()
      val parts = math.max(1L, (n + recordsPerFile - 1) / recordsPerFile).toInt
      df.repartition(parts)
        .write.mode("overwrite")
        .option("maxRecordsPerFile", recordsPerFile)
        .parquet(dir)
      n
    } finally if (ownCache) df.unpersist(blocking = false)
  }
}
