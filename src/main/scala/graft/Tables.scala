package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Typed-parquet table loaders for the driver fixtures (TESTDATA.md).
  *
  * The reference engine's only source is a directory of UTF-8 text files
  * (`/root/reference/mapreduce/manager/__main__.py:320-327`); we keep that
  * (see [[graft.pipeline.MapReduce.textDir]]) and add columnar Parquet as
  * the scale-path source. All reads go through `spark.read.parquet` so
  * Catalyst's vectorized reader, predicate pushdown and column pruning
  * apply — verified via `.explain` (PushedFilters / ReadSchema).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = apply(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = apply(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = apply(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = apply(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = apply(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = apply(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = apply(s, d, "lineitem")
  /** `events.parquet` stores `ts` as Parquet TIMESTAMP(NANOS), which
    * Spark's reader rejects outright. Sessions built via [[Session.build]]
    * set `spark.sql.legacy.parquet.nanosAsLong` so it reads as raw nanos;
    * here we convert to a microsecond timestamp — same truncation DuckDB
    * applies, so oracle comparisons agree. (The conf belongs in session
    * construction; for a caller-built session it is set here ONLY if
    * absent — idempotent, and never flips an explicit setting under a
    * concurrent reader.)
    */
  def events(s: SparkSession, d: String): DataFrame = {
    // Fallback for caller-built sessions (the queries map is a public
    // contract taking any SparkSession): without this conf the read
    // throws PARQUET_TYPE_ILLEGAL. NOTE an `isEmpty` guard would be
    // dead code — `conf.getOption` returns the REGISTERED DEFAULT
    // Some("false") even when nothing was set — so the guard checks the
    // effective value; a caller's explicit "false" is overridden
    // because the read cannot succeed without it. Idempotent and a
    // no-op on sessions from graft.Session.build.
    val nanosKey = "spark.sql.legacy.parquet.nanosAsLong"
    if (!s.conf.getOption(nanosKey).contains("true")) s.conf.set(nanosKey, "true")
    // integer `div`, not `/`: double division can round UP by 1 µs on
    // epoch-nanos magnitudes, diverging from DuckDB's truncation
    apply(s, d, "events")
      .withColumn("ts", org.apache.spark.sql.functions
        .timestamp_micros(org.apache.spark.sql.functions.expr("ts div 1000")))
  }
  def documents(s: SparkSession, d: String): DataFrame = apply(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = apply(s, d, "embeddings")
}
