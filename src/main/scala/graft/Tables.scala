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
  /** `events.parquet` has carried `ts` under two different Parquet
    * encodings across fixture generations: TIMESTAMP(NANOS) (read as raw
    * nanos via `spark.sql.legacy.parquet.nanosAsLong`) and plain
    * `timestamp[us]` with isAdjustedToUTC=false (read as TIMESTAMP_NTZ).
    * The loader branches on the dtype it actually got, so a fixture
    * regeneration changes zero queries: either way the caller sees a
    * session-TZ `TimestampType` column with microsecond epoch values that
    * match DuckDB's reading of the same file.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    val nanosKey = "spark.sql.legacy.parquet.nanosAsLong"
    // A caller-built session reading a NANOS-encoded fixture throws
    // ILLEGAL_PARQUET_TYPE at schema inference; only then set the legacy
    // conf and retry. (Sessions from graft.Session.build pre-set it, and
    // a micros fixture never needs it.) NOTE `conf.getOption` returns the
    // REGISTERED DEFAULT Some("false") even when nothing was set, so the
    // guard checks the effective value.
    val raw =
      try apply(s, d, "events")
      catch {
        case e: org.apache.spark.sql.AnalysisException
            if e.getMessage.contains("NANOS") &&
              !s.conf.getOption(nanosKey).contains("true") =>
          s.conf.set(nanosKey, "true")
          apply(s, d, "events")
      }
    raw.schema("ts").dataType match {
      case LongType =>
        // nanos-as-long: integer `div`, not `/` — double division can
        // round UP by 1 µs on epoch-nanos magnitudes, diverging from
        // DuckDB's truncation
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _: TimestampNTZType =>
        // NTZ→instant cast interprets the wall clock in the SESSION
        // timezone; only UTC reproduces DuckDB's naive reading of the
        // same file. Session.build pins UTC; fail loudly for any other
        // caller session rather than silently shifting every epoch.
        require(s.conf.get("spark.sql.session.timeZone") == "UTC",
          "events.ts is TIMESTAMP_NTZ in the fixture; converting to a " +
            "session-TZ timestamp is value-preserving only under " +
            "spark.sql.session.timeZone=UTC (set by graft.Session.build)")
        raw.withColumn("ts", col("ts").cast(TimestampType))
      case _ => raw // already an instant timestamp: use as-is
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = apply(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = apply(s, d, "embeddings")
}
