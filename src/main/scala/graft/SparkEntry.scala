package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates every operator module's [[Q]] list into the flat
  * `queries` / `oracleSql` maps the driver consumes.
  */
object SparkEntry {

  /** All engine queries, one per implemented operator (SURVEY.md §2). */
  def all: Seq[Q] =
    operators.Relational.queries ++
    operators.TextOps.queries ++
    operators.Dedup.queries ++
    operators.Similarity.queries ++
    operators.Multimodal.queries ++
    operators.Eventing.queries ++
    operators.Skew.queries ++
    sources.FileFormats.queries ++
    sources.Jdbc.queries ++
    functions.Aggregators.queries ++
    functions.SqlUdfs.queries

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q01_pricing_summary")(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    all.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
