package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{Q, Tables}

/** CSV and JSON file-format connectors (SURVEY §2.C row 1 names them as
  * the first extension beyond the reference's text-lines-only source).
  *
  * Both go through `spark.read.csv/json` with an EXPLICIT schema — at
  * scale, schema inference is a full extra pass over the data and can
  * mis-type columns on dirty inputs; a declared `StructType` keeps the
  * scan single-pass and deterministic.
  *
  * The oracle-checked queries round-trip a parquet fixture table through
  * the format (write, then read back with the source's schema) and
  * aggregate the result; the DuckDB oracle computes the same aggregate
  * straight from parquet, so any loss or mis-typing in the
  * writer/reader pair is a hash mismatch. Aggregations stick to
  * int/string columns: a text format is not a bit-exact carrier for
  * doubles under re-serialization.
  */
object FileFormats {

  /** JVM-scoped scratch root, recursively deleted at exit — repeated
    * bench/verify loops must not accumulate a written table copy per
    * invocation in /tmp. */
  private lazy val scratchRoot: java.nio.file.Path = {
    val root = java.nio.file.Files.createTempDirectory("graft-sources-")
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      import java.nio.file.{Files, Path}
      import java.util.Comparator
      val stream = Files.walk(root)
      try stream.sorted(Comparator.reverseOrder[Path]())
        .forEach(p => Files.deleteIfExists(p))
      finally stream.close()
    }))
    root
  }

  /** Write `table` out in `fmt`, read it back with the original schema.
    * The directory is per-invocation (fresh subdir of the scratch
    * root) — a fixed path would race between concurrent suites
    * overwriting and reading the same files. */
  private def roundTrip(s: SparkSession, d: String, table: String,
                        fmt: String): DataFrame = {
    val src = Tables(s, d, table)
    val dir = java.nio.file.Files.createTempDirectory(scratchRoot, table)
      .toString + s"/$table.$fmt"
    fmt match {
      case "csv" =>
        src.write.mode("overwrite").option("header", "true").csv(dir)
        s.read.schema(src.schema).option("header", "true").csv(dir)
      case "json" =>
        src.write.mode("overwrite").json(dir)
        s.read.schema(src.schema).json(dir)
    }
  }

  val queries: Seq[Q] = Seq(

    Q("q42_csv_source",
      """SELECT n_regionkey, CAST(count(*) AS BIGINT) AS n,
        |  min(n_name) AS first_name
        |FROM nation GROUP BY n_regionkey""".stripMargin) { (s, d) =>
      roundTrip(s, d, "nation", "csv")
        .groupBy(col("n_regionkey"))
        .agg(count(lit(1)).as("n"), min(col("n_name")).as("first_name"))
    },

    Q("q43_json_source",
      """SELECT s_nationkey, CAST(count(*) AS BIGINT) AS n,
        |  min(s_name) AS first_name,
        |  CAST(max(s_suppkey) AS BIGINT) AS max_suppkey
        |FROM supplier GROUP BY s_nationkey""".stripMargin) { (s, d) =>
      roundTrip(s, d, "supplier", "json")
        .groupBy(col("s_nationkey"))
        .agg(count(lit(1)).as("n"), min(col("s_name")).as("first_name"),
          max(col("s_suppkey")).as("max_suppkey"))
    }
  )
}
