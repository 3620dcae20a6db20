package graft.tools

import org.apache.spark.sql.functions._

import graft.{Session, Tables}

/** Scale-evidence corpus generator: a 4× `documents`/`embeddings` pair
  * derived deterministically from an input scale-factor directory, with
  * a DENSER similarity graph than organic growth — every original
  * yields 3 additional near-duplicate copies (one token perturbed per
  * copy; first embedding dims nudged), so candidate-generation
  * machinery faces MORE collisions per doc at 4× the rows. Sub-linear
  * wall-clock growth on this corpus is therefore a conservative
  * estimate of the organic-scale behavior.
  *
  * Usage: `runMain graft.tools.ScaleData <sfDir> <outDir>`. Only the
  * two corpus tables are generated; relational tables are out of scope
  * (the scale-sensitive queries touch only these).
  */
object ScaleData {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val spark = Session.build("local[16]", 16, "graft-scaledata")
    spark.sparkContext.setLogLevel("WARN")
    generate(spark, sfDir, outDir)
    spark.stop()
  }

  /** Corpus generation on a CALLER-OWNED session — `main` wraps this
    * with its own session lifecycle; in-JVM callers (AnnConfigSpec's 4×
    * recall panel) pass the shared test session, which must NOT be
    * stopped out from under the rest of the suite. */
  def generate(spark: org.apache.spark.sql.SparkSession,
      sfDir: String, outDir: String): Unit = {
    // token array projected as a column FIRST: a split() referenced
    // inside the transform lambda would re-evaluate per element
    // (no CSE across higher-order functions — the Dedup.shingles rule)
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text"), split(col("text"), " ").as("toks"),
        col("lang"), col("source"),
        explode(sequence(lit(0), lit(3))).as("k"))
      .withColumn("pidx",
        expr("CAST(k * 7 AS INT) % greatest(size(toks), 1)"))
      .select(
        (col("doc_id") * 4 + col("k")).as("doc_id"),
        // copy k>0 perturbs the token at position 7k mod |toks| by
        // appending "~k" — 3 shingles change, the rest stay shared
        when(col("k") === 0, col("text")).otherwise(
          array_join(expr(
            "transform(toks, (t, i) -> IF(i = pidx, concat(t, '~', k), t))"),
            " "))
          .as("text"),
        col("lang"), col("source"))
      .withColumn("n_chars", length(col("text")).cast("long"))
    docs.coalesce(1).write.mode("overwrite")
      .parquet(s"$outDir/documents.parquet")

    val embs = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding"), col("label"),
        explode(sequence(lit(0), lit(3))).as("k"))
      .select(
        (col("vec_id") * 4 + col("k")).as("vec_id"),
        // nudge EVERY dim by a deterministic ±0.02k — cosine stays
        // ~0.999 (a genuine near-dup) while the copy's LSH sign
        // projections shift enough to sometimes land in neighboring
        // buckets, like real re-encodings do; perturbing only a few
        // dims would leave all four copies bit-identical in code space
        // and overstate bucket densification 4x
        expr("""transform(embedding,
               |  (x, i) -> CAST(x + k * 0.02 * IF((i * 7 + k * 13) % 2 = 0, 1, -1)
               |                 AS FLOAT))""".stripMargin).as("embedding"),
        col("label"))
    embs.coalesce(1).write.mode("overwrite")
      .parquet(s"$outDir/embeddings.parquet")

    println(s"[scaledata] wrote ${outDir}: " +
      s"docs=${spark.read.parquet(s"$outDir/documents.parquet").count()} " +
      s"vecs=${spark.read.parquet(s"$outDir/embeddings.parquet").count()}")
  }
}
