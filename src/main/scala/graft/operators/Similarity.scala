package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{Q, Tables}

/** Similarity search over the `embeddings` table (64-dim float vectors).
  *
  * Everything is computed on QUANTIZED vectors — `round(x * 1000)` as
  * integer-valued doubles — so dot products and norms are exact integer
  * arithmetic (≤ 2^53): bit-reproducible across engines, partitionings,
  * and summation orders. A raw float/double dot product would differ in
  * the last ulp between Spark and DuckDB and break the oracle hash.
  *
  * Scale path: the LSH variant buckets vectors by an 8-bit sign code
  * (axis-aligned random-hyperplane family) and joins within buckets —
  * candidate generation is a hash join, never a cross join. Brute force
  * is the small-query-set baseline: a broadcast of the query rows
  * against a full scan, one pass, no shuffle.
  */
object Similarity {

  /** Quantized copy of an embedding column. */
  private def quant(c: Column): Column =
    transform(c, x => round(x.cast("double") * 1000))

  private def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  private def norm(a: Column): Column =
    sqrt(aggregate(transform(a, x => x * x), lit(0.0), (acc, v) => acc + v))

  /** 8-bit sign-pattern LSH code over the first 8 dimensions. */
  private def signCode(c: Column): Column =
    (0 until 8).map { i =>
      when(get(c, lit(i)) > 0, 1L << i).otherwise(0L)
    }.reduce(_ + _)

  private val QUANT_SQL =
    "list_transform(embedding, x -> round(CAST(x AS DOUBLE) * 1000))"

  private def signCodeSql(col: String): String =
    (1 to 8).map { i =>
      s"(CASE WHEN $col[$i] > 0 THEN ${1L << (i - 1)} ELSE 0 END)"
    }.mkString(" + ")

  val queries: Seq[Q] = Seq(

    // ----- brute-force cosine top-k (baseline; broadcast query side) -------
    Q("q33_ann_bruteforce",
      s"""WITH q AS (
         |  SELECT $QUANT_SQL AS qv FROM embeddings WHERE vec_id = 0),
         |e AS (
         |  SELECT vec_id, label, $QUANT_SQL AS ev FROM embeddings
         |  WHERE vec_id <> 0)
         |SELECT vec_id, label,
         |  list_sum(list_transform(range(1, 65), i -> ev[i] * qv[i]))
         |    / (sqrt(list_sum(list_transform(ev, x -> x * x)))
         |       * sqrt(list_sum(list_transform(qv, x -> x * x)))) AS cos_sim
         |FROM e CROSS JOIN q
         |ORDER BY cos_sim DESC, vec_id
         |LIMIT 10""".stripMargin) { (s, d) =>
      val emb = Tables.embeddings(s, d)
      val q = emb.filter(col("vec_id") === 0)
        .select(quant(col("embedding")).as("qv"))
      emb.filter(col("vec_id") =!= 0)
        .select(col("vec_id"), col("label"), quant(col("embedding")).as("ev"))
        .crossJoin(broadcast(q))
        .select(col("vec_id"), col("label"),
          (dot(col("ev"), col("qv")) / (norm(col("ev")) * norm(col("qv"))))
            .as("cos_sim"))
        .orderBy(col("cos_sim").desc, col("vec_id"))
        .limit(10)
    },

    // ----- LSH-bucketed ANN: candidates share the query's sign code --------
    Q("q34_ann_lsh",
      s"""WITH e AS (
         |  SELECT vec_id, label, $QUANT_SQL AS ev,
         |    ${signCodeSql("embedding")} AS code
         |  FROM embeddings),
         |q AS (SELECT ev AS qv, code AS qcode FROM e WHERE vec_id = 0)
         |SELECT vec_id, label, code,
         |  list_sum(list_transform(range(1, 65), i -> ev[i] * qv[i]))
         |    / (sqrt(list_sum(list_transform(ev, x -> x * x)))
         |       * sqrt(list_sum(list_transform(qv, x -> x * x)))) AS cos_sim
         |FROM e JOIN q ON e.code = q.qcode
         |WHERE vec_id <> 0
         |ORDER BY cos_sim DESC, vec_id
         |LIMIT 5""".stripMargin) { (s, d) =>
      val e = Tables.embeddings(s, d)
        .select(col("vec_id"), col("label"),
          quant(col("embedding")).as("ev"),
          signCode(col("embedding")).as("code"))
      val q = e.filter(col("vec_id") === 0)
        .select(col("ev").as("qv"), col("code").as("qcode"))
      e.join(broadcast(q), col("code") === col("qcode"))
        .filter(col("vec_id") =!= 0)
        .select(col("vec_id"), col("label"), col("code"),
          (dot(col("ev"), col("qv")) / (norm(col("ev")) * norm(col("qv"))))
            .as("cos_sim"))
        .orderBy(col("cos_sim").desc, col("vec_id"))
        .limit(5)
    },

    // ----- embedding near-duplicate pairs within LSH buckets ----------------
    Q("q35_embedding_neardup",
      s"""WITH e AS (
         |  SELECT vec_id, $QUANT_SQL AS ev,
         |    ${signCodeSql("embedding")} AS code
         |  FROM embeddings)
         |SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
         |  list_sum(list_transform(range(1, 65), i -> a.ev[i] * b.ev[i]))
         |    / (sqrt(list_sum(list_transform(a.ev, x -> x * x)))
         |       * sqrt(list_sum(list_transform(b.ev, x -> x * x)))) AS cos_sim
         |FROM e a JOIN e b ON a.code = b.code AND a.vec_id < b.vec_id
         |ORDER BY cos_sim DESC, vec_a, vec_b
         |LIMIT 20""".stripMargin) { (s, d) =>
      val e = Tables.embeddings(s, d)
        .select(col("vec_id"), quant(col("embedding")).as("ev"),
          signCode(col("embedding")).as("code"))
      val a = e.select(col("vec_id").as("vec_a"), col("ev").as("ea"), col("code"))
      val b = e.select(col("vec_id").as("vec_b"), col("ev").as("eb"),
        col("code").as("code2"))
      a.join(b, col("code") === col("code2") && col("vec_a") < col("vec_b"))
        .select(col("vec_a"), col("vec_b"),
          (dot(col("ea"), col("eb")) / (norm(col("ea")) * norm(col("eb"))))
            .as("cos_sim"))
        .orderBy(col("cos_sim").desc, col("vec_a"), col("vec_b"))
        .limit(20)
    }
  )
}
