package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{Q, Tables}

/** Deduplication suite over `documents` — exact, MinHash+LSH, SimHash,
  * and n-gram Jaccard. The reference has no dedup operators (SURVEY
  * §2.C); these are the LLM-training-pipeline extensions, built
  * shuffle-first: every pairwise comparison goes through an inverted
  * index or LSH bucket join (never a cross join), so the plans survive
  * 100 TB — candidate generation is a hash join on (band, signature),
  * linear in data size, not quadratic.
  *
  * Oracle determinism: all hashing is `md5` hex strings (identical in
  * Spark and DuckDB); minhash = lexicographic MIN over hex strings, so
  * no integer-conversion divergence exists anywhere.
  */
object Dedup {

  private val toks: Column = split(lower(col("text")), " ", -1)

  /** Word-trigram shingles, 0-based `get` indexing; docs with <3 tokens
    * produce none (guard needed: Spark `sequence(1, n)` with n<1 would
    * produce a DESCENDING sequence, not an empty one). */
  private def shingles(s: SparkSession, d: String): DataFrame = {
    val n = size(toks)
    val idx = when(n >= 3, sequence(lit(0), n - 3))
      .otherwise(array().cast("array<int>"))
    Tables.documents(s, d)
      .select(col("doc_id"), explode(transform(idx, i =>
        concat_ws(" ", get(toks, i), get(toks, i + 1), get(toks, i + 2))))
        .as("shingle"))
      .distinct()
  }

  private val SHINGLE_SQL =
    """SELECT DISTINCT doc_id, l[i] || ' ' || l[i + 1] || ' ' || l[i + 2] AS shingle
      |FROM (SELECT doc_id, string_split(lower(text), ' ') AS l FROM documents) t
      |CROSS JOIN unnest(range(1, len(l) - 1)) AS u(i)""".stripMargin

  private val NUM_HASHES = 12

  /** MinHash signatures: one row per (doc, hash-function j), the hash
    * family is md5 with a per-j salt, min taken lexicographically over
    * hex digests. */
  private def minhashes(s: SparkSession, d: String): DataFrame =
    shingles(s, d)
      .select(col("doc_id"),
        explode(sequence(lit(0), lit(NUM_HASHES - 1))).as("j"),
        col("shingle"))
      .select(col("doc_id"), col("j"),
        md5(concat(col("j").cast("string"), lit(":"), col("shingle"))
          .cast("binary")).as("h"))
      .groupBy(col("doc_id"), col("j"))
      .agg(min(col("h")).as("mh"))

  private val MINHASH_SQL =
    s"""SELECT doc_id, j, min(md5(CAST(j AS VARCHAR) || ':' || shingle)) AS mh
       |FROM ($SHINGLE_SQL) sh
       |CROSS JOIN unnest(range(0, $NUM_HASHES)) AS v(j)
       |GROUP BY doc_id, j""".stripMargin

  /** 16-bit SimHash oracle SQL is mechanical (16 per-bit terms) —
    * generated here so Spark and DuckDB stay in lockstep by construction. */
  private def simhashOracle: String = {
    val hexVal = (1 to 4).map { p =>
      s"(strpos('0123456789abcdef', substr(hx, $p, 1)) - 1) * ${1 << ((4 - p) * 4)}"
    }.mkString(" + ")
    val contrib = (0 until 16).map { b =>
      s"CASE WHEN sum(((v >> $b) & 1) * 2 - 1) > 0 THEN ${1 << b} ELSE 0 END"
    }.mkString(" + ")
    s"""WITH t AS (
       |  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS tok
       |  FROM documents),
       |h AS (SELECT doc_id, md5(tok) AS hx FROM t),
       |v AS (SELECT doc_id, $hexVal AS v FROM h)
       |SELECT doc_id, CAST($contrib AS BIGINT) AS simhash16
       |FROM v GROUP BY doc_id""".stripMargin
  }

  val queries: Seq[Q] = Seq(

    // ----- exact dedup: normalized-content hash groups --------------------
    Q("q29_exact_dedup",
      """SELECT fp, min(doc_id) AS keep_id, count(*) AS n_dups
        |FROM (SELECT doc_id,
        |        md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp
        |      FROM documents) t
        |GROUP BY fp""".stripMargin) { (s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"),
          md5(trim(regexp_replace(lower(col("text")), "\\s+", " "))
            .cast("binary")).as("fp"))
        .groupBy(col("fp"))
        .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_dups"))
    },

    // ----- MinHash + LSH: top candidate pairs by estimated Jaccard ---------
    // Bands of r=1 row (threshold ~ j per band): candidates = pairs
    // sharing any of the 12 minhashes, found by a self-join on (j, mh) —
    // the inverted-index shape that scales. est_j = matching fraction.
    Q("q30_minhash_lsh",
      s"""WITH mh AS ($MINHASH_SQL)
         |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |  count(*) / ${NUM_HASHES}.0 AS est_jaccard
         |FROM mh a JOIN mh b
         |  ON a.j = b.j AND a.mh = b.mh AND a.doc_id < b.doc_id
         |GROUP BY doc_a, doc_b
         |ORDER BY est_jaccard DESC, doc_a, doc_b
         |LIMIT 20""".stripMargin) { (s, d) =>
      val mh = minhashes(s, d)
      val a = mh.select(col("doc_id").as("doc_a"), col("j"), col("mh"))
      val b = mh.select(col("doc_id").as("doc_b"), col("j").as("j2"),
        col("mh").as("mh2"))
      a.join(b, col("j") === col("j2") && col("mh") === col("mh2") &&
          col("doc_a") < col("doc_b"))
        .groupBy(col("doc_a"), col("doc_b"))
        .agg((count(lit(1)) / NUM_HASHES.toDouble).as("est_jaccard"))
        .orderBy(col("est_jaccard").desc, col("doc_a"), col("doc_b"))
        .limit(20)
    },

    // ----- SimHash: 16-bit frequency-weighted token fingerprint ------------
    Q("q31_simhash", simhashOracle) { (s, d) =>
      val v = conv(substring(md5(col("tok").cast("binary")), 1, 4), 16, 10)
        .cast("long")
      val perBit = (0 until 16).map { b =>
        sum(shiftright(col("v"), b).bitwiseAND(1) * 2 - 1).as(s"s_$b")
      }
      val simhash = (0 until 16).map { b =>
        when(col(s"s_$b") > 0, 1L << b).otherwise(0L)
      }.reduce(_ + _)
      Tables.documents(s, d)
        .select(col("doc_id"), explode(toks).as("tok"))
        .select(col("doc_id"), v.as("v"))
        .groupBy(col("doc_id"))
        .agg(perBit.head, perBit.tail: _*)
        .select(col("doc_id"), simhash.cast("long").as("simhash16"))
    },

    // ----- exact n-gram Jaccard via inverted-index join ----------------------
    Q("q32_ngram_jaccard",
      s"""WITH shd AS ($SHINGLE_SQL),
         |sizes AS (SELECT doc_id, count(*) AS n FROM shd GROUP BY doc_id),
         |inter AS (
         |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS m
         |  FROM shd a JOIN shd b
         |    ON a.shingle = b.shingle AND a.doc_id < b.doc_id
         |  GROUP BY doc_a, doc_b)
         |SELECT doc_a, doc_b,
         |  CAST(m AS DOUBLE) / (sa.n + sb.n - m) AS jaccard
         |FROM inter
         |JOIN sizes sa ON sa.doc_id = doc_a
         |JOIN sizes sb ON sb.doc_id = doc_b
         |ORDER BY jaccard DESC, doc_a, doc_b
         |LIMIT 20""".stripMargin) { (s, d) =>
      val shd = shingles(s, d)
      val sizes = shd.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
      val a = shd.select(col("doc_id").as("doc_a"), col("shingle"))
      val b = shd.select(col("doc_id").as("doc_b"),
        col("shingle").as("shingle2"))
      val inter = a.join(b, col("shingle") === col("shingle2") &&
          col("doc_a") < col("doc_b"))
        .groupBy(col("doc_a"), col("doc_b"))
        .agg(count(lit(1)).as("m"))
      inter
        .join(sizes.select(col("doc_id").as("doc_a"), col("n").as("na")), "doc_a")
        .join(sizes.select(col("doc_id").as("doc_b"), col("n").as("nb")), "doc_b")
        .select(col("doc_a"), col("doc_b"),
          (col("m").cast("double") / (col("na") + col("nb") - col("m")))
            .as("jaccard"))
        .orderBy(col("jaccard").desc, col("doc_a"), col("doc_b"))
        .limit(20)
    }
  )
}
