package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, Literal,
  Lower, Md5, RegExpReplace, StringTrim}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.BinaryType

/** SQL-first access to the operator library.
  *
  * The engine's reusable operators are Scala `DataFrame => DataFrame`
  * functions — the right shape for programmatic pipelines, invisible
  * from the language most data users actually write. `registerAll`
  * exposes the surface to pure-SQL callers on any session: the ten
  * fixture tables as temp views (with the same canonicalizations the
  * Scala loaders apply — notably `events.ts` nanos→µs), the most
  * reusable frame-level operators as derived temp views over those
  * fixtures, and the scalar library as native SQL functions (Catalyst
  * expressions, codegen'd — not UDFs).
  *
  * Views are lazy logical plans: registration performs no Spark jobs,
  * and every view inherits the operator's scale shape (pushdown,
  * broadcast decisions, single-shuffle windows) because it IS the
  * operator's plan, not a copy.
  */
object Graft {

  /** Default funnel for the [[registerAll]] `funnel_stage_times` view —
    * the q77 stage chain the fixture events actually contain. */
  val DefaultFunnel: Seq[String] = Seq("view", "click", "purchase")

  /** Register fixture tables, derived operator views, and scalar
    * functions on `spark` for SQL callers reading from `sfDir`.
    * Idempotent; safe to call on caller-built sessions. */
  def registerAll(spark: SparkSession, sfDir: String): Unit = {
    registerFunctions(spark)

    // ---- fixture tables -------------------------------------------------
    // events goes through Tables.events so SQL sees the same µs
    // timestamps the Scala operators (and the DuckDB oracle) see.
    Tables.names.filterNot(_ == "events").foreach { n =>
      Tables(spark, sfDir, n).createOrReplaceTempView(n)
    }
    Tables.events(spark, sfDir).createOrReplaceTempView("events")

    // ---- operator views -------------------------------------------------
    // Exact-dedup fingerprints (the q29/q74/q83/q91 key): one row per
    // document with its normalized-content fingerprint.
    Tables.documents(spark, sfDir)
      .select(col("doc_id"), operators.Dedup.normFp.as("fp"))
      .createOrReplaceTempView("doc_fingerprints")

    // Gap-rule sessionization (Eventing.sessionIds): events with their
    // per-user session id appended — the base every funnel/cohort/
    // attribution query composes over. One user_id shuffle.
    operators.Eventing.sessionIds(
      Tables.events(spark, sfDir).select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("t"), col("event_type"), col("value")))
      .createOrReplaceTempView("sessionized_events")

    // Ordered-funnel stage times (Eventing.funnelStageTimes) for the
    // fixture's view→click→purchase funnel: one t_<stage> column per
    // stage, all from a single user_id partitioning.
    operators.Eventing.funnelStageTimes(
      Tables.events(spark, sfDir).select(col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("t")),
      DefaultFunnel)
      .createOrReplaceTempView("funnel_stage_times")

    // Edit-distance candidate pairs over part names (the q93 input
    // shape: head-noun block key, multi-key length bands inside) —
    // SQL callers follow with levenshtein() on the survivors.
    operators.Relational.fuzzyCandidates(
      Tables.part(spark, sfDir)
        .select(col("p_name").as("name")).distinct()
        .withColumn("blk", element_at(split(col("name"), " "), -1)),
      maxDist = 6)
      .createOrReplaceTempView("fuzzy_name_candidates")

    // The deduplicated corpus (q74 survivor rule: smallest doc_id per
    // normalized-content fingerprint), full rows — the table most
    // downstream SQL actually wants to read.
    val docs = Tables.documents(spark, sfDir)
    docs.join(
        docs.select(col("doc_id"), operators.Dedup.normFp.as("fp"))
          .groupBy(col("fp")).agg(min(col("doc_id")).as("doc_id"))
          .select(col("doc_id")),
        Seq("doc_id"), "left_semi")
      .createOrReplaceTempView("dedup_corpus")

    // MERGE/upsert applied to the q80 CDC fixture (every 10th order
    // re-priced, status 'U'; delta wins per key, base scanned once) —
    // the post-merge current state as a queryable view.
    val orders = Tables.orders(spark, sfDir)
    operators.Relational.mergeUpsert(
      orders.select(col("o_orderkey"), col("o_orderstatus"),
        col("o_totalprice")),
      orders.filter(col("o_orderkey") % 10 === 0)
        .select(col("o_orderkey"), lit("U").as("o_orderstatus"),
          (col("o_totalprice") + 100).as("o_totalprice")),
      key = "o_orderkey")
      .createOrReplaceTempView("orders_current")
  }

  /** Scalar-function registration alone (no `sfDir` needed): native
    * Catalyst expressions under SQL names. Idempotent per session. */
  def registerFunctions(spark: SparkSession): Unit = {
    functions.VecOps.ensureRegistered(spark) // vec_dot(array, array)
    val reg = spark.sessionState.functionRegistry
    // graft_norm_fp(text): the exact-dedup normalization fingerprint —
    // md5(trim(collapse-whitespace(lower(text)))), composed from
    // built-in expressions so it stays inside whole-stage codegen and
    // CANNOT drift from Dedup.normFp's definition by more than this
    // one-line composition (guarded by SqlEntrySpec).
    reg.createOrReplaceTempFunction("graft_norm_fp",
      (children: Seq[Expression]) => Md5(Cast(StringTrim(RegExpReplace(
        Lower(children.head), Literal("\\s+"), Literal(" "))), BinaryType)),
      "built-in")
    // vec_cosine(a, b): cosine similarity composed over the codegen'd
    // dot product — the expression every ANN consumer writes by hand.
    import org.apache.spark.sql.catalyst.expressions.{Divide, Multiply, Sqrt}
    import graft.functions.VecOps.DotProduct
    reg.createOrReplaceTempFunction("vec_cosine",
      (children: Seq[Expression]) => {
        val Seq(a, b) = children
        Divide(DotProduct(a, b),
          Multiply(Sqrt(DotProduct(a, a)), Sqrt(DotProduct(b, b))))
      },
      "built-in")
  }
}
