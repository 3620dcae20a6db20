package graft

import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The `graft-seq` DataSourceV2 connector's contracts
  * ([[sources.SeqSource]]): planning-time partition pruning under
  * pushed `id` predicates, consumed-filter elision (no redundant
  * post-scan Filter), projection pruning down to the read schema, and
  * per-column generator correctness (including `payload`, which q178's
  * pruned query never reads).
  */
class DsvSourceSpec extends AnyFunSuite {

  lazy val spark = Spec.spark

  private val N = 10000L

  private def seq() =
    spark.read.format("graft-seq").option("end", N).load()

  private def scanOf(df: org.apache.spark.sql.DataFrame): BatchScanExec =
    df.queryExecution.executedPlan.collectFirst {
      case b: BatchScanExec => b
    }.getOrElse(fail("no BatchScanExec in plan"))

  test("short name resolves through the DataSourceRegister service file") {
    // format("graft-seq") (not the class name) — the registration path
    assert(seq().schema.fieldNames.toSeq ===
      Seq("id", "bucket", "v", "payload"))
  }

  test("generator columns match their formulas, payload included") {
    val rows = seq().filter(col("id") < 100).collect()
    assert(rows.length === 100)
    rows.foreach { r =>
      val id = r.getLong(0)
      assert(r.getInt(1) === (id % 16).toInt)
      assert(r.getLong(2) === (id * 37 + 11) % 1000)
      assert(r.getString(3) === "p" + (id % 7))
    }
  }

  test("pushed id range prunes planned partitions, not just rows") {
    val all = scanOf(seq().select("v")).inputRDD.getNumPartitions
    val pruned = scanOf(
      seq().filter(col("id") >= N / 2 && col("id") < N / 2 + 10)
        .select("v")).inputRDD.getNumPartitions
    assert(all > 1, "unfiltered scan should fan out")
    assert(pruned === 1, s"10-id range must plan one slice, got $pruned")
  }

  private def filterNodes(df: org.apache.spark.sql.DataFrame) =
    df.queryExecution.executedPlan.collect {
      case f: org.apache.spark.sql.execution.FilterExec => f
    }

  test("consumed filters do not reappear as a post-scan Filter") {
    val df = seq().filter(col("id") >= 10 && col("id") < 20).select("v")
    assert(filterNodes(df).isEmpty)
    assert(df.count() === 10)
  }

  test("residual (non-id) filters stay post-scan and stay correct") {
    val df = seq().filter(col("id") < 160 && col("bucket") === 3)
    assert(filterNodes(df).nonEmpty)
    assert(df.count() === 10) // ids 3, 19, 35, … 147
  }

  test("projection pushdown narrows the read schema") {
    val s = scanOf(seq().filter(col("id") >= 1).select("bucket", "v"))
    assert(s.scan.readSchema().fieldNames.toSet === Set("bucket", "v"))
  }

  test("empty pushed range plans zero partitions") {
    assert(seq().filter(col("id") >= N + 5).count() === 0)
  }

  // ---- SupportsPushDownAggregates (complete pushdown) ----------------------

  private def aggNodes(df: org.apache.spark.sql.DataFrame) = {
    // AQE wraps the fallback plan; its children are hidden from a
    // top-level collect until materialization, so unwrap explicitly
    val top = df.queryExecution.executedPlan
    val p = top match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case other => other
    }
    p.collect {
      case a: org.apache.spark.sql.execution.aggregate.BaseAggregateExec => a
    }
  }

  private def localScans(df: org.apache.spark.sql.DataFrame) =
    df.queryExecution.executedPlan.collect {
      case l: org.apache.spark.sql.execution.LocalTableScanExec => l
    }

  test("complete agg pushdown erases the Aggregate and matches a row loop") {
    // 5000 ids = 2 full (bucket, v) periods + a 1000-id remainder —
    // exercises both the whole-period closed form and the tail loop
    val lo = 17L
    val hi = 5000L
    val df = seq().filter(col("id") >= lo && col("id") < hi)
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"), sum(col("v")).as("sum_v"),
        min(col("id")).as("min_id"), max(col("id")).as("max_id"),
        min(col("v")).as("min_v"), max(col("v")).as("max_v"))
    assert(aggNodes(df).isEmpty, "aggregate must be fully pushed")
    assert(localScans(df).nonEmpty, "pushed agg must plan as a local scan")
    // independent reference: a plain Scala loop over the same range
    val ref = (lo until hi).map(id => (id % 16).toInt -> ((id * 37 + 11) % 1000, id))
      .groupBy(_._1).view.mapValues { g =>
        val vs = g.map(_._2._1); val ids = g.map(_._2._2)
        (g.size.toLong, vs.sum, ids.min, ids.max, vs.min, vs.max)
      }.toMap
    val got = df.collect().map { r =>
      r.getInt(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))
    }.toMap
    assert(got === ref)
  }

  test("pushed global aggregate over 1e14 ids answers from arithmetic") {
    val big = 100000000000000L // 10^14 — unscannable row-by-row
    val df = spark.read.format("graft-seq").option("end", big).load()
      .agg(count(lit(1)).as("n"), min(col("id")).as("min_id"),
        max(col("id")).as("max_id"))
    assert(aggNodes(df).isEmpty)
    val r = df.collect()(0)
    assert(r.getLong(0) === big)
    assert(r.getLong(1) === 0L)
    assert(r.getLong(2) === big - 1)
  }

  test("unsupported shape (SUM(id)) falls back to the row scan, correct") {
    val df = seq().filter(col("id") < 1000)
      .agg(sum(col("id")).as("s"), count(lit(1)).as("n"))
    assert(aggNodes(df).nonEmpty, "SUM(id) must NOT be pushed")
    val r = df.collect()(0)
    assert(r.getLong(0) === 999L * 1000L / 2L)
    assert(r.getLong(1) === 1000L)
  }

  test("pushed empty-range global aggregate keeps SQL semantics") {
    val df = seq().filter(col("id") >= N + 1)
      .agg(count(lit(1)).as("n"), min(col("v")).as("mv"))
    assert(aggNodes(df).isEmpty)
    val r = df.collect()(0)
    assert(r.getLong(0) === 0L)
    assert(r.isNullAt(1))
  }

  test("COUNT(col) on a non-null generated column pushes as COUNT(*)") {
    val df = seq().filter(col("id") < 160)
      .groupBy(col("bucket")).agg(count(col("payload")).as("n"))
    assert(aggNodes(df).isEmpty)
    assert(df.collect().map(_.getLong(1)).toSeq === Seq.fill(16)(10L))
  }

  // ---- TopN / Limit pushdown -----------------------------------------------

  private def planStr(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("ORDER BY id LIMIT pushes fully: no Sort, exact rows both directions") {
    val desc = seq().filter(col("id") >= 100)
      .select(col("id"), col("v")).orderBy(col("id").desc).limit(5)
    val pd = planStr(desc)
    assert(!pd.contains("Sort") && !pd.contains("TakeOrdered"), pd)
    assert(pd.contains("graft-seq topN"), pd)
    assert(desc.collect().map(_.getLong(0)).toSeq ===
      (N - 1 to N - 5 by -1).toSeq)
    val asc = seq().filter(col("id") >= 100)
      .select(col("id")).orderBy(col("id")).limit(4)
    assert(!planStr(asc).contains("Sort"), planStr(asc))
    assert(asc.collect().map(_.getLong(0)).toSeq === Seq(100L, 101L, 102L, 103L))
    // a unique leading key makes trailing sort keys dead — still pushed
    val multi = seq().orderBy(col("id").desc, col("v")).limit(3)
    assert(!planStr(multi).contains("Sort"), planStr(multi))
    assert(multi.collect().map(_.getLong(0)).toSeq ===
      (N - 1 to N - 3 by -1).toSeq)
  }

  test("ORDER BY a non-key column declines: engine sort kept, rows equal") {
    val byV = seq().select(col("id"), col("v"))
      .orderBy(col("v").desc, col("id")).limit(6)
    val p = planStr(byV)
    assert(p.contains("TakeOrdered") || p.contains("Sort"),
      s"non-key order must keep the engine sort:\n$p")
    // ...and the fallback result matches the formula-level ground truth
    val got = byV.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val exp = (0L until N).map(i => (i, sources.SeqSource.vOf(i)))
      .sortBy { case (i, v) => (-v, i) }.take(6)
    assert(got === exp)
  }

  test("bare LIMIT pushes fully and caps the scan at n rows") {
    val lim = seq().filter(col("id") >= 42).limit(3)
    val p = planStr(lim)
    assert(p.contains("graft-seq topN"), p)
    assert(!p.contains("GlobalLimit"), p)
    assert(lim.collect().map(_.getLong(0)).toSeq === Seq(42L, 43L, 44L))
    // limit larger than the pushed range: the whole range, nothing more
    val all = seq().filter(col("id") >= N - 2).limit(100)
    assert(all.collect().map(_.getLong(0)).toSeq === Seq(N - 2, N - 1))
  }

  // ---- storage-partitioned join (cluster=bucket, KeyGroupedPartitioning) --

  private def clustered() =
    spark.read.format("graft-seq").option("end", N)
      .option("cluster", "bucket").load()

  test("cluster=bucket plans one keyed partition per bucket") {
    val s = scanOf(clustered().select("bucket", "v"))
    assert(s.inputRDD.getNumPartitions === 16)
    // a pushed range spanning < 16 ids prunes whole buckets
    val pruned = scanOf(clustered()
      .filter(col("id") >= 100 && col("id") < 104).select("bucket"))
    assert(pruned.inputRDD.getNumPartitions === 4)
  }

  test("cluster=bucket serves the same rows as the plain scan") {
    val got = clustered().filter(col("id") < 200).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getString(3)))
      .toSet
    val ref = seq().filter(col("id") < 200).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getString(3)))
      .toSet
    assert(got === ref)
  }

  private def exchangesIn(plan: String): Boolean =
    plan.contains("Exchange") || plan.contains("ShuffleQueryStage")

  test("storage-partitioned join on (id, bucket) plans zero exchanges") {
    def spjQuery(c: Boolean) = {
      def t() = if (c) clustered() else seq()
      // merge hint: plan-local broadcast opt-out, so the test exercises
      // the shuffle-join path SPJ removes (a broadcast would also avoid
      // the shuffle, proving nothing about KeyGroupedPartitioning)
      t().join(
          t().filter(col("id") >= 160)
            .select(col("id"), col("bucket"), col("v").as("bv"))
            .hint("merge"),
          Seq("id", "bucket"))
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n"), sum(col("v") * col("bv")).as("s"))
    }
    val spj = spjQuery(c = true)
    val rows = spj.collect() // materialize so AQE's final plan is real
    assert(!exchangesIn(spj.queryExecution.executedPlan.toString),
      s"SPJ plan must carry no exchange:\n${spj.queryExecution.executedPlan}")
    // row parity with the ordinary shuffled plan
    val ref = spjQuery(c = false)
    assert(exchangesIn(ref.queryExecution.executedPlan.toString),
      "the unclustered reference plan should shuffle")
    assert(rows.map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet ===
      ref.collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet)
  }

  test("SPJ survives one side covering fewer buckets (pushPartValues)") {
    // the filtered side's pushed range spans only ids ≥ N-8 → 8 buckets;
    // pushPartValues aligns the two sides on the union of values
    val a = clustered()
    val b = clustered().filter(col("id") >= N - 8)
      .select(col("id"), col("bucket"), col("v").as("bv")).hint("merge")
    val j = a.join(b, Seq("id", "bucket")).select(col("id"), col("bv"))
    val rows = j.collect()
    assert(!exchangesIn(j.queryExecution.executedPlan.toString),
      s"partial-coverage SPJ must still avoid the shuffle:\n" +
        s"${j.queryExecution.executedPlan}")
    assert(rows.map(_.getLong(0)).toSet === (N - 8 until N).toSet)
  }

  // ---- SupportsRuntimeV2Filtering (connector-side dynamic pruning) --------

  private def withConf[A](k: String, v: String)(body: => A): A = {
    val prev = spark.conf.getOption(k)
    spark.conf.set(k, v)
    try body
    finally prev match {
      case Some(p) => spark.conf.set(k, p)
      case None => spark.conf.unset(k)
    }
  }

  test("runtime V2 filtering narrows the scan to the broadcast probe ids") {
    // 13 dim ids (97k for even k < 25) against the 10000-id fact range:
    // with dynamic pruning the fact scan must emit exactly the 13
    // matchable rows; with it disabled, the whole range. AQE off so the
    // scan node (and its metric) is reachable from a plan collect.
    def query() = {
      val dim = spark.range(0, 25).select((col("id") * 97L).as("id"))
        .filter(col("id") % 2 === 0) // the selective predicate DPP wants
      seq().join(broadcast(dim), Seq("id"))
        .agg(count(lit(1)).as("n"), sum(col("v")).as("sv"))
    }
    def run(): (Long, Long, Long) = {
      val df = query()
      val r = df.collect()(0)
      val scan = df.queryExecution.executedPlan.collectFirst {
        case b: BatchScanExec if b.toString.contains("graft-seq") => b
      }.getOrElse(fail("no graft-seq scan in plan"))
      (r.getLong(0), r.getLong(1), scan.metrics("numOutputRows").value)
    }
    withConf("spark.sql.adaptive.enabled", "false") {
      val (n1, sv1, scanRows) = run()
      val (n0, sv0, fullRows) = withConf(
        "spark.sql.optimizer.dynamicPartitionPruning.enabled", "false")(run())
      assert((n1, sv1) === (n0, sv0), "runtime filtering must not change results")
      assert(n1 === 13L)
      assert(fullRows === N, s"unfiltered scan should emit the range, got $fullRows")
      assert(scanRows === 13L,
        s"runtime-filtered scan must emit exactly the probe ids, got $scanRows")
    }
  }

  // ---- SupportsReportStatistics / SupportsReportOrdering -------------------

  test("reported statistics let a narrow pushed range broadcast unhinted") {
    // No broadcast() hint anywhere: the planner must read the scan's
    // exact post-pushdown numRows/sizeInBytes and pick BroadcastHashJoin
    // for the 50-id side against the full range — the catalog-statistics
    // contract that drives join strategy at 100 TB.
    val small = seq().filter(col("id") >= 100 && col("id") < 150)
      .select(col("id"), col("v").as("sv"))
    val big = seq().select(col("id"), col("v"))
    val j = big.join(small, Seq("id"))
      .agg(count(lit(1)).as("n"), sum(col("v") * col("sv")).as("s"))
    assert(j.queryExecution.executedPlan.toString
      .contains("BroadcastHashJoin"),
      j.queryExecution.executedPlan.toString.take(600))
    val r = j.collect()(0)
    assert(r.getLong(0) === 50L)
  }

  test("SPJ + reported ordering: join with zero exchanges AND zero sorts") {
    // cluster=bucket reports KeyGroupedPartitioning (no exchange) and
    // (id, bucket)-ascending per-partition ordering (no local sort):
    // the sort-merge join runs entirely from storage layout — the
    // full co-located-join contract a bucketed+sorted lakehouse table
    // provides, from the from-scratch connector.
    val a = clustered()
    val b = clustered().filter(col("id") >= 160)
      .select(col("id"), col("bucket"), col("v").as("bv")).hint("merge")
    val j = a.join(b, Seq("id", "bucket"))
      .groupBy(col("bucket")).agg(sum(col("v") * col("bv")).as("s"))
    j.collect()
    val plan = j.queryExecution.executedPlan.toString
    assert(!exchangesIn(plan), plan)
    assert(!plan.contains("Sort "), s"reported ordering must kill the sorts:\n$plan")
    assert(plan.contains("SortMergeJoin"), plan)
  }

  // ---- micro-batch streaming read ------------------------------------------

  test("micro-batch stream drains the range exactly once across batches") {
    val sink = "seq_stream_" + java.util.UUID.randomUUID().toString.take(8)
    val q = spark.readStream.format("graft-seq")
      .option("end", N).option("rowsPerBatch", 1024).load()
      .writeStream.format("memory").queryName(sink)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    try assert(q.awaitTermination(180000), "stream must drain and stop")
    finally q.stop()
    // admission control: 10000 ids at 1024/batch → ≥ 9 data batches
    assert(q.recentProgress.count(_.numInputRows > 0) >= 9,
      q.recentProgress.map(_.numInputRows).mkString(","))
    val rows = spark.table(sink)
    assert(rows.count() === N)
    // exactly-once across batch boundaries: every id once, values exact
    assert(rows.select(countDistinct(col("id"))).collect()(0).getLong(0) === N)
    val sums = rows.agg(sum(col("v")).as("sv"), max(col("id")).as("mx"))
      .collect()(0)
    assert(sums.getLong(0) === (0L until N).map(sources.SeqSource.vOf).sum)
    assert(sums.getLong(1) === N - 1)
    spark.catalog.dropTempView(sink)
  }

  test("micro-batch stream works on a clustered table too") {
    // the table advertises MICRO_BATCH_READ unconditionally, so the
    // clustered scan must serve a stream rather than throw at start
    val sink = "seq_cstream_" + java.util.UUID.randomUUID().toString.take(8)
    val q = spark.readStream.format("graft-seq")
      .option("end", 512).option("cluster", "bucket")
      .option("rowsPerBatch", 256).load()
      .writeStream.format("memory").queryName(sink)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    try assert(q.awaitTermination(180000), "stream must drain and stop")
    finally q.stop()
    assert(spark.table(sink).count() === 512)
    spark.catalog.dropTempView(sink)
  }

  // ---- columnar read path --------------------------------------------------

  test("graft-seq scans are columnar: ColumnarToRow bridge, exact rows") {
    val df = seq().filter(col("id") >= 16 && col("id") < 48)
      .select("id", "v", "payload")
    assert(df.queryExecution.executedPlan.toString.contains("ColumnarToRow"),
      df.queryExecution.executedPlan.toString)
    val rows = df.collect()
    assert(rows.length === 32)
    rows.foreach { r =>
      val id = r.getLong(0)
      assert(r.getLong(1) === (id * 37 + 11) % 1000)
      assert(r.getString(2) === "p" + (id % 7))
    }
  }

  test("columnar batches stay exact across the 4096-row batch boundary") {
    // declined agg pushdown (GROUP BY payload is unsupported) keeps the
    // aggregation ON the columnar scan, spanning multiple batches
    val got = seq().groupBy(col("payload")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exp = (0L until N).groupBy(sources.SeqSource.payloadOf)
      .view.mapValues(_.size.toLong).toMap
    assert(got === exp)
  }

  test("clustered and topN slices go columnar too, same results") {
    val c = clustered().filter(col("id") < 64).select("id", "bucket")
    assert(c.queryExecution.executedPlan.toString.contains("ColumnarToRow"))
    assert(c.collect().map(r => (r.getLong(0), r.getInt(1))).toSet ===
      (0L until 64L).map(i => (i, (i % 16).toInt)).toSet)
    val t = seq().orderBy(col("id").desc).limit(3).select("id")
    assert(t.queryExecution.executedPlan.toString.contains("ColumnarToRow"))
    assert(t.collect().map(_.getLong(0)).toSeq === (N - 1 to N - 3 by -1).toSeq)
  }

  test("TopN after pushed aggregation declines (agg plan wins, stays exact)") {
    val df = seq().filter(col("id") < 320)
      .groupBy(col("bucket")).agg(sum(col("v")).as("sv"))
      .orderBy(col("sv").desc).limit(3)
    assert(aggNodes(df).isEmpty, "aggregate must still push")
    val got = df.collect().map(r => (r.getInt(0), r.getLong(1))).toSeq
    val exp = (0L until 320L).groupBy(sources.SeqSource.bucketOf)
      .map { case (b, ids) => (b, ids.map(sources.SeqSource.vOf).sum) }
      .toSeq.sortBy { case (b, sv) => (-sv, b) }.take(3)
    // sort ties broken by bucket in both — sv values are distinct here
    assert(got.map(_._2).toSet === exp.map(_._2).toSet)
  }
}
