package graft

/** Shared `SPARK_GRAFT_ONLY` subset contract for the CLI mains: a
  * comma-separated query-name allowlist for local iteration, where an
  * unknown name must fail loudly (exit 2) rather than silently select
  * nothing and exit 0. */
object QuerySubset {

  def select(tag: String): Seq[(String, (org.apache.spark.sql.SparkSession,
      String) => org.apache.spark.sql.DataFrame)] = {
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    only.foreach { names =>
      val unknown = names -- SparkEntry.queries.keySet
      if (unknown.nonEmpty) {
        System.err.println(
          s"[$tag] unknown SPARK_GRAFT_ONLY names: ${unknown.mkString(", ")}")
        sys.exit(2)
      }
    }
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
  }
}
