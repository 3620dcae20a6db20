package graft

import org.apache.spark.sql.SparkSession

/** One shared local SparkSession for the whole test JVM. */
object Spec {
  lazy val spark: SparkSession = {
    val s = Session.build("local[4]", 4, "graft-test")
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** Smallest fixture scale — correctness-only specs run here. */
  val sfDir = "/root/testdata/sf0.001"
}
