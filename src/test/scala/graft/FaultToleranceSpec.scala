package graft

import java.util.concurrent.TimeUnit

import scala.jdk.CollectionConverters._

import org.scalatest.funsuite.AnyFunSuite

/** A13 fault-tolerance drills (SURVEY §2.A): the session config in
  * [[graft.Session.build]] must be exercised, not just written. Each
  * scenario needs its own SparkContext with a different master
  * (`local[4,2]` for a retry budget; `local-cluster` because Spark's
  * speculation thread is off on purely local masters), and a JVM holds
  * one SparkContext — so [[graft.tools.FaultDemo]] runs in a spawned
  * JVM with this JVM's classpath and module opens. */
class FaultToleranceSpec extends AnyFunSuite {

  private def runDemo(mode: String, timeoutSec: Long): (Int, String) = {
    val javaBin = sys.props("java.home") + "/bin/java"
    val cmd = Seq(javaBin) ++ graft.tools.FaultDemo.jvmOpens ++
      Seq("-Xmx2g", "-cp",
        sys.props("java.class.path"), "graft.tools.FaultDemo", mode)
    val pb = new ProcessBuilder(cmd.asJava)
    // what bin/load-spark-env.sh would set for a worker: where the
    // distribution lives, and its scala suffix (the in-process Worker
    // builds executor launch commands from these)
    pb.environment().put("SPARK_HOME", "/opt/spark")
    pb.environment().put("SPARK_SCALA_VERSION", "2.13")
    pb.redirectErrorStream(true)
    val p = pb.start()
    val buf = new java.io.ByteArrayOutputStream()
    val reader = new Thread(() => p.getInputStream.transferTo(buf))
    reader.setDaemon(true)
    reader.start()
    val done = p.waitFor(timeoutSec, TimeUnit.SECONDS)
    if (!done) p.destroyForcibly()
    reader.join(5000)
    (if (done) p.exitValue() else -1, buf.toString("UTF-8"))
  }

  test("planted task failure is retried; the job still completes (A13)") {
    val (rc, out) = runDemo("retry", 120)
    assert(rc == 0, s"retry drill failed (rc=$rc):\n${out.takeRight(2000)}")
    assert(out.contains("RETRY result=OK"))
  }

  test("straggler partition is speculatively re-launched (A13 slow-worker)") {
    val (rc, out) = runDemo("speculation", 180)
    assert(rc == 0,
      s"speculation drill failed (rc=$rc):\n${out.takeRight(2000)}")
    assert(out.contains("SPECULATION result=OK"))
  }

  test("a retried sink task inside one epoch keeps exactly-once (DSv2 write)") {
    val (rc, out) = runDemo("sinkretry", 180)
    assert(rc == 0,
      s"sink-retry drill failed (rc=$rc):\n${out.takeRight(2000)}")
    assert(out.contains("SINKRETRY result=OK"))
  }

  test("a worker killed mid-job loses its executor; the job still completes") {
    val (rc, out) = runDemo("workerloss", 180)
    assert(rc == 0,
      s"worker-loss drill failed (rc=$rc):\n${out.takeRight(2000)}")
    assert(out.contains("WORKERLOSS result=OK"))
  }
}
