ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "mapreduce_googlespark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
run / fork := true
// Pass the forked JVM's stdout through RAW (no sbt `[info]` prefix):
// Bench/Verify emit one machine-parsed JSON line on stdout, and a
// line-oriented downstream parser must see it unwrapped. Spark logs go
// to stderr, so stdout stays clean for the contract line.
Compile / run / outputStrategy := Some(StdoutOutput)
// Spark 4.x on JDK 17 needs these when SparkSession is created outside
// spark-submit (which normally injects them). Matches
// org.apache.spark.launcher.JavaModuleOptions.defaultModuleOptions().
val jdk17AddOpens = Seq(
  "java.base/java.lang", "java.base/java.lang.invoke",
  "java.base/java.lang.reflect", "java.base/java.io",
  "java.base/java.net", "java.base/java.nio",
  "java.base/java.util", "java.base/java.util.concurrent",
  "java.base/java.util.concurrent.atomic",
  "java.base/sun.nio.ch", "java.base/sun.nio.cs",
  "java.base/sun.security.action", "java.base/sun.util.calendar",
).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
// Heap sizing: FIXED (Xms = Xmx), CAPPED at 12 GiB regardless of a
// larger SPARK_DRIVER_MEM, and PRE-TOUCHED at JVM start. Root cause
// (round-6 forensics, SURVEY §11): this container's memory backend
// services first-touch page faults slowly and DEGRADES as the guest's
// touched high-water mark grows (measured: 4 GiB pre-touch 2.4 s,
// 12 GiB 23-65 s, 24 GiB > 8 min), so any JVM whose committed heap
// keeps growing mid-run — exactly what G1 does under a 91 GiB Xmx,
// expanding and re-siting young regions adaptively — stalls whichever
// query allocates across the virgin-page frontier next, for 10-230 s
// at a time (the roaming heavy-query outlier every round has chased).
// Thread dumps during those stalls show sys-time-dominated young GCs
// (User=0.00s Sys=7.80s) and near-idle CPUs. A fixed 12 GiB heap
// stays under the degradation knee, covers the workload's ~12 GiB
// peak RSS at sf0.1/local[32], and with AlwaysPreTouch the whole
// first-touch cost lands at JVM startup, OUTSIDE every per-query
// timer; G1 never shrinks below Xms, so pages fault once and stay
// resident. An explicit -Xmx/-Xms in SPARK_GRAFT_JVM_EXTRA still
// overrides (it is appended last).
val graftHeap: String = {
  val req = sys.env.getOrElse("SPARK_DRIVER_MEM", "8g").trim.toLowerCase
  val mb = try {
    if (req.endsWith("t")) req.dropRight(1).toLong * 1024 * 1024
    else if (req.endsWith("g")) req.dropRight(1).toLong * 1024
    else if (req.endsWith("m")) req.dropRight(1).toLong
    else if (req.endsWith("k")) req.dropRight(1).toLong / 1024
    else req.toLong / (1024 * 1024) // bare bytes
  } catch { case _: NumberFormatException => 8192L }
  // Floor: a sub-MiB request (bare bytes < 2^20, or a small 'k' value)
  // would truncate to -Xmx0m and the JVM refuses to start; no real
  // driver wants less than 1 GiB anyway, so clamp instead of failing.
  s"${math.min(math.max(mb, 1024L), 12 * 1024L)}m"
}
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx$graftHeap", s"-Xms$graftHeap", "-XX:+AlwaysPreTouch",
) ++
  // Opt-in GC logging for bench-stall forensics (VERDICT r5 #1):
  // SPARK_GRAFT_GCLOG=/path/gc.log
  sys.env.get("SPARK_GRAFT_GCLOG").map(p => s"-Xlog:gc*:file=$p").toSeq ++
  // Opt-in extra JVM flags for isolation experiments (e.g. a GC choice)
  sys.env.get("SPARK_GRAFT_JVM_EXTRA").toSeq.flatMap(_.split("\\s+"))
