package graft.tools

import org.apache.spark.sql.SparkSession

import graft.pipeline.MapReduce

/** CLI mirror of the reference's job-submission surface
  * (`/root/reference/mapreduce/submit.py:21-96`): same flags, same
  * defaults. The job spec {input, output, mapper, reducer, num_mappers,
  * num_reducers} is identical; what differs is execution — the job runs
  * immediately on an in-process Spark session, whose driver/executor
  * scheduling replaces the Manager/Worker TCP protocol (SURVEY §3), so
  * there is no --host/--port/--shutdown: no long-running manager exists
  * to address or shut down. Mapper and reducer are executable paths,
  * piped over stdin/stdout per the reference contract (A3/A9).
  */
object Submit {

  private val usage =
    """usage: graft.tools.Submit [--input|-i DIR] [--output|-o DIR]
      |  [--mapper|-m EXEC] [--reducer|-r EXEC] [--nmappers N] [--nreducers N]
      |  [--job <next job's flags> ...]
      |`--job` separates job specs; jobs run FIFO in submission order.""".stripMargin

  /** A parsed job spec, defaults matching submit.py's. */
  final case class Job(
      input: String = "tests/testdata/input",
      output: String = "output",
      mapper: String = "tests/testdata/exec/wc_map.sh",
      reducer: String = "tests/testdata/exec/wc_reduce.sh",
      numMappers: Int = 2,
      numReducers: Int = 2)

  /** Split argv into job specs on `--job` separators (each group gets
    * its own defaults) — the CLI form of the reference manager's FIFO
    * job queue (`/root/reference/mapreduce/manager/__main__.py:29,
    * 51-57`): jobs run strictly in submission order, each reading its
    * own input and writing its own output directory. */
  def parseJobs(args: Array[String]): Seq[Job] = {
    val groups = args.foldLeft(List(Vector.empty[String])) {
      case (acc, "--job")  => Vector.empty[String] :: acc
      case (h :: t, a)     => (h :+ a) :: t
      case (Nil, a)        => List(Vector(a))
    }.reverse
    // a trailing/doubled --job would otherwise expand to a silent
    // all-defaults job; zero args (one empty group) keeps meaning the
    // default job, matching submit.py
    if (args.nonEmpty && groups.exists(_.isEmpty)) {
      System.err.println(s"empty job spec around a --job separator\n$usage")
      sys.exit(2)
    }
    groups.map(g => parse(g.toArray))
  }

  def parse(args: Array[String]): Job = {
    def intArg(v: String, flag: String): Int =
      try v.toInt catch {
        case _: NumberFormatException =>
          System.err.println(s"invalid integer for $flag: $v\n$usage")
          sys.exit(2)
      }
    var job = Job()
    var i = 0
    while (i < args.length) {
      if (i + 1 >= args.length) {
        System.err.println(s"missing value for ${args(i)}\n$usage")
        sys.exit(2)
      }
      args(i) match {
        case "--input" | "-i"   => job = job.copy(input = args(i + 1))
        case "--output" | "-o"  => job = job.copy(output = args(i + 1))
        case "--mapper" | "-m"  => job = job.copy(mapper = args(i + 1))
        case "--reducer" | "-r" => job = job.copy(reducer = args(i + 1))
        case "--nmappers"       =>
          job = job.copy(numMappers = intArg(args(i + 1), "--nmappers"))
        case "--nreducers"      =>
          job = job.copy(numReducers = intArg(args(i + 1), "--nreducers"))
        case a =>
          System.err.println(s"unknown argument: $a\n$usage")
          sys.exit(2)
      }
      i += 2
    }
    job
  }

  /** Run a parsed job on an existing session (separated from main so
    * tests can drive the full CLI path without owning session
    * lifecycle). */
  def run(spark: SparkSession, job: Job): Unit =
    MapReduce.runPipe(spark, job.input, job.output,
      mapCmd = job.mapper, reduceCmd = job.reducer,
      numReducers = job.numReducers, numMappers = Some(job.numMappers))

  def main(args: Array[String]): Unit = {
    val jobs = parseJobs(args)
    val spark = graft.Session.build("local[*]",
      math.max(jobs.map(_.numReducers).max, 4), "graft-submit")
    spark.sparkContext.setLogLevel("WARN")
    // FIFO: strictly sequential Spark actions, job i+1 starts only
    // after job i's sink is fully written (the manager's queue, A11)
    jobs.zipWithIndex.foreach { case (job, i) =>
      run(spark, job)
      println(s"[submit] job ${i + 1}/${jobs.length} done: " +
        s"${job.input} -> ${job.output} " +
        s"(M=${job.numMappers}, R=${job.numReducers})")
    }
    spark.stop()
  }
}
