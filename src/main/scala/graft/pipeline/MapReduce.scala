package graft.pipeline

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths}
import java.security.MessageDigest

import org.apache.spark.Partitioner
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Reference-parity map/reduce job surface (SURVEY.md §1, §2.A).
  *
  * The reference engine's data model is: a dataset is a directory of
  * UTF-8 text files, a record is one line, and intermediate/final
  * records are TAB-separated `key\tvalue` strings where the key is the
  * text before the first `\t`
  * (`/root/reference/mapreduce/worker/__main__.py:183`). A job is
  * map → hash-partition-by-key → per-partition sort → reduce → `part-%05d`
  * files (`/root/reference/mapreduce/manager/__main__.py:181-192`).
  *
  * Here that entire lifecycle is one declarative Spark plan: the shuffle
  * IS the partition/sort/merge machinery (boundaries #1–#10 of SURVEY §3
  * collapse into one stage boundary). Mappers/reducers are either
  * composable `DataFrame` transforms (codegen'd, the scale path) or
  * arbitrary stdin/stdout executables via `RDD.pipe` — exact parity with
  * the reference's executable contract
  * (`/root/reference/mapreduce/worker/__main__.py:167-186`, `:218-252`).
  */
object MapReduce {

  /** A mapper turns input lines into KV rows (`key`, `value` strings);
    * one line may produce 0..N records, like a streaming executable. */
  type Mapper = Dataset[String] => DataFrame

  /** A reducer sees, per shuffle partition, a key-sorted KV stream. */
  type Reducer = DataFrame => DataFrame

  // ---------------------------------------------------------------- sources

  /** Directory-of-text-files source (reference A1:
    * `manager/__main__.py:320-327`). Spark enumerates and splits the
    * files itself; at 100 TB this scales with `maxPartitionBytes`
    * instead of one-task-per-file. */
  def textDir(spark: SparkSession, dir: String): Dataset[String] =
    spark.read.textFile(dir)

  // ---------------------------------------------------------------- mappers

  /** Word-count mapper, `wc_map.sh` semantics (reference B1): split on
    * single space/tab — AND literal square brackets: the reference's
    * `tr '[ \t]' '\n'` has a 4-character SET1 (`[`, space, tab, `]`), so
    * brackets are token separators too. Empty tokens are KEPT (each
    * separator becomes a newline), then lowercase, emit `(token, "1")`.
    * Empty-string keys are legal and must survive (SURVEY §1.2). */
  val wcMapTr: Mapper = lines =>
    lines.select(explode(split(lower(col("value")), "[\\[\\] \t]", -1)).as("key"))
      .select(col("key"), lit("1").as("value"))

  /** Word-count mapper, `wc_map.py` semantics (reference B2): Python
    * `str.split()` — split on whitespace runs, dropping empty tokens,
    * no lowercasing. */
  val wcMapPy: Mapper = lines =>
    lines.select(explode(split(col("value"), "\\s+", -1)).as("key"))
      .filter(length(col("key")) > 0)
      .select(col("key"), lit("1").as("value"))

  /** Grep mapper (reference B5, `grep_map.py:12-28`): the reference
    * `strip()`s each line first, drops blanks, then matches the query
    * case-insensitively and emits `("1", stripped_line)` — so the value
    * is the TRIMMED line. (The reference's grep_reduce.py additionally
    * drops matched lines that themselves contain a tab —
    * `len(line.split("\t")) != 2` — an artifact of its untyped
    * `key\tvalue` wire format; our reducer sees a typed (key, value) row
    * so no such line can be malformed: intentional divergence.) */
  def grepMap(query: String): Mapper = lines =>
    lines.select(trim(col("value")).as("value"))
      .filter(length(col("value")) > 0 &&
        lower(col("value")).contains(query.toLowerCase))
      .select(lit("1").as("key"), col("value"))

  /** Arbitrary-executable mapper (reference A3): stream lines through a
    * shell pipeline, one subprocess per partition (the reference runs one
    * per input file — same contract, better amortization). */
  def pipeMap(cmd: String): Mapper = { lines =>
    val spark = lines.sparkSession
    import spark.implicits._
    lines.rdd.pipe(Seq("/bin/sh", "-c", cmd))
      .map { line =>
        val i = line.indexOf('\t')
        if (i < 0) (line, "") else (line.substring(0, i), line.substring(i + 1))
      }
      .toDF("key", "value")
  }

  // ---------------------------------------------------------------- reducers

  /** `wc_reduce.py` semantics (reference B4): group by key, SUM of int
    * values. Spark adds map-side partial aggregation — an allowed
    * improvement, results identical (SURVEY §2.B). */
  val reduceSum: Reducer = kv =>
    kv.groupBy(col("key"))
      .agg(sum(col("value").cast("long")).cast("string").as("value"))

  /** `wc_reduce.sh` semantics (reference B3): count per key. */
  val reduceCount: Reducer = kv =>
    kv.groupBy(col("key")).agg(count(lit(1)).cast("string").as("value"))

  /** `grep_reduce.py` semantics (reference B6): project the value,
    * dropping malformed rows is a no-op here (schema is enforced). */
  val reduceValues: Reducer = kv => kv.select(col("value"))

  /** Arbitrary-executable reducer (reference A9): the executable sees a
    * key-sorted stream per partition, exactly like the reference's
    * `heapq.merge` output (`worker/__main__.py:248`). */
  def pipeReduce(cmd: String): Reducer = { kv =>
    val spark = kv.sparkSession
    import spark.implicits._
    kv.select(concat_ws("\t", col("key"), col("value")).as("line"))
      .as[String]
      .rdd.pipe(Seq("/bin/sh", "-c", cmd))
      .map { line =>
        val i = line.indexOf('\t')
        if (i < 0) (line, "") else (line.substring(0, i), line.substring(i + 1))
      }
      .toDF("key", "value")
  }

  // ------------------------------------------------------------ partitioning

  /** Bit-exact reference partition routing: `int(md5(key),16) % R`
    * (`/root/reference/mapreduce/worker/__main__.py:62-65`). Only the
    * intermediate layout depends on this — final results don't — but it
    * makes per-partition outputs byte-comparable with the reference. */
  final class Md5Partitioner(r: Int) extends Partitioner {
    override def numPartitions: Int = r
    override def getPartition(key: Any): Int = {
      val d = MessageDigest.getInstance("MD5")
        .digest(String.valueOf(key).getBytes(StandardCharsets.UTF_8))
      (BigInt(1, d) % r).toInt
    }
  }

  /** Extract the partition key of a full `key\tvalue` line — the text
    * before the first tab (`worker/__main__.py:183`). */
  private def keyOf(line: String): String = {
    val i = line.indexOf('\t')
    if (i < 0) line else line.substring(0, i)
  }

  // ------------------------------------------------------------------- jobs

  /** Directory source with an explicit map-task-count floor, mirroring
    * the reference job spec's `num_mappers`
    * (`manager/__main__.py:181-192`, round-robin file split `:330-334`).
    * Spark splits by bytes rather than whole files — same parallelism
    * contract, and it still scales when one file is 10 TB. */
  def textDirM(spark: SparkSession, dir: String,
               numMappers: Option[Int]): Dataset[String] = {
    import spark.implicits._
    numMappers match {
      case Some(m) => spark.createDataset(spark.sparkContext.textFile(dir, m))
      case None => textDir(spark, dir)
    }
  }

  /** Run a job with DataFrame mapper/reducer: the idiomatic scale path.
    * One shuffle (`repartition(R, key)`), per-partition key sort, reduce,
    * `part-%05d` output files — the reference's whole lifecycle
    * (SURVEY §3) as a single Spark action. */
  def run(spark: SparkSession, input: String, output: String,
          mapper: Mapper, reducer: Reducer, numReducers: Int,
          numMappers: Option[Int] = None): Unit = {
    val kv = mapper(textDirM(spark, input, numMappers))
    val shuffled = kv.repartition(numReducers, col("key"))
      .sortWithinPartitions("key", "value")
    val out = reducer(shuffled)
    // Each part file must be internally key-sorted and keyed rows must be
    // co-located by key (tests/test_worker_08.py final asserts): partition
    // reduce output by key where one exists, by whole line otherwise.
    val lines =
      if (out.columns.contains("key"))
        out.repartition(numReducers, col("key"))
          .sortWithinPartitions("key", "value")
          .select(concat_ws("\t", col("key"), col("value")).as("line"))
      else
        out.select(col("value").as("line"))
          .repartition(numReducers, col("line"))
          .sortWithinPartitions("line")
    writePartFiles(lines, output, numReducers, preservePartitions = true)
  }

  /** Executable-parity job: MD5 partition routing + whole-line byte sort
    * + subprocess reducer over the sorted stream — byte-compatible with
    * the reference pipeline end to end. */
  def runPipe(spark: SparkSession, input: String, output: String,
              mapCmd: String, reduceCmd: String, numReducers: Int,
              numMappers: Option[Int] = None): Unit = {
    import spark.implicits._
    val mapped = textDirM(spark, input, numMappers).rdd
      .pipe(Seq("/bin/sh", "-c", mapCmd))
    val sorted = mapped.map(line => (line, ()))
      .repartitionAndSortWithinPartitions(new Partitioner {
        private val md5 = new Md5Partitioner(numReducers)
        override def numPartitions: Int = numReducers
        override def getPartition(key: Any): Int =
          md5.getPartition(keyOf(String.valueOf(key)))
      })
      .keys
    val reduced = sorted.pipe(Seq("/bin/sh", "-c", reduceCmd)).toDS()
    writePartFiles(reduced.toDF("line"), output, numReducers,
      preservePartitions = true)
  }

  /** Overwrite-sink with reference file naming: delete + recreate the
    * output dir (`manager/__main__.py:344-355`), emit exactly R files
    * named `part-%05d` (`worker/__main__.py:237-250`).
    *
    * Spark emits NO file for an empty shuffle partition and names files
    * `part-NNNNN-<uuid>`; the reference names each reduce output by its
    * TRUE partition number (`worker/__main__.py:237`: part_num from the
    * input path). So each surviving file is renamed to its original
    * partition index (parsed from the Spark file name — sequential
    * renumbering would shift data into lower-numbered parts whenever an
    * empty partition precedes a non-empty one), and empty `part-%05d`
    * files are created only for truly-empty partitions. */
  def writePartFiles(lines: DataFrame, output: String, numReducers: Int,
                     preservePartitions: Boolean = false): Unit = {
    val tmp = output + ".spark-tmp"
    val df = if (preservePartitions) lines
      else lines.repartition(numReducers, col("line")).sortWithinPartitions("line")
    df.write.mode("overwrite").text(tmp)
    val outDir = Paths.get(output)
    deleteRecursively(outDir)
    Files.createDirectories(outDir)
    val stream = Files.list(Paths.get(tmp))
    val parts =
      try stream.toArray.map(_.asInstanceOf[Path]) finally stream.close()
    val written = parts
      .filter(_.getFileName.toString.startsWith("part-"))
      .map { p =>
        // Spark task output: part-NNNNN-<uuid>[.ext]; NNNNN is the
        // partition index this file's rows were shuffled to.
        val idx = p.getFileName.toString.stripPrefix("part-")
          .takeWhile(_.isDigit).toInt
        Files.move(p, outDir.resolve(f"part-$idx%05d"))
        idx
      }.toSet
    (0 until numReducers).filterNot(written).foreach { i =>
      Files.createFile(outDir.resolve(f"part-$i%05d"))
    }
    deleteRecursively(Paths.get(tmp))
  }

  private def deleteRecursively(p: Path): Unit =
    if (Files.exists(p)) {
      Files.walk(p).sorted(java.util.Comparator.reverseOrder[Path]())
        .forEach(f => Files.delete(f))
    }

  // --------------------------------------------------------- canonical jobs

  /** The reference's word-count query end to end (B1 + B4). */
  def wordCount(spark: SparkSession, input: String, output: String,
                numReducers: Int = 1): Unit =
    run(spark, input, output, wcMapTr, reduceSum, numReducers)

  /** The reference's grep query end to end (B5 + B6). */
  def grep(spark: SparkSession, input: String, output: String,
           query: String = "product", numReducers: Int = 1): Unit =
    run(spark, input, output, grepMap(query), reduceValues, numReducers)
}
