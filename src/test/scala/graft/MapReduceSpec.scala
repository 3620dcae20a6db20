package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.MapReduce

/** Reference-parity semantics (SURVEY §2.B, §5 layer 3): word count with
  * `tr`-style tokenization (empty tokens counted), grep, executable
  * pipelines, MD5 partition routing, and `part-%05d` sink layout.
  */
class MapReduceSpec extends AnyFunSuite {

  lazy val spark: SparkSession = Spec.spark

  private def mkCorpus(lines: Seq[Seq[String]]): String = {
    val dir = Files.createTempDirectory("graft-corpus")
    lines.zipWithIndex.foreach { case (ls, i) =>
      Files.write(dir.resolve(f"file$i%02d"),
        ls.mkString("", "\n", "\n").getBytes("UTF-8"))
    }
    dir.toString
  }

  // the classic reference corpus plus a leading-space line that produces
  // an empty token under tr-tokenization (FIXTURES.md §A1) and a
  // bracket line: the reference's `tr '[ \t]' '\n'` SET1 is the four
  // characters `[`, space, tab, `]`, so brackets split tokens too
  private lazy val corpus = mkCorpus(Seq(
    Seq("Hello World Bye World"),
    Seq("Hello Hadoop Goodbye Hadoop", " hello"),
    Seq("Bye[World] Bye")))

  // wcMapTr tokens: ''×2, bye×3, goodbye, hadoop×2, hello×3, world×3
  private val wcExpected = Seq("\t2", "bye\t3", "goodbye\t1",
    "hadoop\t2", "hello\t3", "world\t3")

  private def readParts(dir: String): Seq[(String, Seq[String])] = {
    val d = Paths.get(dir)
    Files.list(d).toArray.map(_.asInstanceOf[java.nio.file.Path])
      .filter(_.getFileName.toString.startsWith("part-"))
      .sortBy(_.getFileName.toString)
      .map { p =>
        val content = new String(Files.readAllBytes(p), "UTF-8")
        p.getFileName.toString ->
          content.split("\n", -1).toSeq.filter(_.nonEmpty)
      }.toSeq
  }

  test("word count matches reference semantics incl. empty-token and bracket keys") {
    val out = Files.createTempDirectory("graft-wc").toString + "/out"
    MapReduce.wordCount(spark, corpus, out, numReducers = 2)
    val parts = readParts(out)
    assert(parts.map(_._1) == Seq("part-00000", "part-00001"))
    assert(parts.flatMap(_._2).sorted == wcExpected.sorted)
    // each part file must be internally key-sorted (test_worker_08 contract)
    parts.foreach { case (_, lines) => assert(lines == lines.sorted) }
  }

  test("wc_map.py semantics (B2): whitespace runs, empties dropped, case kept") {
    import spark.implicits._
    val kv = MapReduce.wcMapPy(Seq("Hello  hello\tB", " x ").toDS())
    val got = kv.collect().map(r => (r.getString(0), r.getString(1))).toSeq.sorted
    assert(got == Seq(("B", "1"), ("Hello", "1"), ("hello", "1"), ("x", "1")))
  }

  test("wc_reduce.sh semantics (B3): count per key equals sum-of-ones") {
    import spark.implicits._
    val kv = Seq(("a", "1"), ("a", "1"), ("b", "1")).toDF("key", "value")
    val got = MapReduce.reduceCount(kv).collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq.sorted
    assert(got == Seq(("a", "2"), ("b", "1")))
  }

  test("grep filters case-insensitively and drops blank lines") {
    val dir = mkCorpus(Seq(Seq("a Product line", "", "no match", "PRODUCT!")))
    val out = Files.createTempDirectory("graft-grep").toString + "/out"
    MapReduce.grep(spark, dir, out, query = "product", numReducers = 1)
    val all = readParts(out).flatMap(_._2)
    assert(all == Seq("PRODUCT!", "a Product line"))
  }

  test("executable pipeline job (runPipe) reproduces word count byte-for-byte") {
    val out = Files.createTempDirectory("graft-pipe").toString + "/out"
    MapReduce.runPipe(spark, corpus, out,
      // the reference's wc_map.sh / wc_reduce.sh pipelines VERBATIM
      // (tests/testdata/exec/wc_map.sh:13, wc_reduce.sh:14)
      mapCmd = """tr '[ \t]' '\n' | tr '[:upper:]' '[:lower:]' | awk '{print $1"\t1"}'""",
      reduceCmd = """cut -f1 | uniq -c | awk '{print $2"\t"$1}'""",
      numReducers = 2, numMappers = Some(2))
    val parts = readParts(out)
    assert(parts.map(_._1) == Seq("part-00000", "part-00001"))
    assert(parts.flatMap(_._2).sorted == wcExpected.sorted)
    // MD5 routing: '', hello, bye → partition 0; world, hadoop, goodbye → 1
    assert(parts.head._2.map(_.split("\t")(0)).toSet == Set("", "hello", "bye"))
    assert(parts(1)._2.map(l => l.split("\t")(0)).toSet ==
      Set("world", "hadoop", "goodbye"))
  }

  test("runPipe keeps the TRUE partition index when earlier partitions are empty") {
    val dir = mkCorpus(Seq(Seq("solo")))
    val out = Files.createTempDirectory("graft-solo").toString + "/out"
    MapReduce.runPipe(spark, dir, out,
      mapCmd = """tr '[ \t]' '\n' | tr '[:upper:]' '[:lower:]' | awk '{print $1"\t1"}'""",
      reduceCmd = """cut -f1 | uniq -c | awk '{print $2"\t"$1}'""",
      numReducers = 4)
    val expectIdx = new MapReduce.Md5Partitioner(4).getPartition("solo")
    val parts = readParts(out)
    assert(parts.map(_._1) == (0 until 4).map(i => f"part-$i%05d"))
    parts.zipWithIndex.foreach { case ((_, lines), i) =>
      assert(lines == (if (i == expectIdx) Seq("solo\t1") else Seq.empty),
        s"partition $i (expected data only in $expectIdx)")
    }
  }

  test("Md5Partitioner matches the reference's int(md5(key),16) % R") {
    val p4 = new MapReduce.Md5Partitioner(4)
    // expected values computed with Python hashlib (the reference's hash,
    // worker/__main__.py:62-65)
    assert(p4.getPartition("") == 2)
    assert(p4.getPartition("hello") == 2)
    assert(p4.getPartition("world") == 3)
    assert(p4.getPartition("bye") == 0)
    assert(p4.getPartition("hadoop") == 1)
    assert(p4.getPartition("goodbye") == 1)
  }

  test("empty partitions still produce empty part files (exactly R outputs)") {
    val dir = mkCorpus(Seq(Seq("solo")))
    val out = Files.createTempDirectory("graft-empty").toString + "/out"
    MapReduce.wordCount(spark, dir, out, numReducers = 4)
    val parts = readParts(out)
    assert(parts.map(_._1) ==
      (0 until 4).map(i => f"part-$i%05d"))
    assert(parts.flatMap(_._2) == Seq("solo\t1"))
  }

  test("sink overwrites pre-existing output (delete + recreate)") {
    val dir = mkCorpus(Seq(Seq("x y")))
    val out = Files.createTempDirectory("graft-ow").toString + "/out"
    Files.createDirectories(Paths.get(out))
    Files.write(Paths.get(out, "stale"), "junk".getBytes)
    MapReduce.wordCount(spark, dir, out, numReducers = 1)
    assert(!Files.exists(Paths.get(out, "stale")))
    assert(readParts(out).flatMap(_._2) == Seq("x\t1", "y\t1"))
  }
}
