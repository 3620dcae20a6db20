package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Sinks

/** Compaction sink: many tiny files in, bounded file count out, content
  * identical. */
class SinksSpec extends AnyFunSuite {

  lazy val spark = Spec.spark
  import spark.implicits._

  private def parquetFiles(dir: String): Seq[java.io.File] =
    new java.io.File(dir).listFiles().toSeq
      .filter(f => f.getName.endsWith(".parquet") && !f.getName.startsWith("."))

  test("writeCompacted bounds the output file count and keeps every row") {
    val scratch = Files.createTempDirectory("graft-compact").toString
    val small = s"$scratch/small"
    val compacted = s"$scratch/compacted"
    // 40 writers over 200 rows → a directory of tiny files
    (0 until 200).map(i => (i.toLong, s"row-$i")).toDF("id", "payload")
      .repartition(40).write.parquet(small)
    assert(parquetFiles(small).size == 40)

    val src = spark.read.parquet(small)
    val n = Sinks.writeCompacted(src, compacted, recordsPerFile = 50)
    assert(n == 200)
    // ceil(200 / 50) = 4 writers; round-robin isn't perfectly even, so a
    // writer may overflow the cap into one extra file — the guarantees
    // are "far fewer files than the input" and the per-file hard cap,
    // not an exact count
    val files = parquetFiles(compacted)
    assert(files.size >= 4 && files.size <= 8,
      s"expected ~4 compacted files, got ${files.size}")
    files.foreach { f =>
      val rows = spark.read.parquet(f.toString).count()
      assert(rows <= 50, s"${f.getName} exceeds the 50-record cap: $rows")
    }

    val back = spark.read.parquet(compacted)
    assert(back.count() == 200)
    assert(back.orderBy("id").collect().map(_.getLong(0)).toSeq ==
      (0L until 200L))
  }
}
