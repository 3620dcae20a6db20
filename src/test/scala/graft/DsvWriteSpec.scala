package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The `graft-dsv` V2 write contract ([[sources.DsvTable]]): staged
  * temp files published by a driver-side atomic commit (reference
  * `part-%05d` layout), TRUNCATE overwrite, abort leaving the previous
  * table contents untouched, self-describing schema, and the
  * no-escaping encoding contract.
  */
class DsvWriteSpec extends AnyFunSuite {

  lazy val spark = Spec.spark

  private def freshDir(): String =
    java.nio.file.Files.createTempDirectory("graft-dsv-spec").toString + "/t"

  private def names(dir: String): Seq[String] = {
    val f = new java.io.File(dir)
    if (!f.exists()) Seq.empty
    else f.listFiles().map(_.getName).toSeq.sorted
  }

  private def write(df: org.apache.spark.sql.DataFrame, dir: String): Unit =
    df.write.format("graft-dsv").mode("overwrite")
      .option("path", dir).save()

  private def read(dir: String) =
    spark.read.format("graft-dsv").option("path", dir).load()

  test("round-trip preserves longs, ints, doubles, strings, and nulls") {
    import spark.implicits._
    val dir = freshDir()
    val df = Seq(
      (1L, 10, 1.5, Option("alpha")),
      (2L, 20, -0.25, Option.empty[String]),
      (3L, 30, 0.0, Option("b c d"))
    ).toDF("a", "b", "c", "s")
    write(df, dir)
    val back = read(dir)
    // _schema.ddl round-trips nullability too (NOT NULL in the DDL)
    assert(back.schema === df.schema)
    assert(back.collect().map(r => (r.get(0), r.get(1), r.get(2),
      Option(r.get(3)))).toSet ===
      Set((1L, 10, 1.5, Some("alpha")), (2L, 20, -0.25, None),
        (3L, 30, 0.0, Some("b c d"))))
  }

  test("commit publishes part-%05d + _SUCCESS + _schema.ddl, no temp residue") {
    import spark.implicits._
    val dir = freshDir()
    write(spark.range(100).select(col("id")).repartition(3), dir)
    val fs = names(dir)
    assert(fs.count(_.startsWith("part-")) === 3)
    assert(fs.filter(_.startsWith("part-")) ===
      Seq("part-00000", "part-00001", "part-00002"))
    assert(fs.contains("_SUCCESS") && fs.contains("_schema.ddl"))
    assert(!fs.contains("_tmp"), s"temp area must be cleaned: $fs")
    assert(read(dir).as[Long].collect().sorted.toSeq === (0L until 100L))
  }

  test("overwrite truncates: old parts vanish, not just get shadowed") {
    val dir = freshDir()
    write(spark.range(90).toDF("id").repartition(3), dir)
    assert(names(dir).count(_.startsWith("part-")) === 3)
    write(spark.range(7).toDF("id").repartition(1), dir)
    assert(names(dir).count(_.startsWith("part-")) === 1)
    assert(read(dir).count() === 7)
  }

  test("failed job aborts cleanly: previous table contents stay intact") {
    import spark.implicits._
    val dir = freshDir()
    write(spark.range(50).toDF("id").repartition(2), dir)
    val before = read(dir).as[Long].collect().sorted.toSeq
    // an overwrite whose partition 1 always throws: the job fails,
    // BatchWrite.abort runs, and the PREVIOUS publish must be intact —
    // the atomic-publish property (nothing a task wrote is visible,
    // truncate never happened because commit never ran)
    val poisoned = spark.range(40).as[Long].repartition(2)
      .mapPartitions { it =>
        if (org.apache.spark.TaskContext.get().partitionId() == 1)
          throw new RuntimeException("poisoned partition")
        it
      }.toDF("id")
    intercept[Exception] {
      poisoned.write.format("graft-dsv").mode("overwrite")
        .option("path", dir).save()
    }
    assert(read(dir).as[Long].collect().sorted.toSeq === before,
      "previous contents must survive a failed overwrite")
    assert(!names(dir).contains("_tmp"),
      "job-level abort must remove the temp area")
  }

  test("strings containing the delimiter are rejected with a clear error") {
    import spark.implicits._
    val dir = freshDir()
    val e = intercept[Exception] {
      write(Seq(("bad|cell", 1L)).toDF("s", "n"), dir)
    }
    assert(e.getMessage != null)
  }

  test("unsupported column types are rejected at write-builder time") {
    import spark.implicits._
    val dir = freshDir()
    intercept[Exception] {
      write(Seq((java.sql.Date.valueOf("2026-01-01"), 1L)).toDF("d", "n"),
        dir)
    }
  }

  test("streaming sink: multi-epoch append, exactly-once across a restart") {
    import java.nio.file.Files
    val root = Files.createTempDirectory("graft-dsv-stream").toString
    val in = Files.createDirectories(
      java.nio.file.Paths.get(s"$root/in")).toString
    val dir = s"$root/t"
    def runOnce(): Unit = {
      val q = spark.readStream.text(in)
        .selectExpr("CAST(value AS BIGINT) AS id")
        .writeStream.format("graft-dsv")
        .option("path", dir)
        .option("checkpointLocation", s"$root/ckpt")
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.processAllAvailable(); q.stop()
    }
    Files.writeString(java.nio.file.Paths.get(s"$in/batch1.txt"),
      (1 to 5).mkString("\n"))
    runOnce()
    // restart with the same checkpoint: committed epochs must not
    // replay into the sink — batch1's rows appear exactly once
    Files.writeString(java.nio.file.Paths.get(s"$in/batch2.txt"),
      (6 to 8).mkString("\n"))
    runOnce()
    val back = read(dir).collect().map(_.getLong(0)).sorted.toSeq
    assert(back == (1L to 8L),
      s"exactly-once across the restart violated: $back")
    val files = names(dir)
    assert(files.count(_.startsWith("part-e")) >= 2, files.toString)
    assert(files.count(_.startsWith("_epoch-")) >= 2, files.toString)
    assert(!files.contains("_tmp"), "no temp residue after commits")
  }

  test("a replayed epoch commit is a temp-discarding no-op (fence)") {
    // drive the StreamingWrite contract directly: commit epoch 0, then
    // re-run the epoch (post-restart re-commit of the same epochId) —
    // the _epoch-0 marker must turn the second publish into a no-op
    import org.apache.spark.sql.connector.write.PhysicalWriteInfo
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.types.StructType
    import org.apache.spark.unsafe.types.UTF8String
    spark // force the session: the factory resolves SparkSession.active
    val dir = freshDir()
    val schema = StructType.fromDDL("id BIGINT, s STRING")
    val sw = new sources.DsvWriteBuilder(dir, schema, "specq")
      .build().toStreaming
    val info = new PhysicalWriteInfo { override def numPartitions(): Int = 1 }
    def runEpoch(): Unit = {
      val w = sw.createStreamingWriterFactory(info).createWriter(0, 0L, 0L)
      w.write(InternalRow(7L, UTF8String.fromString("x")))
      val msg = w.commit()
      sw.commit(0L, Array(msg))
    }
    runEpoch()
    runEpoch() // replay of epoch 0
    val rows = read(dir).collect()
    assert(rows.length == 1, s"replayed epoch doubled rows: ${rows.length}")
    assert(names(dir).count(_.startsWith("part-e")) == 1)
    assert(!names(dir).contains("_tmp"), "replay attempt's temps linger")
    // the fence is scoped by the STREAMING QUERY id: a NEW query
    // appending to this directory restarts its epoch ids at 0, and its
    // epoch 0 must publish — a shared marker namespace would silently
    // discard it as a "replay"
    val sw2 = new sources.DsvWriteBuilder(dir, schema, "specq-other")
      .build().toStreaming
    val w2 = sw2.createStreamingWriterFactory(info).createWriter(0, 0L, 0L)
    w2.write(InternalRow(8L, UTF8String.fromString("y")))
    sw2.commit(0L, Array(w2.commit()))
    assert(read(dir).collect().length == 2,
      "a new query's epoch 0 was fenced out by a predecessor's marker")
  }

  test("replay after a crash between renames and marker recovers, rows once") {
    // crash window: epoch 0's parts renamed into place, driver died
    // before _epoch marker creation. Unmarked parts were never
    // acknowledged, so the replay must SUPERSEDE them wholesale —
    // delete-then-publish — not keep whichever old dests exist
    // (mixing two attempts' outputs breaks exactly-once when the
    // row-to-partition mapping differs between attempts).
    import org.apache.spark.sql.connector.write.PhysicalWriteInfo
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.types.StructType
    spark // force the session: the factory resolves SparkSession.active
    val dir = freshDir()
    val schema = StructType.fromDDL("id BIGINT")
    val sw = new sources.DsvWriteBuilder(dir, schema, "specq3")
      .build().toStreaming
    def attempt(rowsByPid: Seq[Seq[Long]]): Unit = {
      val info = new PhysicalWriteInfo {
        override def numPartitions(): Int = rowsByPid.size
      }
      val msgs = rowsByPid.zipWithIndex.map { case (rs, pid) =>
        val w = sw.createStreamingWriterFactory(info)
          .createWriter(pid, pid.toLong, 0L)
        rs.foreach(r => w.write(InternalRow(r)))
        w.commit()
      }
      sw.commit(0L, msgs.toArray)
    }
    // attempt 1: ONE partition carrying both rows
    attempt(Seq(Seq(42L, 43L)))
    // simulate the crash window: marker gone, parts present
    val marker = names(dir).find(_.startsWith("_epoch-")).get
    assert(new java.io.File(dir, marker).delete())
    // the replay re-executes with DIFFERENT partitioning (restart
    // changed spark.sql.shuffle.partitions): two partitions, one row
    // each. The old mixed-attempt behavior would keep attempt 1's p0
    // (both rows) AND publish attempt 2's p1 (43) → 43 doubled.
    attempt(Seq(Seq(42L), Seq(43L)))
    val rows = read(dir).collect().map(_.getLong(0)).sorted.toSeq
    assert(rows == Seq(42L, 43L),
      s"recovery replay mixed two attempts' outputs: $rows")
    assert(names(dir).exists(_.startsWith("_epoch-")), "marker not restored")
    assert(!names(dir).contains("_tmp"), "replay temps linger")
  }

  test("committed-epoch markers are reaped beyond a small tail") {
    // one marker per micro-batch forever would bloat the directory
    // listing every read and commit globs; only the offset-log tail
    // can ever replay, so older markers are dead weight
    import org.apache.spark.sql.connector.write.PhysicalWriteInfo
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.types.StructType
    spark
    val dir = freshDir()
    val schema = StructType.fromDDL("id BIGINT")
    val sw = new sources.DsvWriteBuilder(dir, schema, "specq4")
      .build().toStreaming
    val info = new PhysicalWriteInfo { override def numPartitions(): Int = 1 }
    (0L to 9L).foreach { epoch =>
      val w = sw.createStreamingWriterFactory(info).createWriter(0, 0L, epoch)
      w.write(InternalRow(epoch))
      sw.commit(epoch, Array(w.commit()))
    }
    val markers = names(dir).filter(_.startsWith("_epoch-"))
    val tail = sources.DsvStreamingWrite.MARKER_TAIL
    assert(markers.size <= tail + 1,
      s"markers not reaped beyond the tail: $markers")
    assert(markers.contains("_epoch-specq4-9"), markers.toString)
    // the newest epoch — the only one Spark can replay — still fences
    val w = sw.createStreamingWriterFactory(info).createWriter(0, 0L, 9L)
    w.write(InternalRow(9L))
    sw.commit(9L, Array(w.commit()))
    assert(read(dir).count() == 10, "replay of the newest epoch doubled rows")
    // all ten epochs' data parts are intact
    assert(names(dir).count(_.startsWith("part-e")) == 10)
  }

  test("batch append into a non-empty table is refused before any rename") {
    import spark.implicits._
    val dir = freshDir()
    write(Seq((1L, "a")).toDF("n", "s"), dir)
    val e = intercept[Exception] {
      Seq((2L, "b")).toDF("n", "s").write.format("graft-dsv")
        .mode("append").option("path", dir).save()
    }
    assert(e.getMessage != null)
    // the refusal is atomic: the original table is untouched
    assert(read(dir).collect().map(r => (r.getLong(0), r.getString(1)))
      .toSeq == Seq((1L, "a")))
  }

  test("streaming write rejects the truncate regime (append-only)") {
    import org.apache.spark.sql.types.StructType
    val schema = StructType.fromDDL("id BIGINT")
    val b = new sources.DsvWriteBuilder(freshDir(), schema, "specq2")
    intercept[IllegalArgumentException] {
      b.truncate().build().toStreaming
    }
  }
}
