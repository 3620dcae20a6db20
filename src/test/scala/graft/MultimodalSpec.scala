package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Multimodal
import graft.operators.Multimodal.{MediaCodec, MediaRow}

/** The decode stub is deterministic — assert exact feature values and
  * that the Dataset pipeline preserves them distributed. */
class MultimodalSpec extends AnyFunSuite {

  lazy val spark = Spec.spark

  test("decode stub computes exact features from payload bytes") {
    val row = MediaRow(7, "image", "abc".getBytes("UTF-8")) // 97+98+99 = 294
    val f = MediaCodec.decodeStub(Iterator(row)).next()
    assert(f.checksum == 294)
    assert(f.n_bytes == 3)
    assert(f.width == 16 + (294 % 624))
    assert(f.height == 16 + (3 % 464))
  }

  test("q37_media_decode runs distributed and matches the stub per row") {
    import spark.implicits._
    val out = SparkEntry.queries("q37_media_decode")(spark, Spec.sfDir)
    assert(out.columns.toSeq ==
      Seq("doc_id", "fmt", "n_bytes", "width", "height", "checksum"))
    val docs = Tables.documents(spark, Spec.sfDir)
      .select($"doc_id", $"text").as[(Long, String)].collect().toMap
    val rows = out.as[Multimodal.MediaFeatures].collect()
    assert(rows.length == docs.size)
    rows.take(20).foreach { f =>
      val expected = MediaCodec.decodeStub(Iterator(MediaRow(
        f.doc_id, f.fmt, docs(f.doc_id).getBytes("UTF-8")))).next()
      assert(f == expected, s"doc ${f.doc_id}")
    }
  }

  test("fmt assignment partitions doc_ids mod 3") {
    import spark.implicits._
    val out = SparkEntry.queries("q36_media_meta")(spark, Spec.sfDir)
      .select($"doc_id", $"fmt").as[(Long, String)].collect()
    out.foreach { case (id, fmt) =>
      val exp = (id % 3) match {
        case 0 => "image"; case 1 => "audio"; case _ => "video"
      }
      assert(fmt == exp)
    }
  }
}
