package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Multimodal
import graft.operators.Multimodal.{MediaCodec, MediaRow}

/** Real-codec multimodal pipeline: encode a deterministic PNG per doc,
  * decode it with javax.imageio inside partitions, and check the
  * decoded values against an independent pixel-formula oracle (not the
  * codec itself). */
class MultimodalSpec extends AnyFunSuite {

  lazy val spark = Spec.spark

  test("synthesized PNGs really decode via ImageIO with exact pixels") {
    Seq(0L, 7L, 123L).foreach { id =>
      val png = MediaCodec.synthPng(id)
      // PNG magic bytes — this is an actual PNG stream, not a fake
      assert(png.take(8).map(_ & 0xff).toSeq ==
        Seq(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a))
      val f = MediaCodec.decodePng(Iterator(MediaRow(id, "png", png))).next()
      val exp = MediaCodec.expectedFeatures(id)
      assert(f == exp, s"doc $id")
    }
  }

  test("aHash is stable under a one-pixel change and separates unrelated images") {
    import java.awt.image.BufferedImage
    import java.io.ByteArrayOutputStream
    import javax.imageio.ImageIO
    def hamming(a: Multimodal.AHash, b: Multimodal.AHash): Int =
      java.lang.Long.bitCount(a.h1 ^ b.h1) + java.lang.Long.bitCount(a.h2 ^ b.h2)
    def hashOf(png: Array[Byte]): Multimodal.AHash =
      MediaCodec.ahashPng(Iterator(MediaRow(0L, "png", png))).next()
    // perceptual property 1: flipping ONE pixel moves one block mean by
    // at most ceil(255 / blockPixels) gray levels — the hash flips at
    // most a few bits, where a byte-exact fingerprint would change
    // completely
    val base = MediaCodec.synthPng(42L)
    val img = ImageIO.read(new java.io.ByteArrayInputStream(base))
    img.setRGB(3, 3, img.getRGB(3, 3) ^ 0x0000f0)
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", bos)
    val d = hamming(hashOf(base), hashOf(bos.toByteArray))
    assert(d <= 4, s"one-pixel change flipped $d hash bits")
    // perceptual property 2: unrelated images (different ids → fully
    // different pixel streams) land far apart on average
    val hs = Seq(1L, 2L, 3L, 4L, 5L).map(id => hashOf(MediaCodec.synthPng(id)))
    val dists = for (i <- hs.indices; j <- hs.indices if i < j)
      yield hamming(hs(i), hs(j))
    assert(dists.sum.toDouble / dists.size > 10,
      s"unrelated images cluster: $dists")
  }

  test("decodePng rejects non-image payloads") {
    val bad = MediaRow(1, "png", "not a png".getBytes("UTF-8"))
    assertThrows[IllegalArgumentException] {
      MediaCodec.decodePng(Iterator(bad)).next()
    }
  }

  test("q37_media_decode runs distributed and matches the pixel oracle") {
    import spark.implicits._
    val out = SparkEntry.queries("q37_media_decode")(spark, Spec.sfDir)
    // n_bytes (PNG container length) is codec-internal and stays out of
    // the oracle-checked projection; it's asserted per-row in the codec
    // test above. Everything else must equal the pixel-formula oracle.
    assert(out.columns.toSeq ==
      Seq("doc_id", "fmt", "width", "height", "checksum"))
    val rows = out.as[(Long, String, Int, Int, Long)].collect()
    assert(rows.length ==
      Tables.documents(spark, Spec.sfDir).count())
    rows.foreach { case (id, fmt, w, h, sum) =>
      val e = MediaCodec.expectedFeatures(id)
      assert((fmt, w, h, sum) == (e.fmt, e.width, e.height, e.checksum),
        s"doc $id")
    }
  }

  test("thumbnails sample the decoded image deterministically") {
    Seq(0L, 5L, 42L).foreach { id =>
      val t = MediaCodec.thumbnail(
        Iterator(MediaRow(id, "png", MediaCodec.synthPng(id)))).next()
      assert(t == MediaCodec.expectedThumb(id), s"doc $id")
    }
  }

  test("q47_media_thumbnail emits formula-exact dimensions distributed") {
    import spark.implicits._
    val rows = SparkEntry.queries("q47_media_thumbnail")(spark, Spec.sfDir)
      .as[(Long, Int, Int, Int, Int)].collect()
    rows.foreach { case (id, sw, sh, tw, th) =>
      assert((sw, sh, tw, th) ==
        (16 + (id % 17).toInt, 16 + (id % 13).toInt, 8, 8), s"doc $id")
    }
  }

  test("synthesized WAVs parse as real RIFF/PCM with exact sample folds") {
    Seq(0L, 9L, 300L).foreach { id =>
      val wav = MediaCodec.synthWav(id)
      assert(new String(wav.take(4), "US-ASCII") == "RIFF")
      val f = MediaCodec.decodeWav(Iterator(MediaRow(id, "wav", wav))).next()
      assert(f == MediaCodec.expectedAudio(id), s"doc $id")
    }
  }

  test("decodeWav rejects non-RIFF payloads") {
    assertThrows[IllegalArgumentException] {
      MediaCodec.decodeWav(Iterator(
        MediaRow(1, "wav", Array.fill[Byte](64)(7)))).next()
    }
  }

  test("q60_audio_decode matches the waveform oracle distributed") {
    import spark.implicits._
    val rows = SparkEntry.queries("q60_audio_decode")(spark, Spec.sfDir)
      .as[(Long, Int, Int, Long, Long)].collect()
    rows.foreach { case (id, rate, ch, n, bytes) =>
      val e = MediaCodec.expectedAudio(id)
      assert((rate, ch, n, bytes) ==
        (e.sample_rate, e.n_channels, e.n_samples, e.n_bytes), s"doc $id")
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
