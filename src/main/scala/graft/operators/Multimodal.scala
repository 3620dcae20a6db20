package graft.operators

import org.apache.spark.sql.functions._

import graft.{Q, Tables}

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, processed batch-wise via
  * `mapPartitions` (the Scala analog of `mapInPandas` batches).
  *
  * The container has no image/audio codecs, so the DECODE step is a
  * clearly-marked deterministic fake ([[MediaCodec.decodeStub]]) — the
  * Spark-side plumbing that matters at 100 TB (schema, binary payload
  * handling, partition-wise batching, typed Encoders, no
  * driver-side collection) is real and oracle-/spec-tested.
  */
object Multimodal {

  /** An ingested media row: opaque payload + source metadata. */
  final case class MediaRow(doc_id: Long, fmt: String, payload: Array[Byte])

  /** Extracted features (what a real decoder would emit). */
  final case class MediaFeatures(doc_id: Long, fmt: String, n_bytes: Long,
      width: Int, height: Int, checksum: Long)

  object MediaCodec {
    /** STUB decoder — stands in for libjpeg/ffmpeg, which this
      * container lacks. Deterministic function of the payload bytes so
      * specs can assert exact values; a real deployment swaps only this
      * function, the surrounding pipeline is production-shaped
      * (iterator-in/iterator-out, zero driver state, one codec init per
      * partition — the expensive-resource pattern of mapPartitions). */
    def decodeStub(rows: Iterator[MediaRow]): Iterator[MediaFeatures] = {
      // simulate per-partition codec initialization cost amortization
      val codecInitialized = true
      require(codecInitialized)
      rows.map { r =>
        val sum = r.payload.foldLeft(0L)((a, b) => a + (b & 0xff))
        MediaFeatures(r.doc_id, r.fmt, r.payload.length.toLong,
          width = 16 + (sum % 624).toInt,
          height = 16 + (r.payload.length % 464),
          checksum = sum)
      }
    }
  }

  val queries: Seq[Q] = Seq(

    // ----- binary ingestion + metadata (functions-only, oracle-checked) ----
    Q("q36_media_meta",
      """SELECT doc_id,
        |  CASE WHEN doc_id % 3 = 0 THEN 'image'
        |       WHEN doc_id % 3 = 1 THEN 'audio'
        |       ELSE 'video' END AS fmt,
        |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        |  CAST(ceil(octet_length(encode(text)) / 4096.0) AS BIGINT) AS n_chunks
        |FROM documents""".stripMargin) { (s, d) =>
      Tables.documents(s, d).select(
        col("doc_id"),
        when(col("doc_id") % 3 === 0, "image")
          .when(col("doc_id") % 3 === 1, "audio")
          .otherwise("video").as("fmt"),
        length(col("text").cast("binary")).cast("long").as("n_bytes"),
        ceil(length(col("text").cast("binary")) / 4096.0).cast("long")
          .as("n_chunks"))
    },

    // ----- partition-wise decode via mapPartitions (stubbed codec) ---------
    // Not SQL-expressible (imperative batch decode) → rows-only check;
    // exact values are asserted in MultimodalSpec instead.
    Q.noOracle("q37_media_decode") { (s, d) =>
      import s.implicits._
      Tables.documents(s, d)
        .select(
          col("doc_id"),
          when(col("doc_id") % 3 === 0, "image")
            .when(col("doc_id") % 3 === 1, "audio")
            .otherwise("video").as("fmt"),
          col("text").cast("binary").as("payload"))
        .as[MediaRow]
        .mapPartitions(MediaCodec.decodeStub _)
        .toDF()
    }
  )
}
