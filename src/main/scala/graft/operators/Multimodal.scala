package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.functions._

/** Group G of SURVEY.md §2 — multimodal (binary) columns.
  *
  * The pipeline pattern: media rides as an opaque `binary` column
  * with typed metadata beside it; decode/feature-extraction runs as
  * partition-local batch work (`mapPartitions`) so a real decoder
  * (image/audio libs) would amortize per-batch init and never touch
  * the driver. The decoders themselves are NOT available in this
  * container, so the decode step is a clearly-marked deterministic
  * fake — the Spark-side plumbing (schema, partitioning, batch
  * shape) is real and spec'd.
  */
object Multimodal {

  /** Deterministic FAKE decode: stands in for image/audio decoding,
    * which is unavailable in this environment. Derives a fixed-size
    * feature vector from the payload bytes only — stable across
    * partitionings and runs.
    */
  def fakeDecodeFeatures(payload: Array[Byte]): Array[Float] = {
    val n = payload.length
    var sum = 0L; var min = 255; var max = 0
    var i = 0
    while (i < n) {
      val b = payload(i) & 0xff
      sum += b; if (b < min) min = b; if (b > max) max = b
      i += 1
    }
    val mean = if (n == 0) 0f else sum.toFloat / n
    Array(n.toFloat, mean, min.toFloat, max.toFloat,
      if (n == 0) 0f else (payload(0) & 0xff).toFloat,
      if (n == 0) 0f else (payload(n - 1) & 0xff).toFloat,
      (sum % 256).toFloat,
      (graft.functions.PolyHash64.hash(payload, 1000003L) & 0xffff).toFloat)
  }

  val all: Map[String, Q] = Map(
    // ------------------------------------------------------------------
    // Binary payload + typed metadata, partition-aware (shard key in
    // the schema). Metadata is oracled; the payload itself round-trips
    // as binary (n_bytes proves it).
    "mm_binary_schema" -> Q(
      (s, dir) => {
        Tables.documents(s, dir)
          .select(col("doc_id"),
            col("text").cast("binary").as("payload"),
            lit("text/plain").as("media_format"),
            col("source").as("media_source"))
          .select(col("doc_id"), col("media_format"), col("media_source"),
            octet_length(col("payload")).as("n_bytes"),
            pmod(col("doc_id"), lit(16)).as("shard"))
          .orderBy("doc_id")
      },
      Some("""
        SELECT doc_id, 'text/plain' AS media_format, source AS media_source,
               CAST(strlen(text) AS INTEGER) AS n_bytes,
               doc_id % 16 AS shard
        FROM documents ORDER BY doc_id""")),

    // ------------------------------------------------------------------
    // Feature extraction over the binary column via mapPartitions:
    // batch-shaped, executor-local, driver never sees a payload.
    // Fake-decode -> rows-only for the driver; MultimodalSpec pins
    // determinism, shape, and partitioning-invariance.
    "mm_feature_extract" -> Q(
      (s, dir) => {
        import s.implicits._
        val bin = Tables.documents(s, dir)
          .select(col("doc_id"), col("text").cast("binary").as("payload"))
          .as[(Long, Array[Byte])]
        bin.mapPartitions { it =>
          // batch loop: a real decoder would init its codec once here
          it.map { case (id, payload) => (id, fakeDecodeFeatures(payload)) }
        }.toDF("doc_id", "features")
          .select(col("doc_id") +:
            (0 until 8).map(i => col("features").getItem(i).as(s"f$i")): _*)
          .orderBy("doc_id")
      },
      None),

    // ------------------------------------------------------------------
    // Frame sampling over a video-like binary container: the payload
    // splits into fixed-size frames and every SampleEvery-th frame is
    // selected — the standard shape for video preprocessing (decode
    // only sampled frames, never the whole stream). The framing
    // arithmetic (offsets, lengths, sampled indices) is fully oracled;
    // a real decoder would receive payload.slice(off, off+len) inside
    // the same mapPartitions batch loop.
    "mm_frame_sample" -> Q(
      (s, dir) => {
        import s.implicits._
        val FrameBytes = 64L
        val SampleEvery = 4
        val bin = Tables.documents(s, dir)
          .select(col("doc_id"), col("text").cast("binary").as("payload"))
          .as[(Long, Array[Byte])]
        bin.mapPartitions { it =>
          it.flatMap { case (id, payload) =>
            val n = payload.length.toLong
            val nFrames = ((n + FrameBytes - 1) / FrameBytes).toInt
            (0 until nFrames by SampleEvery).iterator.map { fi =>
              val off = fi * FrameBytes
              (id, fi.toLong, off, math.min(FrameBytes, n - off))
            }
          }
        }.toDF("doc_id", "frame_idx", "byte_offset", "n_bytes")
          .orderBy("doc_id", "frame_idx")
      },
      Some("""
        SELECT doc_id, fi AS frame_idx, fi * 64 AS byte_offset,
               least(64, n - fi * 64) AS n_bytes
        FROM (SELECT doc_id, strlen(text) AS n,
                     unnest(range(0, (strlen(text) + 63) // 64, 4)) AS fi
              FROM documents)
        ORDER BY doc_id, frame_idx""")),

    // ------------------------------------------------------------------
    // Content-addressable payload dedup: group binary payloads by
    // digest, keep one canonical id per digest — the
    // store-each-blob-once pass before any decode work. One hash agg
    // on the 128-bit digest (never shuffles payload bytes — only the
    // 32-char digest and two longs move).
    "mm_payload_dedup" -> Q(
      (s, dir) => {
        Tables.documents(s, dir)
          .select(col("doc_id"), col("text").cast("binary").as("payload"))
          .groupBy(md5(col("payload")).as("digest"))
          .agg(min(col("doc_id")).as("canonical_id"),
            count(lit(1)).as("n_copies"))
          .orderBy("canonical_id")
      },
      Some("""
        SELECT md5(text) AS digest, min(doc_id) AS canonical_id,
               count(*) AS n_copies
        FROM documents GROUP BY md5(text) ORDER BY canonical_id""")),

    // ------------------------------------------------------------------
    // Shard packing (the webdataset/tar-shard layout step): stream
    // each source's payloads in doc_id order and cut a new shard
    // every SHARD_BYTES of cumulative payload. shard_id is pure
    // window arithmetic over the running byte offset — one shuffle
    // keyed by source, each source packs independently (= in
    // parallel across a cluster), byte-deterministic output layout.
    "mm_shard_pack" -> Q(
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy("source").orderBy("doc_id")
          .rowsBetween(Window.unboundedPreceding, -1)
        Tables.documents(s, dir)
          .select(col("doc_id"), col("source"), col("n_chars"))
          .withColumn("start_off",
            coalesce(sum(col("n_chars")).over(w), lit(0L)))
          .withColumn("shard_id", expr("start_off div 4096"))
          .orderBy("source", "doc_id")
      },
      Some("""
        SELECT doc_id, source, n_chars, start_off,
               start_off // 4096 AS shard_id
        FROM (SELECT doc_id, source, n_chars,
                CAST(coalesce(sum(n_chars) OVER (PARTITION BY source
                  ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING
                  AND 1 PRECEDING), 0) AS BIGINT) AS start_off
              FROM documents)
        ORDER BY source, doc_id""")),

    // ------------------------------------------------------------------
    // Perceptual-hash near-dup candidates: quantize each payload's
    // feature vector against the CORPUS feature means (one broadcast
    // scalar row) into a bit code, bucket by the code — media whose
    // features land the same side of every mean are candidate
    // duplicates. The real-pipeline shape (pHash/aHash over decoded
    // pixels) with the decode faked as above; only (doc_id, code)
    // shuffles. Rows-only for the driver; MultimodalSpec pins
    // determinism and the identical-payload -> identical-code law.
    "mm_phash" -> Q(
      (s, dir) => {
        import s.implicits._
        val feats = Tables.documents(s, dir)
          .select(col("doc_id"), col("text").cast("binary").as("payload"))
          .as[(Long, Array[Byte])]
          .mapPartitions(_.map { case (id, p) => (id, fakeDecodeFeatures(p)) })
          .toDF("doc_id", "features")
          .select(col("doc_id") +:
            (0 until 8).map(i => col("features").getItem(i).as(s"f$i")): _*)
        val means = feats.agg(
          (0 until 8).map(i => avg(col(s"f$i")).as(s"m$i")).head,
          (1 until 8).map(i => avg(col(s"f$i")).as(s"m$i")): _*)
        val code = (0 until 8).map(i =>
          when(col(s"f$i") > col(s"m$i"), lit(1L << i)).otherwise(lit(0L)))
          .reduce(_ + _)
        val coded = feats.crossJoin(broadcast(means))
          .select(col("doc_id"), code.as("phash"))
        coded
          .withColumn("n_bucket", count(lit(1))
            .over(org.apache.spark.sql.expressions.Window.partitionBy("phash")))
          .orderBy("doc_id")
      },
      None)
  )
}
