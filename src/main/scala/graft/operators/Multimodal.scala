package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.functions._

/** Group G of SURVEY.md §2 — multimodal (binary) columns.
  *
  * The pipeline pattern: media rides as an opaque `binary` column
  * with typed metadata beside it; decode/feature-extraction runs as
  * partition-local batch work (`mapPartitions`) so the decoder
  * amortizes per-batch init and never touches the driver.
  * `mm_feature_extract` runs a REAL image decode (JDK
  * `javax.imageio` PNG) over deterministically synthesized images,
  * which makes the pixel statistics recomputable in the oracle from
  * the generative formula; `mm_phash` derives its bucketing features
  * from payload byte statistics (so payload-equal docs provably
  * collide).
  */
object Multimodal {

  /** Per-partition PNG codec: resolves the javax.imageio ImageReader
    * and ImageWriter ONCE and reuses them for every image in the
    * batch. `ImageIO.read`/`write` walk the service-provider registry
    * and allocate a fresh reader/writer per call, which dominated the
    * decode bench at hundreds of images per partition — reader reuse
    * via `setInput` is the standard imageio batch idiom. NOT
    * thread-safe: one instance per partition iterator.
    */
  final class PngCodec {
    // in-memory imageio streams: the default createImageInputStream /
    // createImageOutputStream are FILE-cache-backed — one temp file
    // per image, which collapses under a loaded /tmp (observed 0.4s
    // solo vs 5s late in a 247-query bench). Small frames belong in
    // memory; per-JVM static, harmless to set repeatedly.
    javax.imageio.ImageIO.setUseCache(false)
    private val reader =
      javax.imageio.ImageIO.getImageReadersByFormatName("png").next()
    private val writer =
      javax.imageio.ImageIO.getImageWritersByFormatName("png").next()

    /** Deterministic per-doc test image: pixel channels are pure
      * integer arithmetic in (doc_id, x, y), so any engine can
      * recompute the decoded statistics without an image library.
      * Sizes vary per doc (8..12 x 8..14) to exercise real framing.
      */
    def encode(docId: Long): Array[Byte] = {
      val w = (8 + docId % 5).toInt
      val h = (8 + docId % 7).toInt
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val r = ((docId * 31 + x * 7 + y * 13) % 256).toInt
          val g = ((docId * 17 + x * 11 + y * 3) % 256).toInt
          val b = ((docId * 29 + x * 5 + y * 19) % 256).toInt
          img.setRGB(x, y, (r << 16) | (g << 8) | b)
          x += 1
        }
        y += 1
      }
      val bos = new java.io.ByteArrayOutputStream()
      val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
      try { writer.setOutput(ios); writer.write(img) } finally ios.close()
      bos.toByteArray
    }

    /** REAL image decode (PNG is lossless, so decoded pixels equal
      * the synthesized ones exactly): width, height, per-channel
      * pixel sums and red min/max — all integers, hence exactly
      * comparable cross-engine.
      */
    def decodeStats(png: Array[Byte])
        : (Int, Int, Long, Long, Long, Int, Int) = {
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(png))
      val img =
        try { reader.setInput(iis, true, true); reader.read(0) }
        finally iis.close()
      val w = img.getWidth; val h = img.getHeight
      var sr = 0L; var sg = 0L; var sb = 0L
      var mn = 255; var mx = 0
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val px = img.getRGB(x, y)
          val r = (px >> 16) & 0xff
          sr += r; sg += (px >> 8) & 0xff; sb += px & 0xff
          if (r < mn) mn = r
          if (r > mx) mx = r
          x += 1
        }
        y += 1
      }
      (w, h, sr, sg, sb, mn, mx)
    }
  }

  /** One-shot conveniences (specs, single images) — the batch path
    * holds a [[PngCodec]] per partition instead.
    */
  def encodePng(docId: Long): Array[Byte] = new PngCodec().encode(docId)
  def decodePngStats(png: Array[Byte])
      : (Int, Int, Long, Long, Long, Int, Int) =
    new PngCodec().decodeStats(png)

  /** Deterministic byte-statistic features (NOT a media decode):
    * a fixed-size vector derived from the payload bytes only —
    * stable across partitionings and runs, and equal for equal
    * payloads, which is the law mm_phash's bucketing relies on.
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
    // REAL image decode over a binary media column, batch-shaped via
    // mapPartitions (executor-local: payloads never reach the
    // driver; a codec would init once per batch). The images are
    // deterministic per-doc PNGs whose pixels are integer arithmetic
    // in (doc_id, x, y), so the ORACLE recomputes the decoded pixel
    // statistics from the generative formula — a pass proves the
    // encode -> javax.imageio decode -> stats path is bit-faithful.
    "mm_feature_extract" -> Q(
      (s, dir) => {
        import s.implicits._
        // repartition to core count BEFORE the decode: the input is a
        // handful of small parquet files, so file-split partitioning
        // would serialize this CPU-bound stage on one core — decode
        // parallelism must follow cores, not input bytes
        val ids = Tables.documents(s, dir).select("doc_id").as[Long]
          .repartition(s.sparkContext.defaultParallelism)
        ids.mapPartitions { it =>
          // codec per PARTITION, not per row: reader/writer resolution
          // through the imageio registry is the per-call cost
          val codec = new PngCodec
          it.map { id =>
            val (w, h, sr, sg, sb, mn, mx) = codec.decodeStats(codec.encode(id))
            (id, w, h, sr, sg, sb, mn, mx)
          }
        }.toDF("doc_id", "w", "h", "sum_r", "sum_g", "sum_b", "min_r", "max_r")
          .orderBy("doc_id")
      },
      Some("""
        SELECT d.doc_id,
               CAST(8 + d.doc_id % 5 AS INTEGER) AS w,
               CAST(8 + d.doc_id % 7 AS INTEGER) AS h,
               CAST(sum((d.doc_id*31 + p.x*7  + p.y*13) % 256) AS BIGINT) AS sum_r,
               CAST(sum((d.doc_id*17 + p.x*11 + p.y*3 ) % 256) AS BIGINT) AS sum_g,
               CAST(sum((d.doc_id*29 + p.x*5  + p.y*19) % 256) AS BIGINT) AS sum_b,
               CAST(min((d.doc_id*31 + p.x*7  + p.y*13) % 256) AS INTEGER) AS min_r,
               CAST(max((d.doc_id*31 + p.x*7  + p.y*13) % 256) AS INTEGER) AS max_r
        FROM documents d
        JOIN (SELECT gx.range AS x, gy.range AS y
              FROM range(0, 12) gx, range(0, 14) gy) p
          ON p.x < 8 + d.doc_id % 5 AND p.y < 8 + d.doc_id % 7
        GROUP BY d.doc_id ORDER BY d.doc_id""")),

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
    // Running byte offsets WITHOUT the per-source window (a handful
    // of source values over a corpus-sized table = one task per
    // source, the r13 sf100 ceiling class): start_off is the
    // per-group EXCLUSIVE prefix of n_chars from
    // RankSelect.groupedCumSum's distributed range-partitioned
    // prefix sum. Same integers; oracle unchanged.
    "mm_shard_pack" -> Q(
      (s, dir) => {
        val r = graft.plans.RankSelect.groupedCumSum(
          Tables.documents(s, dir)
            .select(col("doc_id"), col("source"), col("n_chars")),
          "source", Seq("doc_id"), "n_chars")
        r.select(col("doc_id"), col("source"), col("n_chars"),
            (col("cum") - col("n_chars")).as("start_off"),
            expr("(cum - n_chars) div 4096").as("shard_id"))
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
    // pixels) using payload byte-stat features (equal payloads =>
    // equal features, the collision law the spec pins); only
    // (doc_id, code) shuffles. CELL-EXACTLY oracled (round 6): every
    // feature is either integer-valued (exact as float and double in
    // both engines) or a float32 division DuckDB's REAL arithmetic
    // reproduces bit-exactly; the PolyHash64 low-16-bit fold is
    // replayed mod 65536 (low bits of a product depend only on low
    // bits of the operands, so no 64-bit wrap simulation is needed);
    // and the corpus means are EXACT double sums (each feature's
    // significand span across all docs fits in 53 bits, so summation
    // order cannot round) — hence bit-identical thresholds, codes and
    // bucket counts. MultimodalSpec pins determinism and the
    // collision law on top.
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
      Some("""
        WITH raw AS (
          SELECT doc_id, lower(hex(encode(text))) AS hx,
                 CAST(strlen(text) AS INTEGER) AS n
          FROM documents),
        b AS (
          SELECT doc_id, n,
            [16 * (strpos('0123456789abcdef', substr(hx, 2*i + 1, 1)) - 1)
               + (strpos('0123456789abcdef', substr(hx, 2*i + 2, 1)) - 1)
             for i in range(n)] AS bs
          FROM raw),
        f AS (
          -- n = 0 rows mirror fakeDecodeFeatures' explicit sentinels
          -- (mean 0, min 255, max/first/last/summod/hash 0) instead of
          -- the 0/0 division and empty-list NULLs SQL would produce
          SELECT doc_id,
            CAST(CAST(n AS REAL) AS DOUBLE) AS f0,
            CASE WHEN n = 0 THEN 0.0 ELSE
              CAST(CAST(sm AS REAL) / CAST(n AS REAL) AS DOUBLE) END AS f1,
            CASE WHEN n = 0 THEN 255.0 ELSE
              CAST(CAST(list_aggregate(bs, 'min') AS REAL) AS DOUBLE) END AS f2,
            CASE WHEN n = 0 THEN 0.0 ELSE
              CAST(CAST(list_aggregate(bs, 'max') AS REAL) AS DOUBLE) END AS f3,
            CASE WHEN n = 0 THEN 0.0 ELSE
              CAST(CAST(bs[1] AS REAL) AS DOUBLE) END AS f4,
            CASE WHEN n = 0 THEN 0.0 ELSE
              CAST(CAST(bs[n] AS REAL) AS DOUBLE) END AS f5,
            CAST(CAST(sm % 256 AS REAL) AS DOUBLE) AS f6,
            CAST(CAST(list_reduce(list_prepend(0, bs),
                 (h, x) -> (h * 1000003 + x) % 65536) AS REAL) AS DOUBLE) AS f7
          FROM (SELECT doc_id, n, bs,
                  list_reduce(list_prepend(0, bs), (a, x) -> a + x) AS sm
                FROM b)),
        m AS (SELECT avg(f0) m0, avg(f1) m1, avg(f2) m2, avg(f3) m3,
                     avg(f4) m4, avg(f5) m5, avg(f6) m6, avg(f7) m7 FROM f),
        c AS (
          SELECT doc_id,
            CAST((CASE WHEN f0 > m0 THEN 1 ELSE 0 END)
               + (CASE WHEN f1 > m1 THEN 2 ELSE 0 END)
               + (CASE WHEN f2 > m2 THEN 4 ELSE 0 END)
               + (CASE WHEN f3 > m3 THEN 8 ELSE 0 END)
               + (CASE WHEN f4 > m4 THEN 16 ELSE 0 END)
               + (CASE WHEN f5 > m5 THEN 32 ELSE 0 END)
               + (CASE WHEN f6 > m6 THEN 64 ELSE 0 END)
               + (CASE WHEN f7 > m7 THEN 128 ELSE 0 END) AS BIGINT) AS phash
          FROM f, m)
        SELECT doc_id, phash,
               CAST(count(*) OVER (PARTITION BY phash) AS BIGINT) AS n_bucket
        FROM c ORDER BY doc_id"""))
  )
}
