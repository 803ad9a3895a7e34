package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.array_to_vector

/** Group F of SURVEY.md §2 — similarity search over the embedding
  * column (Array[Float], 64-dim).
  *
  * ann_bruteforce_topk is the exact baseline: a broadcast of the
  * (tiny) query set against the full corpus, cosine in one codegen'd
  * higher-order expression, per-query top-k. ann_ivf_topk is the
  * scale path: KMeans centroids (trained on a sample at real scale),
  * nprobe nearest cells per query, exact rerank inside the probed
  * cells only — corpus scanned once to assign cells, then top-k work
  * touches ~nprobe/k of the data.
  */
object Ann {

  /** Memoized embedding dimension per corpus dir. The dim==64 oracle
    * guards below are invariants of a fixed corpus, so probing once
    * per dir (not one Spark action per registry invocation) is both
    * correct and cheaper; an empty embeddings table fails loudly here
    * instead of surfacing as head()'s NoSuchElementException.
    */
  private val dimCache = new java.util.concurrent.ConcurrentHashMap[String, Int]()

  /** Drop the memoized dim for `dir`. Anything that REWRITES a corpus
    * at a fixed path (GenData.generate, fuzz-spec regeneration) must
    * call this, or a JVM that probed the old corpus would keep serving
    * the stale dim and silently defeat the fail-loudly dim guard.
    */
  def invalidateDim(dir: String): Unit = { dimCache.remove(dir); () }

  def corpusDim(s: SparkSession, dir: String): Int =
    dimCache.computeIfAbsent(dir, _ => {
      val rows = Tables.embeddings(s, dir)
        .select(size(col("embedding"))).limit(1).collect()
      require(rows.nonEmpty,
        s"embeddings table at $dir is empty — cannot infer embedding dim")
      rows(0).getInt(0)
    })

  /** The memoized, PERSISTED normalized-vector view of a corpus — one
    * resident copy per (session, corpus), shared by pca / SRP / every
    * top-k serving path (same DfCache key). Serving paths must read
    * nv from this materialized cache, never from a bare projection:
    * Catalyst's projection collapse INLINES an un-persisted nv into
    * every downstream reference, and the l2norm is an interpreted
    * HOF — the IVF-PQ encode references nv 33 times (cell + 32
    * codes), which re-ran the normalization 33x per row and cost the
    * sf1 ladder rung 62 s before the decade measurement caught it.
    */
  private def nvCache(s: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    graft.DfCache.memo(
      Tables.embeddings(s, dir)
        .select(col("vec_id"), l2normExpr(col("embedding")).as("nv"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK),
      s"pca-nv:$dir")
  }

  /** Codegen dot product (graft.functions.DotProduct): the similarity
    * kernel of every embedding operator. The HOF formulation
    * (zip_with + aggregate) runs its lambdas interpreted and
    * allocates an intermediate array per pair — 10x+ slower at
    * candidate-pair volume. Requires GraftFunctions.register (all
    * callers do it).
    */
  def dot(x: Column, y: Column): Column = call_function("graft_dot", x, y)

  /** Cosine similarity of two float-array columns, computed in double.
    * Pure per-row codegen expression work — no UDF, no shuffle.
    */
  def cosineExpr(a: Column, b: Column): Column =
    dot(a, b) / sqrt(dot(a, a) * dot(b, b))

  /** L2-normalize a float-array column into array<double>. On the unit
    * sphere cosine becomes a plain dot product and cos >= t becomes
    * ||a-b||² <= 2-2t, so euclidean KMeans cells are cosine-consistent
    * — cluster AFTER this, never on raw vectors.
    *
    * Native codegen expression (graft.functions.L2Normalize) — the
    * aggregate+transform HOF formulation ran interpreted at ~1 ms/row
    * on dim-256 vectors; same fold, bit-identical output (the
    * oracles' nvPrelude replays it). Requires GraftFunctions.register
    * (all callers do it).
    */
  def l2normExpr(c: Column): Column = call_function("graft_l2norm", c)

  /** The `k` nearest (squared distance, cell) structs for a vector
    * column, via the native NearestCells expression — the centroid
    * matrix rides inside the expression object, so the plan stays a
    * single compact node instead of a cells x dim literal subtree
    * (which cost more in Catalyst re-analysis than the query's whole
    * execution). Callers must have run GraftFunctions.register.
    */
  private def cellScoresK(nv: Column, cents: Seq[Seq[Double]], k: Int): Column =
    call_function("graft_cells", nv, typedLit(cents), lit(k))

  /** The `nprobe` nearest centroid ids for a normalized vector column. */
  def nearestCellsExpr(nv: Column, cents: Seq[Seq[Double]], nprobe: Int): Column =
    transform(cellScoresK(nv, cents, nprobe), s => s("cell"))

  /** The single nearest (squared distance, cell) struct. */
  def nearestCellStruct(nv: Column, cents: Seq[Seq[Double]]): Column =
    element_at(cellScoresK(nv, cents, 1), 1)

  /** All m PQ codeword ids of a normalized vector in ONE native
    * expression pass (graft.functions.PqEncode — codebooks ride
    * inside the expression object). The previous shape, an array() of
    * m separate graft_cells calls over slice()s, allocated m slices
    * per row and bloated the codegen stage 32-fold at dim 256;
    * arithmetic and tie-breaks are bit-identical (the seeded oracles
    * replay the encode). Callers must have run GraftFunctions.register.
    */
  private def pqEncodeExpr(nv: Column, books: Seq[Seq[Seq[Double]]]): Column =
    call_function("graft_pq_encode", nv,
      typedLit(books), lit(books.head.head.length))

  /** Fit KMeans cells on the normalized vectors; returns centroids.
    *
    * TRAINING-SET BOUND: KMeans cell quality needs O(samples per
    * centroid), not O(corpus) — the r13 sf100 ladder measured the
    * unbounded version walling the bench (2M x dim-256, k=1414:
    * k-means|| init + 10 Lloyd rounds over the FULL corpus ran >35
    * minutes; the prior scaladoc said "at 100 TB train on .sample"
    * without implementing it). Training now caps at 256·cells rows by
    * DETERMINISTIC hash sampling on vec_id (every executor picks the
    * same rows; no RNG state), so train cost is O(cells²·dim·iters)
    * regardless of corpus size. Below the cap this is exactly the old
    * full-table path, so small-SF behavior (and every oracle) is
    * unchanged; above it, the serving-recall CONTRACT
    * (ivfServingParams' measured verify loop) remains the quality
    * gate — sampling shifts centroids, the contract re-derives
    * (nprobe, rerank) against them.
    *
    * The training input is cached for the iteration loop — uncached,
    * every Lloyd step (and every k-means|| init pass) re-reads the
    * parquet and recomputes the l2norm, which dominated the bench.
    * k-means|| init is kept: random init measurably degrades cell
    * balance on this data (recall@10 0.92 -> 0.76).
    */
  def fitCells(emb: DataFrame, cells: Int): Seq[Seq[Double]] = {
    val target = 256L * cells
    val n = emb.count()
    val train =
      if (n <= target) emb
      else {
        val every = (n + target - 1) / target // ceil(n/target)
        emb.filter(pmod(xxhash64(col("vec_id"), lit(7)), lit(every)) === 0)
      }
    // coalesce: Lloyd iterations on a (sampled) training set are
    // all-reduce rounds — hundreds of tiny tasks per round is pure
    // scheduler overhead. 8 partitions keeps the reduce wide enough
    // for small indexes while cutting per-iteration task count 4x;
    // big-cell indexes (training rows ∝ cells) widen toward the core
    // count so the per-iteration distance matrix stays parallel.
    val parts = math.min(32, math.max(8, cells / 64))
    val feats = train.select(array_to_vector(col("nv")).as("features"))
      .coalesce(parts)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val model = new KMeans().setK(cells).setSeed(42L).setMaxIter(10)
        .fit(feats)
      model.clusterCenters.map(_.toArray.toSeq).toSeq
    } finally { feats.unpersist(blocking = false): Unit }
  }

  /** Content fingerprint of a corpus directory: file names, sizes and
    * mtimes of the embeddings parquet, hashed. Cheap (a directory
    * listing, no data read) and changes whenever the corpus does —
    * the invalidation key for the persisted ANN index caches below.
    */
  private def corpusFingerprint(dir: String): String = {
    val root = new java.io.File(s"$dir/embeddings.parquet")
    // fail fast on a missing corpus: a constant fingerprint here would
    // let a stale cached index serve for a corpus that no longer exists
    require(root.exists(), s"ANN corpus not found: $root")
    val parts =
      if (root.isDirectory)
        Option(root.listFiles()).getOrElse(Array.empty[java.io.File])
          .sortBy(_.getName)
      else Array(root)
    val desc = parts.map(f => s"${f.getName}:${f.length}:${f.lastModified}")
      .mkString(s"$dir|", ",", "")
    java.lang.Long.toHexString(
      org.apache.spark.unsafe.hash.Murmur3_x86_32
        .hashUnsafeBytes2(desc.getBytes("UTF-8"),
          org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET,
          desc.getBytes("UTF-8").length, 42) & 0xffffffffL)
  }

  /** Disk-backed memo for trained index state (centroids/codebooks):
    * an ANN index is trained once and served many times — FAISS/IVF
    * deployments persist the index exactly like this. The in-process
    * map serves repeat calls; the on-disk copy (per-user 0700 tmpdir,
    * keyed by corpus fingerprint + train version + params) survives
    * JVM boundaries, so a fresh driver process (the per-round bench)
    * measures PROBE cost, not a re-train. Stale entries
    * self-invalidate via the fingerprint; writes are atomic (temp +
    * rename). Training is seeded, so a cache hit and a re-train are
    * bit-identical. Hits/misses log to stderr so warm vs cold bench
    * runs are distinguishable from the artifact.
    *
    * The on-disk format is RAW shape + doubles (magic, rank, dims,
    * row-major values via DataOutputStream) — never Java object
    * serialization: a planted or corrupt file can at worst yield
    * wrong doubles, which the shape check rejects anyway, never code
    * execution on load.
    */
  private val centroidCache =
    new java.util.concurrent.ConcurrentHashMap[(String, String), AnyRef]()

  /** Mixed into every disk key so ANY change to the training recipe
    * (seed, maxIter, init, storage codec) invalidates persisted
    * entries instead of silently serving state trained by older code.
    * Bump the literal whenever the training path changes.
    */
  private val TrainVersion = "v3-s42i10-t256"

  private val CacheMagic = 0x47414E31 // "GAN1"

  private[operators] def cacheDir(): java.io.File = {
    val dir = new java.io.File(
      System.getProperty("java.io.tmpdir"),
      "graft-ann-index-" + System.getProperty("user.name", "anon"))
    if (!dir.exists()) {
      try
        java.nio.file.Files.createDirectories(dir.toPath,
          java.nio.file.attribute.PosixFilePermissions.asFileAttribute(
            java.nio.file.attribute.PosixFilePermissions
              .fromString("rwx------"))): Unit
      catch {
        case _: UnsupportedOperationException => // non-posix fallback
          dir.mkdirs()
          dir.setReadable(false, false); dir.setReadable(true, true)
          dir.setWritable(false, false); dir.setWritable(true, true)
          dir.setExecutable(false, false); dir.setExecutable(true, true): Unit
      }
    }
    dir
  }

  /** Load-or-train a shaped double tensor. `validShape` rejects any
    * on-disk entry whose dims don't match what the caller is about to
    * use (wrong cells/m/ks, truncated file, planted payload).
    */
  private[operators] def diskCachedDoubles(key: String,
      validShape: Seq[Int] => Boolean,
      train: => (Seq[Int], Array[Double])): (Seq[Int], Array[Double]) = {
    val dir = cacheDir()
    val f = new java.io.File(dir, key + ".bin")
    def load(): Option[(Seq[Int], Array[Double])] =
      if (!f.isFile) None
      else try {
        val in = new java.io.DataInputStream(new java.io.BufferedInputStream(
          new java.io.FileInputStream(f)))
        try {
          if (in.readInt() != CacheMagic) None
          else {
            val rank = in.readInt()
            if (rank < 1 || rank > 4) None
            else {
              val dims = Seq.fill(rank)(in.readInt())
              val n = dims.foldLeft(1L)(_ * _.toLong)
              if (dims.exists(_ <= 0) || n > 50000000L || !validShape(dims))
                None
              else {
                val a = new Array[Double](n.toInt)
                var i = 0
                while (i < a.length) { a(i) = in.readDouble(); i += 1 }
                Some((dims, a))
              }
            }
          }
        } finally in.close()
      } catch { case _: Throwable => None }
    load() match {
      case Some(v) =>
        System.err.println(s"graft-ann-cache: hit $key")
        v
      case None =>
        System.err.println(s"graft-ann-cache: miss $key (training)")
        val v = train
        try {
          val tmp = java.io.File.createTempFile(key, ".tmp", dir)
          val out = new java.io.DataOutputStream(
            new java.io.BufferedOutputStream(new java.io.FileOutputStream(tmp)))
          try {
            out.writeInt(CacheMagic)
            out.writeInt(v._1.length)
            v._1.foreach(out.writeInt)
            v._2.foreach(out.writeDouble)
          } finally out.close()
          tmp.renameTo(f): Unit
        } catch { case _: Throwable => () } // cache write is best-effort
        v
    }
  }

  def fitCellsCached(corpus: String, cells: Int, emb: => DataFrame): Seq[Seq[Double]] =
    centroidCache.computeIfAbsent(
      (corpus, s"cells$cells"),
      _ => {
        // probe the true vector dim (a one-row job, paid only on an
        // in-process miss) so a cached entry with the right cell
        // count but the wrong dimensionality is rejected, not served
        val dim = emb.select(size(col("nv"))).head.getInt(0)
        val (dims, flat) = diskCachedDoubles(
          s"${corpusFingerprint(corpus)}-$TrainVersion-cells$cells",
          // accept the ACTUAL trained center count (seeded KMeans can
          // return < cells on a degenerate corpus, deterministically —
          // a rejected entry here would silently retrain every JVM)
          dims => dims.length == 2 && dims(0) >= 1 && dims(0) <= cells &&
            dims(1) == dim,
          {
            val cents = fitCells(emb, cells)
            require(cents.nonEmpty && cents.forall(_.length == dim),
              s"KMeans returned malformed centroids for cells=$cells dim=$dim")
            (Seq(cents.length, cents.head.length), cents.flatten.toArray)
          })
        flat.grouped(dims(1)).map(_.toSeq).toSeq
      }
    ).asInstanceOf[Seq[Seq[Double]]]

  /** IVF-bucketed cosine THRESHOLD pairs — the scale twin of the
    * all-pairs `dedup_embedding` baseline, the way minhash-LSH twins
    * exact jaccard — and, unlike multi-probe LSH, EXACT at any scale
    * by construction (ball-bound pruning, no recall knob to mistune):
    *
    * 1. Every vector is assigned to its single nearest KMeans cell;
    *    each cell keeps its radius r_i = max member distance to the
    *    centroid (one aggregation).
    * 2. On the unit sphere cos >= t  <=>  ||a-b|| <= D_t = sqrt(2-2t).
    *    By the triangle inequality a pair (a in i, b in j) can match
    *    only if d(c_i, c_j) <= r_i + r_j + D_t — so the driver
    *    computes the admissible CELL-PAIR list from cells x cells
    *    (tiny: centroids and radii, never data) and only those cell
    *    pairs are joined.
    * 3. Candidates are verified with the codegen dot product; each
    *    unordered pair meets exactly once (its ordered cell pair), so
    *    no distinct is needed.
    *
    * False positives impossible (exact verification); false negatives
    * impossible (triangle bound). On this corpus's UNIFORM random
    * embeddings — IVF's worst case, where radii stay wide — most cell
    * pairs remain admissible and the cost honestly degrades toward
    * all-pairs, which is the true cost of an exact answer on
    * structureless data. On a real (clustered) embedding corpus the
    * radii shrink and the admissible fraction collapses, which is
    * where the sqrt(n) cell sizing pays: shuffles stay keyed by cell,
    * the driver never touches more than cells² scalars, and nothing
    * materializes O(n²) unless the DATA forces it.
    */
  def embeddingIvfPairs(s: SparkSession, dir: String, threshold: Double = 0.45,
      cells: Int = 0): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    val emb = nvCache(s, dir)
    // sizing count on the RAW table: parquet answers it from footer
    // metadata, where emb.count() would re-run the l2norm projection
    val nCells =
      if (cells > 0) cells
      else math.max(16,
        math.sqrt(Tables.embeddings(s, dir).count().toDouble).toInt)
    val cents = fitCellsCached(dir, nCells, emb)
    // memoized per (corpus, cells): one resident assignment index per
    // corpus, not one leaked copy per call (graft.DfCache scaladoc)
    val assigned = graft.DfCache.memo(
      emb.withColumn("sc", nearestCellStruct(col("nv"), cents))
        .select(col("vec_id"), col("nv"),
          col("sc.cell").as("cell"), sqrt(col("sc.d")).as("cdist"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK),
      s"ivf-assigned:$dir:$nCells")

    // Per-cell radii: `cells` rows to the driver — metadata, not data.
    val radii = assigned.groupBy("cell").agg(max(col("cdist")).as("r"))
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    val dT = math.sqrt(math.max(0.0, 2.0 - 2.0 * threshold))
    def centDist(i: Int, j: Int): Double =
      math.sqrt(cents(i).lazyZip(cents(j)).map((x, y) => (x - y) * (x - y)).sum)
    val admissible = for {
      i <- radii.keySet.toSeq.sorted
      j <- radii.keySet.toSeq.sorted if j >= i
      if centDist(i, j) <= radii(i) + radii(j) + dT
    } yield (i, j)
    import s.implicits._
    val cellPairs = broadcast(admissible.toDF("ci", "cj"))

    cellPairs
      .join(assigned.as("x"), col("x.cell") === col("ci"))
      .join(assigned.as("y"),
        col("y.cell") === col("cj") &&
          (col("ci") < col("cj") || col("x.vec_id") < col("y.vec_id")))
      .filter(dot(col("x.nv"), col("y.nv")) >= threshold)
      .select(least(col("x.vec_id"), col("y.vec_id")).as("id_a"),
        greatest(col("x.vec_id"), col("y.vec_id")).as("id_b"))
  }

  /** Deterministic Rademacher (+-1) projection planes for SRP — a
    * pure function of (dim, bits, seed) via a splitmix-style mix, so
    * every JVM (and every re-run) derives the identical signature
    * family without shipping state.
    */
  private def srpPlanes(dim: Int, bits: Int, seed: Long): Array[Array[Double]] =
    Array.tabulate(bits) { k =>
      Array.tabulate(dim) { j =>
        var x = seed + k.toLong * 0x9E3779B97F4A7C15L + j.toLong * 0xC2B2AE3D27D4EB4FL
        x ^= x >>> 30; x *= 0xBF58476D1CE4E5B9L
        x ^= x >>> 27; x *= 0x94D049BB133111EBL
        x ^= x >>> 31
        if ((x & 1L) == 0L) 1.0 else -1.0
      }
    }

  /** Derive SRP banding (rowsPerBand, bands) from a recall contract —
    * the self-tuning inverse of the collision law, so a caller states
    * WHAT it needs ("pairs at cosine >= simAt must surface with
    * probability >= recall") instead of hand-picking the r=14/b=24
    * fixture. The law: a single SRP bit agrees on a pair with
    * probability p = 1 - acos(cos)/pi, so a pair collides in at least
    * one of b bands of r bits with P = 1 - (1 - p^r)^b. Inverting at
    * the contract point: b(r) = ceil(ln(1-recall) / ln(1-p^r)).
    * Feasibility: random pairs (cos ~ 0, p = 1/2) must stay out of
    * the candidate join — the expected colliding-band count per
    * random pair, b * 2^-r, is capped by `fpBandBudget`. Among
    * feasible (r, b) the minimizer of total projection bits r*b wins
    * (projection work per vector and signature width both scale with
    * it; b alone sets the shuffle fan-out).
    *
    * Note the contract point is the SIMILARITY OF THE PAIRS TO BE
    * FOUND (e.g. 0.87+ for near-dup clones), not the exact-verify
    * threshold: verification makes false positives impossible
    * regardless, so banding only decides recall and candidate volume.
    */
  def srpParams(simAt: Double, recall: Double,
      fpBandBudget: Double = 0.01): (Int, Int) = {
    require(simAt > 0.0 && simAt < 1.0, s"simAt must be in (0,1): $simAt")
    require(recall >= 0.5 && recall < 1.0, s"recall must be in [0.5,1): $recall")
    val p = 1.0 - math.acos(simAt) / math.Pi
    val feasible = (1 to 64).flatMap { r =>
      val pr = math.pow(p, r)
      if (pr >= 1.0) None
      else {
        val b = math.ceil(math.log1p(-recall) / math.log1p(-pr)).toLong
        if (b >= 1 && b <= 4096 && b * math.pow(0.5, r) <= fpBandBudget)
          Some((r, b.toInt))
        else None
      }
    }
    require(feasible.nonEmpty,
      s"no SRP banding meets recall=$recall at sim=$simAt within " +
        s"fpBandBudget=$fpBandBudget — relax the contract")
    feasible.minBy { case (r, b) => r.toLong * b }
  }

  /** Forward collision law: P[>=1 band collides] at cosine `cos`
    * under banding (r, b) — the quantity [[srpParams]] inverts.
    */
  def srpCollisionP(cos: Double, rowsPerBand: Int, bands: Int): Double = {
    val p = 1.0 - math.acos(math.max(-1.0, math.min(1.0, cos))) / math.Pi
    1.0 - math.pow(1.0 - math.pow(p, rowsPerBand), bands)
  }

  /** Rademacher planes derived from md5 — the ORACLE-REPLAYABLE plane
    * family (the dedup_simhash device): sign of plane row k, component
    * j is the high bit of md5("k:j"), which DuckDB recomputes as
    * `substring(md5(k || ':' || j), 1, 1) BETWEEN '0' AND '7'`. Any
    * iid sign family gives the same LSH guarantees; this one lets the
    * oracle replay the FULL algorithm (planes -> signs -> band
    * signatures -> bucket join -> cap -> exact verify) bit-for-bit.
    */
  private[graft] def srpPlanesMd5(dim: Int, bits: Int): Array[Array[Double]] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    Array.tabulate(bits) { k =>
      Array.tabulate(dim) { j =>
        md.reset()
        val d = md.digest(s"$k:$j".getBytes(java.nio.charset.StandardCharsets.UTF_8))
        if ((d(0) & 0x80) == 0) 1.0 else -1.0
      }
    }
  }

  /** Cosine-threshold near-dup pairs via banded sign-random-projection
    * LSH — the HIGH-DIMENSION scale path of the embedding-dedup family
    * (see [[graft.functions.SrpSignature]] for why IVF ball-bound
    * pruning is geometry-dead past ~dim 100: a 0.45-cosine threshold
    * is unit-sphere distance ~1.05, the same order as any cell radius
    * on noise-dominated data, so admissibility rejects nothing and the
    * exact path degenerates to the n^2 join).
    *
    * Shape: one codegen projection pass emits `bands` longs per vector
    * (each packing `rowsPerBand` sign bits); the self-join keys on
    * (band, signature) so the shuffle carries bands x n tiny rows;
    * candidates are deduped across bands BEFORE verification; the
    * exact codegen dot verifies every emitted pair, so FALSE POSITIVES
    * ARE IMPOSSIBLE — the LSH tradeoff is confined to recall at the
    * threshold boundary (P[collide in >=1 band] = 1-(1-p^r)^b with
    * p = 1 - acos(cos)/pi: ~0.99 at cos 0.87, ~1e-2 for random pairs'
    * band-collision EXPECTATION at r=14, b=24 — AnnSpec pins measured
    * recall against the exact brute-force pair set).
    *
    * HOT-BUCKET CAP (`maxBucket`): a bucket of D identical vectors
    * shares every band signature, so the uncapped self-join emits
    * O(D^2) pairs per band — the one skew minhash-LSH caps and the
    * r8 SRP draft did not. Buckets larger than `maxBucket` emit only
    * ADJACENT pairs in vec_id order (a chain, D-1 pairs) instead of
    * all pairs: output stays linear in the bucket, and for the
    * clone-cluster case that causes hot buckets the chain preserves
    * the transitive closure downstream connected-components dedup
    * consumes (chain pairs of identical vectors always pass the exact
    * verify). The cap is deterministic (row_number over vec_id), so
    * the oracle replays it.
    *
    * `planeMode` = "splitmix" (default, production: seed-derived
    * planes, srpPlanes above) or "md5" (oracle mode: DuckDB-replayable
    * plane family, srpPlanesMd5 — used by the dedup_embedding_srp
    * registry gate, which replays the entire pipeline in SQL).
    */
  def embeddingSrpPairs(s: SparkSession, dir: String, threshold: Double = 0.45,
      bands: Int = 24, rowsPerBand: Int = 14, seed: Long = 42L,
      planeMode: String = "splitmix", maxBucket: Int = 64): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    val emb = nvCache(s, dir)
    val dim = corpusDim(s, dir)
    val cand = embeddingSrpCandidates(s, dir, bands, rowsPerBand, seed,
      planeMode, maxBucket)
    // Exact verification of every candidate pair needs TWO gathers on
    // different keys (va by id_a, vb by id_b) — whichever runs second
    // must move either the corpus or a vector-annotated candidate
    // stream. The r13 sf100 rung measured the annotated stream at
    // ~cands x 2 KB (~230 GB for 2M rows x ~56 cands/row, dim-256
    // doubles) — linear in the corpus, absorbed by a cluster's
    // distributed shuffle disk, but a hard ceiling for any single
    // host. So the verify picks by measured corpus size:
    //  - corpus fits the budget (conf spark.graft.srp.verifyBroadcastBytes,
    //    default min(6 GB, maxHeap/6)): broadcast the packed
    //    normalized vectors once and verify with a lookup dot — the
    //    candidate stream is filtered IN PLACE, nothing candidate-
    //    sized is ever re-shuffled or sorted. The lookup accumulates
    //    in double over ascending components, bit-identical to the
    //    codegen DotProduct the join path applies.
    //  - past the budget: shuffle-HASH fetch joins (never sort-merge:
    //    the annotated stream must not additionally SORT-spill), the
    //    shape a 1000-executor cluster runs.
    // AnnSpec pins both paths pair-identical on the same corpus.
    val n = emb.count()
    if (n * (dim * 8L + 32L) <= srpVerifyBudget(s)) {
      import s.implicits._
      val packed = emb.select(col("vec_id"), col("nv"))
        .as[(Long, Array[Double])].collect().sortBy(_._1)
      val ids = packed.map(_._1)
      val flat = new Array[Double](packed.length * dim)
      var i = 0
      while (i < packed.length) {
        System.arraycopy(packed(i)._2, 0, flat, i * dim, dim); i += 1
      }
      val bIds = s.sparkContext.broadcast(ids)
      val bFlat = s.sparkContext.broadcast(flat)
      val (thr, d) = (threshold, dim)
      val passes = udf { (a: Long, b: Long) =>
        val iv = bIds.value; val f = bFlat.value
        val ia = java.util.Arrays.binarySearch(iv, a)
        val ib = java.util.Arrays.binarySearch(iv, b)
        // candidates only ever carry corpus ids: a miss means the
        // broadcast is stale for this dir — fail loudly
        require(ia >= 0 && ib >= 0, s"vec_id $a/$b not in corpus broadcast")
        var acc = 0.0; var j = 0; val oa = ia * d; val ob = ib * d
        while (j < d) { acc += f(oa + j) * f(ob + j); j += 1 }
        acc >= thr
      }
      cand.filter(passes(col("id_a"), col("id_b"))).select("id_a", "id_b")
    } else {
      cand
        .join(emb.select(col("vec_id").as("id_a"), col("nv").as("va"))
          .hint("shuffle_hash"), Seq("id_a"))
        .join(emb.select(col("vec_id").as("id_b"), col("nv").as("vb"))
          .hint("shuffle_hash"), Seq("id_b"))
        .filter(dot(col("va"), col("vb")) >= threshold)
        .select("id_a", "id_b")
    }
  }

  /** Corpus-bytes ceiling for [[embeddingSrpPairs]]'s broadcast-lookup
    * verify path. Default min(6 GB, maxHeap/6) — the packed doubles
    * live once in the driver (collect) and once per executor
    * (broadcast; the same heap in local mode). Overridable via
    * `spark.graft.srp.verifyBroadcastBytes` (0 forces the shuffle
    * path — AnnSpec uses it to pin the two paths equal). Either way
    * the budget is CAPPED at spark.driver.maxResultSize (when set >0):
    * the path starts with a corpus collect, and a budget the session's
    * own result-size ceiling forbids would fail mid-query instead of
    * degrading to the shuffle path (the srp sf100 re-measure hit
    * exactly this at the 1g default).
    */
  private def srpVerifyBudget(s: SparkSession): Long = {
    val req = s.conf.getOption("spark.graft.srp.verifyBroadcastBytes")
      .map(_.toLong)
      .getOrElse(math.min(6L << 30, Runtime.getRuntime.maxMemory / 6))
    val mrs = org.apache.spark.network.util.JavaUtils.byteStringAsBytes(
      s.conf.get("spark.driver.maxResultSize", "1g"))
    if (mrs > 0) math.min(req, mrs) else req
  }

  /** The CANDIDATE stage of [[embeddingSrpPairs]] — everything up to
    * (but not including) the exact-dot verification: banded signature
    * projection, (band, signature) bucketing, hot-bucket cap, and
    * cross-band dedup. Exposed separately so candidate VOLUME — the
    * quantity that went quadratic under fixed banding and broke the
    * r10 sf10 rung — is directly measurable (AnnSpec pins it ~linear
    * in n under the auto-derived banding).
    *
    * Bucketing is ONE aggregation over the n x bands signature rows:
    * members collect per (band, s) key and pairs are emitted inside
    * the sorted member array (all i<j pairs for buckets within
    * `maxBucket`, the adjacent chain above it — the same pair set,
    * chain cap included, as a row_number-capped bucket self-join).
    * The r13 sf100 rung measured why the self-join formulation had
    * to go: window bookkeeping (rn, cnt) SORTED the 236M-row
    * signature set, and the (band, s) self-join planned as a
    * sort-merge of two such sides — three full sorts of n x bands
    * rows and the rung's first 59 GB of spill. The aggregate form
    * shuffles the skinny signature rows exactly once, sorts nothing
    * wider than a partial-aggregate run, and emits pairs from an
    * in-memory array (a degenerate all-identical corpus makes ONE
    * bucket of n ids ~ n x 8 bytes — bounded, and its emission is
    * the linear chain, not n^2).
    */
  private[graft] def embeddingSrpCandidates(s: SparkSession, dir: String,
      bands: Int, rowsPerBand: Int, seed: Long = 42L,
      planeMode: String = "splitmix", maxBucket: Int = 64): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    val emb = nvCache(s, dir)
    val dim = corpusDim(s, dir)
    val planes = planeMode match {
      case "splitmix" => srpPlanes(dim, bands * rowsPerBand, seed)
      case "md5" => srpPlanesMd5(dim, bands * rowsPerBand)
      case other => throw new IllegalArgumentException(
        s"planeMode must be splitmix|md5, got $other")
    }
    // signatures only (no vector payload) ride the band shuffle
    val sigs = emb.select(col("vec_id"),
        posexplode(call_function("graft_srp", col("nv"),
          typedLit(planes.map(_.toSeq).toSeq), lit(rowsPerBand)))
          .as(Seq("band", "s")))
    sigs.groupBy("band", "s")
      .agg(sort_array(collect_list(col("vec_id"))).as("ids"))
      .filter(size(col("ids")) >= 2)
      .select(explode(expr(s"""
        CASE WHEN size(ids) <= $maxBucket THEN
          flatten(transform(ids, (x, i) ->
            transform(slice(ids, i + 2, size(ids)),
              y -> named_struct('id_a', x, 'id_b', y))))
        ELSE
          transform(slice(ids, 1, size(ids) - 1), (x, i) ->
            named_struct('id_a', x, 'id_b', element_at(ids, i + 2)))
        END""")).as("p"))
      .select(col("p.id_a"), col("p.id_b"))
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("nbands"))
  }

  /** [[embeddingSrpPairs]] with the banding DERIVED from the corpus —
    * the self-tuning production shape. Fixed banding has a hidden
    * quadratic: random pairs collide in a band with probability
    * 2^-r, so false candidates grow as n^2 * b * 2^-r — at r=14/b=24
    * the 200k-row ladder corpus produced 36M candidates (~180 per
    * row) and the verify fetch became the bottleneck. Deriving
    * (r, b) from [[srpParams]] with the random-pair band budget
    * scaled as ~64/n keeps expected false candidates ~32 per row AT
    * ANY n (r grows with log n, b grows to hold the recall contract:
    * (11,16) at 2k rows, (13,26) at 20k, (18,69) at 200k), so
    * candidate volume — and with it shuffle and verify cost — stays
    * linear in the corpus. Recall contract: pairs at cosine >= simAt
    * surface with probability >= recall (the planted-clone regime;
    * AnnSpec pins it measured).
    */
  /** The (rowsPerBand, bands) [[embeddingSrpPairsAuto]] derives for a
    * corpus of `n` rows: [[srpParams]] at the recall contract with the
    * random-pair band budget scaled ~64/n. ONE definition, used by the
    * operator and pinned by AnnSpec's two-corpus-size contract case.
    */
  def autoSrpBanding(n: Long, simAt: Double = 0.87,
      recall: Double = 0.9): (Int, Int) =
    srpParams(simAt, recall,
      fpBandBudget = math.min(0.01, 64.0 / math.max(1L, n).toDouble))

  def embeddingSrpPairsAuto(s: SparkSession, dir: String,
      threshold: Double = 0.45, simAt: Double = 0.87,
      recall: Double = 0.9): DataFrame = {
    val n = Tables.embeddings(s, dir).count()
    val (r, b) = autoSrpBanding(n, simAt, recall)
    embeddingSrpPairs(s, dir, threshold, bands = b, rowsPerBand = r)
  }

  /** Memoized dim-256 GenData twin of a shipped corpus dir — the
    * BENCH corpus for dedup_embedding_srp. The shipped embeddings are
    * dim-64 with n²-growing true pairs (the r7-adjudicated
    * measurability artifact); production embedding columns are
    * 256-4096-dim with ~linear clone density, which is exactly what
    * GenData's dim!=64 construction plants (~0.5% eps-clones). Scale
    * factor is parsed from the dir name (driver dirs are .../sfX);
    * generation is hash-deterministic and runs once per JVM.
    */
  private val benchDirCache =
    new java.util.concurrent.ConcurrentHashMap[String, String]()
  def dim256BenchDir(s: SparkSession, dir: String): String =
    benchDirCache.computeIfAbsent(dir, _ => {
      // floored at sf0.1 (2000 rows — trivial generation cost): below
      // that the ~0.5% clone draw can land on ZERO planted pairs and
      // the registry contract (rows > 0 at sf0.001) would flake; the
      // ladder SFs (0.1/1/10) are unaffected by the floor
      val sf = math.max(0.1, "sf([0-9.]+)".r.findFirstMatchIn(dir)
        .map(_.group(1).toDouble).getOrElse(0.1))
      // the output path carries a digest of the FULL dir string — the
      // same value the memo cache keys on. Keyed by sf alone, two
      // distinct dirs that parse to the same sf would race concurrent
      // Overwrite generations at one path against each other's reads.
      val dirTag = java.lang.Integer.toHexString(
        scala.util.hashing.MurmurHash3.stringHash(dir))
      val out = s"${System.getProperty("java.io.tmpdir")}/" +
        s"graft_bench_emb256_${dirTag}_sf$sf"
      graft.tools.GenData.generate(s, sf, out, seed = 0L, embDim = 256,
        tables = Some(Set("embeddings")))
      invalidateDim(out)
      out
    })

  /** The fixed probe set: the first `n` vec_ids. */
  def queryVectors(s: SparkSession, dir: String, n: Int = 5): DataFrame =
    Tables.embeddings(s, dir).filter(col("vec_id") < n)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))

  /** Exact top-k neighbors per query by (cosine desc, vec_id asc). */
  def bruteForceTopK(s: SparkSession, dir: String, k: Int = 10,
      nQueries: Int = 5): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    val corpus = Tables.embeddings(s, dir)
      .select(col("vec_id"), col("embedding"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("vec_id").asc)
    broadcast(queryVectors(s, dir, nQueries)).crossJoin(corpus)
      .filter(col("query_id") =!= col("vec_id"))
      .withColumn("cos", cosineExpr(col("qv"), col("embedding")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("vec_id").as("neighbor_id"))
      .orderBy("query_id", "rank")
  }

  val all: Map[String, Q] = Map(
    // ------------------------------------------------------------------
    // Exact cosine top-k. Output is ids+rank only: rank membership is
    // stable across engines (adjacent cosine gaps in the test data are
    // ~1e-3, far above float-vs-double noise), raw similarity doubles
    // are not.
    "ann_bruteforce_topk" -> Q(
      (s, dir) => bruteForceTopK(s, dir),
      Some("""
        WITH sims AS (
          SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                 list_cosine_similarity(q.embedding, c.embedding) AS cos
          FROM embeddings q JOIN embeddings c ON q.vec_id <> c.vec_id
          WHERE q.vec_id < 5),
        ranked AS (
          SELECT query_id, neighbor_id,
                 CAST(row_number() OVER (PARTITION BY query_id
                   ORDER BY cos DESC, neighbor_id ASC) AS INTEGER) AS rank
          FROM sims)
        SELECT query_id, rank, neighbor_id FROM ranked
        WHERE rank <= 10 ORDER BY query_id, rank""")),

    // ------------------------------------------------------------------
    // IVF top-k: assign every vector to its nearest cell, probe the 4
    // cells nearest each query, exact-rerank inside them. CELL-EXACTLY
    // oracled via the oracle-mode/scale-mode device (dedup_simhash's):
    // the verify fn runs the stride-sampled deterministic quantizer
    // (DuckDB replays seed selection, assignment, probe order and rank
    // bit-for-bit — ivfSeededOracleSql); the BENCHED shape stays the
    // KMeans-trained production index (benchFn), whose recall@10
    // AnnSpec measures against the brute force (ANN_RECALL.json).
    "ann_ivf_topk" -> Q(
      (s, dir) => {
        val dim = corpusDim(s, dir)
        require(dim == 64,
          s"ann_ivf_topk's oracle pins dim=64 but the corpus is $dim-dim")
        ivfTopKSeeded(s, dir)
      },
      Some(ivfSeededOracleSql),
      benchFn = Some((s, dir) => ivfTopK(s, dir))),

    // ------------------------------------------------------------------
    // Product-quantized ADC top-k with exact rerank: the 32x-
    // compressed serving path (see pqTopK). CELL-EXACTLY oracled the
    // same way: verify fn uses seed-sliced codebooks + integer ADC
    // (pqSeededOracleSql replays encode/LUT/shortlist/rerank); the
    // benched shape stays the KMeans-trained codebooks (benchFn),
    // recall@10 in ANN_RECALL_PQ.json.
    "ann_pq_topk" -> Q(
      (s, dir) => {
        val dim = corpusDim(s, dir)
        require(dim == 64,
          s"ann_pq_topk's oracle pins dim=64 (subLen=8) but the corpus is $dim-dim")
        pqTopKSeeded(s, dir)
      },
      Some(pqSeededOracleSql),
      benchFn = Some((s, dir) => pqTopK(s, dir))),

    // ------------------------------------------------------------------
    // IVF-PQ top-k: the COMPOSED production serving index (coarse IVF
    // probe restricts candidates, PQ ADC scores them dim-free, exact
    // rerank repairs recall) — see ivfPqAdc for why this is the only
    // member of the family whose per-query cost pays dim nowhere in
    // the scan. CELL-EXACTLY oracled by composing the two established
    // replays: verify fn runs stride-seeded cells AND stride-seeded
    // codebooks (ivfPqSeededOracleSql replays both stages plus the
    // probed-cell candidate restriction); the BENCHED shape serves the
    // dim-256 GenData twin with a KMeans-trained index sized
    // cells~sqrt(n) (ivfPqTopKD256) — the serving family's first
    // production-dim measurement (recall floor in ANN_RECALL_D256).
    "ann_ivfpq_topk" -> Q(
      (s, dir) => {
        val dim = corpusDim(s, dir)
        require(dim == 64,
          s"ann_ivfpq_topk's oracle pins dim=64 (subLen=8) but the corpus is $dim-dim")
        ivfPqTopKSeeded(s, dir)
      },
      Some(ivfPqSeededOracleSql),
      benchFn = Some((s, dir) => ivfPqTopKD256(s, dir))),

    // ------------------------------------------------------------------
    // Top-PC projection per vector (see pcaTopComponent) — CELL-
    // EXACTLY oracled despite being iterative: every per-step
    // statistic is a floor-quantized BIGINT sum and every derived
    // double comes from the same IEEE ops in the same order, so the
    // unrolled-CTE DuckDB replay below (the graph_pagerank device,
    // floating-point edition) reproduces v — and hence every pc1 —
    // to the bit. AnnSpec additionally asserts partition-invariance,
    // variance capture, and determinism.
    "emb_pca" -> Q(
      (s, dir) => {
        // the oracle unrolls range(64) CTEs; a corpus with a different
        // dim must fail loudly here, not hash-mismatch mysteriously
        val dim = corpusDim(s, dir)
        require(dim == 64,
          s"emb_pca's oracle pins dim=64 but the corpus is $dim-dim — " +
            "regenerate pcaOracleSql for the new dimension")
        pcaTopComponent(s, dir)._2
      },
      Some(pcaOracleSql(8))),

    // ------------------------------------------------------------------
    // int8 symmetric quantization of the embedding column (the
    // storage/serving compression step: 4x smaller vectors, int-dot
    // reranking). Per-row expression work only — no shuffle, scales
    // linearly. Quantizer is floor(x*scale + 0.5) rather than
    // round(): floor is bit-identical across engines, so the entire
    // int8 codebook is oracled cell-exactly. The float->double
    // widening and the single IEEE divide/multiply are exact in both
    // engines.
    "emb_quantize" -> Q(
      (s, dir) => {
        Tables.embeddings(s, dir)
          .withColumn("xs", expr("transform(embedding, x -> CAST(x AS DOUBLE))"))
          .withColumn("maxabs", expr("array_max(transform(xs, x -> abs(x)))"))
          .filter(col("maxabs") > 0)
          .withColumn("scale", lit(127.0) / col("maxabs"))
          .withColumn("qvec", expr(
            "concat_ws(',', transform(xs, x -> CAST(floor(x * scale + 0.5d) AS INT)))"))
          .select(col("vec_id"), col("scale"), col("qvec"))
          .orderBy("vec_id")
      },
      Some("""
        SELECT vec_id, 127.0 / maxabs AS scale,
               array_to_string(list_transform(xs,
                 x -> CAST(floor(x * (127.0 / maxabs) + 0.5) AS INTEGER)), ',')
                 AS qvec
        FROM (SELECT vec_id,
                     list_transform(embedding, x -> CAST(x AS DOUBLE)) AS xs,
                     list_max(list_transform(embedding,
                       x -> abs(CAST(x AS DOUBLE)))) AS maxabs
              FROM embeddings)
        WHERE maxabs > 0 ORDER BY vec_id""")),

    // ------------------------------------------------------------------
    // Per-label embedding centroids (cluster prototypes for IVF
    // training, class means for probing / dataset cartography). The
    // elementwise mean is computed by position-explode + hash agg on
    // (label, position) — corpus-linear, no per-group array buffering
    // anywhere, so a label with a billion members costs the same
    // shuffle width as one with ten. Exactness: each float widens to
    // double exactly, is rounded to 6 decimals (no double is ever ON
    // a scale-6 tie, midpoints are not binary-representable, so both
    // engines' tie rules are moot), then sums exactly as
    // DECIMAL(18,6). The mean is then rounded to 6 decimals in pure
    // INTEGER micro-unit arithmetic — HALF_UP((2|m|+cnt) div 2cnt) —
    // and formatted from integers, because %.6f of an IEEE quotient
    // is NOT cross-engine stable: the JVM formats the double's
    // shortest decimal representation (so a quotient like
    // -0.0230924999...8, shortest repr -0.0230925, HALF_UPs to
    // -0.023093) while C/fmt printf correctly rounds the exact binary
    // value (-0.023092). Integer arithmetic sidesteps the divergence.
    // Output is the string-joined centroid (ch_grouparray's portable
    // scalar device).
    "emb_centroid" -> Q(
      (s, dir) => {
        Tables.embeddings(s, dir)
          .select(col("label"), posexplode(col("embedding")).as(Seq("pos", "v")))
          .select(col("label"), (col("pos") + 1).as("i"),
            round(col("v").cast("double"), 6)
              .cast(org.apache.spark.sql.types.DecimalType(18, 6)).as("v6"))
          .groupBy("label", "i")
          .agg((sum(col("v6")) * lit(1000000)).cast("long").as("m"),
            count(lit(1)).as("cnt"))
          // c6 = HALF_UP(m / cnt) in scale-6 micro units, exactly.
          .withColumn("c6",
            when(col("m") >= 0,
              expr("(2 * m + cnt) div (2 * cnt)"))
              .otherwise(-expr("(2 * (-m) + cnt) div (2 * cnt)")))
          .withColumn("cs", format_string("%s%d.%06d",
            when(col("c6") < 0, lit("-")).otherwise(lit("")),
            expr("abs(c6) div 1000000"), expr("abs(c6) % 1000000")))
          .groupBy("label")
          .agg(
            concat_ws(",",
              transform(array_sort(collect_list(struct(col("i"), col("cs")))),
                x => x("cs"))).as("centroid"),
            max(col("cnt")).as("n_vectors"))
          .orderBy("label")
      },
      Some("""
        WITH e0 AS (SELECT label, generate_subscripts(embedding, 1) AS i,
                           unnest(embedding) AS v
                    FROM embeddings),
        e AS (SELECT label, i,
                CAST(round(CAST(v AS DOUBLE), 6) AS DECIMAL(18,6)) AS v6
              FROM e0),
        m AS (SELECT label, i, CAST(sum(v6) * 1000000 AS BIGINT) AS m,
                     count(*) AS cnt
              FROM e GROUP BY label, i),
        r AS (SELECT label, i, cnt,
                CASE WHEN m >= 0 THEN (2 * m + cnt) // (2 * cnt)
                     ELSE -((2 * (-m) + cnt) // (2 * cnt)) END AS c6
              FROM m)
        SELECT label,
               array_to_string(array_agg(
                 printf('%s%d.%06d',
                   CASE WHEN c6 < 0 THEN '-' ELSE '' END,
                   abs(c6) // 1000000, abs(c6) % 1000000)
                 ORDER BY i), ',') AS centroid,
               max(cnt) AS n_vectors
        FROM r GROUP BY label ORDER BY label""")),

    // ------------------------------------------------------------------
    // Self-kNN JOIN: the corpus-wide neighbor graph (each vector's k
    // nearest by cosine) — the construction step semantic dedup,
    // clustering diagnostics and hard-negative mining start from.
    // Unlike the ann_*_topk rows (tiny broadcast query set), BOTH
    // sides are the full corpus, so nothing broadcasts: candidates
    // come from a cell-keyed shuffle-hash join (see knnJoin's
    // scaladoc for the n^1.5 cost argument and the two baked-in sf10
    // lessons). CELL-EXACTLY oracled via the stride-seeded quantizer
    // (knnJoinSeededOracleSql replays assignment, probe set and rank
    // bit-for-bit); the BENCHED shape is the dim-256 twin under a
    // KMeans-trained index sized cells ~ sqrt(n) (knnJoinD256).
    "ann_knn_join" -> Q(
      (s, dir) => {
        val dim = corpusDim(s, dir)
        require(dim == 64,
          s"ann_knn_join's oracle pins dim=64 but the corpus is $dim-dim")
        knnJoinSeeded(s, dir)
      },
      Some(knnJoinSeededOracleSql),
      benchFn = Some((s, dir) => knnJoinD256(s, dir)))
  )

  /** Product-quantization codebooks: one seeded KMeans per subspace
    * over the corpus's subvector slices. Memoized like
    * [[fitCellsCached]] (same in-process + on-disk two-level cache) —
    * a PQ index trains once, serves many times. Driver state is
    * m x ks x (dim/m) doubles (tiny at any corpus size; training
    * reads a sample at real scale).
    */
  def fitPqCodebooks(s: SparkSession, dir: String, m: Int, ks: Int)
      : Seq[Seq[Seq[Double]]] =
    centroidCache.computeIfAbsent(
      (dir, s"pq$m-$ks"),
      _ => {
        // dim probe: pins the expected subspace length so a cached
        // entry with right (m, ks) but wrong subLen is rejected
        val expectLen = Tables.embeddings(s, dir)
          .select(size(col("embedding"))).head.getInt(0) / m
        val (dims, flat) = diskCachedDoubles(
          s"${corpusFingerprint(dir)}-$TrainVersion-pq$m-$ks",
          dims => dims == Seq(m, ks, expectLen),
          {
            val emb = Tables.embeddings(s, dir)
              .select(l2normExpr(col("embedding")).as("nv"))
              .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
            try {
              val books = (0 until m).map { sub =>
                fitCells(emb.select(
                  slice(col("nv"), sub * expectLen + 1, expectLen).as("nv")), ks)
              }
              // the claimed (m, ks, expectLen) shape must be the REAL
              // shape — a short book (degenerate KMeans) would
              // otherwise shift every later codeword in the flat
              // array and corrupt the reshape silently
              require(books.forall(b =>
                  b.length == ks && b.forall(_.length == expectLen)),
                s"PQ training returned a ragged codebook (expected $m x $ks x $expectLen): " +
                  books.map(_.length).mkString(","))
              (Seq(m, ks, expectLen), books.flatten.flatten.toArray)
            } finally { emb.unpersist(blocking = false): Unit }
          })
        flat.grouped(dims(2)).map(_.toSeq).grouped(dims(1)).map(_.toSeq).toSeq
      }
    ).asInstanceOf[Seq[Seq[Seq[Double]]]]

  /** PQ + ADC top-k — the memory-bound serving path: each corpus
    * vector is stored as m codebook ids (m bytes at ks<=256, a 32x
    * compression of 64 floats), and query-to-corpus similarity is a
    * TABLE LOOKUP sum, never a full dot product.
    *
    * Spark-first formulation, no custom kernel needed:
    *  1. encode: per subspace, the nearest-codeword id via the same
    *     native graft_cells expression IVF uses — per-row codegen
    *     work, no shuffle;
    *  2. the lookup table (query x subspace x codeword partial dot,
    *     q*m*ks rows) is computed as a broadcast DataFrame;
    *  3. ADC = explode codes to (vec_id, sub, code), broadcast-join
    *     the LUT, per-(query, vec) SUM — a map-side-combinable hash
    *     aggregation, so the shuffle carries one row per (query,
    *     candidate), not per code;
    *  4. exact rerank of the top `rr` ADC candidates (the standard
    *     recall repair; raw vectors are fetched for rr rows only).
    *
    * On the unit sphere cos(q, x_hat) = sum_sub dot(q_sub, cw_sub),
    * so ADC approximates cosine directly (similarity, not distance).
    */
  def pqTopK(s: SparkSession, dir: String, k: Int = 10, m: Int = 8,
      ks: Int = 32, rr: Int = 100): DataFrame =
    pqAdc(s, dir, fitPqCodebooks(s, dir, m, ks), k, m, rr)

  /** The PQ encode / LUT / ADC / rerank pipeline shared by the
    * trained ([[pqTopK]]) and seeded ([[pqTopKSeeded]]) codebooks.
    * ADC partials are floor-quantized to 1e-12 units so the shortlist
    * score is an exact BIGINT sum — order-independent under any
    * partitioning (and engine: it is what lets the seeded variant's
    * DuckDB oracle replay the shortlist cell-exactly). 1e-12 is far
    * below any real ADC gap, so recall is unchanged (AnnSpec).
    */
  private def pqAdc(s: SparkSession, dir: String,
      books: Seq[Seq[Seq[Double]]], k: Int, m: Int, rr: Int): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    import s.implicits._
    val emb = nvCache(s, dir)
    val dim = books.map(_.head.length).sum
    val subLen = dim / m

    // 1. encode: ONE native PqEncode pass -> m codeword ids per
    // vector, exploded for the ADC join
    val codes = emb.select(col("vec_id"),
      posexplode(pqEncodeExpr(col("nv"), books)).as(Seq("sub", "code")))

    // 2. LUT: (query, sub, code) -> partial dot with that codeword
    val bookDf = broadcast(books.zipWithIndex.flatMap { case (cb, sub) =>
      cb.zipWithIndex.map { case (cw, code) => (sub, code, cw) }
    }.toDF("sub", "code", "cw"))
    val queries = queryVectors(s, dir)
      .select(col("query_id"), l2normExpr(col("qv")).as("qnv"))
    val lut = broadcast(queries.crossJoin(bookDf)
      .select(col("query_id"), col("sub"), col("code"),
        floor(dot(
            slice(col("qnv"), col("sub") * lit(subLen) + lit(1), lit(subLen)),
            col("cw")) * lit(1e12)).cast("long").as("contrib_q")))

    // 3. ADC score + shortlist (exact integer sum of 1e-12-unit
    // partials — order-free, see pqAdc scaladoc)
    val wApprox = Window.partitionBy("query_id")
      .orderBy(col("approx_cos").desc, col("vec_id").asc)
    val shortlist = codes.join(lut, Seq("sub", "code"))
      .filter(col("query_id") =!= col("vec_id"))
      .groupBy("query_id", "vec_id")
      .agg(sum(col("contrib_q")).as("approx_cos"))
      .withColumn("arank", row_number().over(wApprox))
      .filter(col("arank") <= rr)
      .select("query_id", "vec_id")

    // 4. exact rerank of the shortlist only
    val wExact = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("vec_id").asc)
    shortlist
      .join(emb, Seq("vec_id"))
      .join(broadcast(queries), Seq("query_id"))
      .withColumn("cos", dot(col("qnv"), col("nv")))
      .withColumn("rank", row_number().over(wExact))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("vec_id").as("neighbor_id"))
      .orderBy("query_id", "rank")
  }

  /** Top principal component by distributed power iteration — the
    * dimensionality-reduction / whitening primitive of an embedding
    * pipeline. Each step is ONE tiny aggregation: v <- normalize(
    * sum_x x * (x . v)), where the per-dimension contributions are
    * quantized to 1e-12 units via floor() so each step's statistic is
    * an exact BIGINT sum — bit-identical under any partitioning (a
    * raw double sum would drift with partition order), asserted in
    * AnnSpec. floor (not decimal rounding) is the load-bearing
    * choice: floor of a double is a pure IEEE op every engine
    * computes identically, where decimal HALF_UP rounding routes
    * through a decimal string/int128 representation that differs
    * between engines on boundary values — with floor, the whole
    * iteration is replayable by the DuckDB oracle to the bit
    * (normalization is scale-invariant, so the 1e12 factor cancels
    * and never needs dividing back out). Driver state is one
    * dim-length vector per step; the corpus is never collected.
    * iters=8 suffices: the Rayleigh quotient stabilizes to 9 decimals
    * on this corpus by iteration 6.
    */
  def pcaTopComponent(s: SparkSession, dir: String, iters: Int = 8)
      : (Seq[Double], DataFrame) = {
    graft.functions.GraftFunctions.register(s)
    val emb = nvCache(s, dir)
    val dim = emb.select(size(col("nv"))).head.getInt(0)
    var v: Seq[Double] = Seq.tabulate(dim)(i => if (i == 0) 1.0 else 0.0)
    for (_ <- 0 until iters) {
      val sums = emb
        .select(dot(col("nv"), typedLit(v)).as("proj"), col("nv"))
        .select(posexplode(col("nv")).as(Seq("pos", "x")), col("proj"))
        .select(col("pos"),
          floor(col("x") * col("proj") * lit(1e12)).as("q"))
        .groupBy("pos").agg(sum(col("q")).as("s"))
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
      val raw = Seq.tabulate(dim)(p => sums(p).toDouble)
      val norm = math.sqrt(raw.map(x => x * x).sum)
      v = raw.map(_ / norm)
    }
    // pc1 floor-quantized to 1e-9: deterministic in both engines from
    // the bit-identical v (a round() here would reopen the same
    // engine-divergent decimal path the iteration just closed)
    val projections = emb
      .select(col("vec_id"),
        floor(dot(col("nv"), typedLit(v)) * lit(1e9)).as("pc1_q"))
      .select(col("vec_id"),
        (col("pc1_q").cast("double") / lit(1e9)).as("pc1"))
      .orderBy("vec_id")
    (v, projections)
  }

  /** Shared oracle prelude: exact double view of the corpus and the
    * L2-normalized vectors via the same 0.0-seeded left fold Spark's
    * l2normExpr runs — nv is bit-identical (the emb_pca argument).
    */
  // def, not val: the registry map `all` above initializes first and
  // interpolates this — a later-declared val would still be null then
  private def nvPrelude: String = """
      WITH ed AS (
        SELECT vec_id, [CAST(x AS DOUBLE) for x in embedding] AS e
        FROM embeddings),
      nvt AS MATERIALIZED (
        SELECT vec_id, [x / nrm for x in e] AS nv
        FROM (SELECT vec_id, e,
                sqrt(list_reduce(list_prepend(0.0, [x * x for x in e]),
                     (acc, t) -> acc + t)) AS nrm
              FROM ed))"""

  /** DuckDB replay of [[ivfTopKSeeded]] (cells=8, nprobe=4, k=10,
    * dim pinned 64). Exactness: seeds are integer-selected; every
    * distance / dot is the same index-ascending 0.0-seeded fold
    * graft_cells / graft_dot run (NearestCells accumulates
    * coordinate-wise in index order), so assignment, probe order and
    * rank are bit-identical; ties (none in random data, but pinned
    * anyway) break on the smaller cell / vec_id in both engines.
    */
  private def ivfSeededOracleSql: String = s"""
      $nvPrelude,
      st AS (SELECT count(*) // 8 AS stride FROM nvt),
      sd AS MATERIALIZED (
        SELECT CAST(vec_id // (SELECT stride FROM st) AS INTEGER) AS cell,
               nv AS snv
        FROM nvt
        WHERE vec_id % (SELECT stride FROM st) = 0
          AND vec_id < 8 * (SELECT stride FROM st)),
      asg AS MATERIALIZED (
        SELECT vec_id, nv, cell FROM (
          SELECT x.vec_id, x.nv, s.cell,
                 row_number() OVER (PARTITION BY x.vec_id ORDER BY
                   list_reduce(list_prepend(0.0,
                     [(s.snv[i+1] - x.nv[i+1]) * (s.snv[i+1] - x.nv[i+1])
                      for i in range(64)]), (acc, t) -> acc + t) ASC,
                   s.cell ASC) AS rn
          FROM nvt x CROSS JOIN sd s)
        WHERE rn = 1),
      qp AS (
        SELECT query_id, qnv, cell FROM (
          SELECT q.vec_id AS query_id, q.nv AS qnv, s.cell,
                 row_number() OVER (PARTITION BY q.vec_id ORDER BY
                   list_reduce(list_prepend(0.0,
                     [(s.snv[i+1] - q.nv[i+1]) * (s.snv[i+1] - q.nv[i+1])
                      for i in range(64)]), (acc, t) -> acc + t) ASC,
                   s.cell ASC) AS rn
          FROM nvt q CROSS JOIN sd s WHERE q.vec_id < 5)
        WHERE rn <= 4),
      cand AS (
        SELECT p.query_id, a.vec_id,
               list_reduce(list_prepend(0.0,
                 [p.qnv[i+1] * a.nv[i+1] for i in range(64)]),
                 (acc, t) -> acc + t) AS cos
        FROM qp p JOIN asg a USING (cell)
        WHERE p.query_id <> a.vec_id),
      ranked AS (
        SELECT query_id, vec_id AS neighbor_id,
               CAST(row_number() OVER (PARTITION BY query_id
                 ORDER BY cos DESC, vec_id ASC) AS INTEGER) AS rank
        FROM cand)
      SELECT query_id, rank, neighbor_id FROM ranked
      WHERE rank <= 10 ORDER BY query_id, rank"""

  /** DuckDB replay of [[pqTopKSeeded]] (m=8, ks=32, subLen=8,
    * rerank=100, k=10, dim pinned 64). Codeword c of subspace sub is
    * seed vector c's sub-th slice; encode is the same per-subspace
    * argmin fold; ADC partials floor-quantize to 1e-12-unit BIGINTs
    * so the 8-way shortlist sum is exact integer in both engines
    * (order-free — the one place a raw double sum could diverge);
    * the rerank cosine is the shared fold.
    */
  private def pqSeededOracleSql: String = s"""
      $nvPrelude,
      st AS (SELECT count(*) // 32 AS stride FROM nvt),
      sd AS MATERIALIZED (
        SELECT CAST(vec_id // (SELECT stride FROM st) AS INTEGER) AS code,
               nv AS snv
        FROM nvt
        WHERE vec_id % (SELECT stride FROM st) = 0
          AND vec_id < 32 * (SELECT stride FROM st)),
      enc AS MATERIALIZED (
        SELECT vec_id, sub, code FROM (
          SELECT x.vec_id, t.sub, s.code,
                 row_number() OVER (PARTITION BY x.vec_id, t.sub ORDER BY
                   list_reduce(list_prepend(0.0,
                     [(s.snv[t.sub*8 + i + 1] - x.nv[t.sub*8 + i + 1])
                      * (s.snv[t.sub*8 + i + 1] - x.nv[t.sub*8 + i + 1])
                      for i in range(8)]), (acc, u) -> acc + u) ASC,
                   s.code ASC) AS rn
          FROM nvt x CROSS JOIN range(8) t(sub) CROSS JOIN sd s)
        WHERE rn = 1),
      lut AS MATERIALIZED (
        SELECT q.vec_id AS query_id, t.sub, s.code,
               CAST(floor(list_reduce(list_prepend(0.0,
                 [q.nv[t.sub*8 + i + 1] * s.snv[t.sub*8 + i + 1]
                  for i in range(8)]), (acc, u) -> acc + u)
                 * 1000000000000.0) AS BIGINT) AS contrib_q
        FROM nvt q CROSS JOIN range(8) t(sub) CROSS JOIN sd s
        WHERE q.vec_id < 5),
      adc AS (
        SELECT l.query_id, e.vec_id, CAST(sum(l.contrib_q) AS BIGINT) AS approx
        FROM enc e JOIN lut l ON e.sub = l.sub AND e.code = l.code
        WHERE l.query_id <> e.vec_id
        GROUP BY l.query_id, e.vec_id),
      short AS (
        SELECT query_id, vec_id FROM (
          SELECT query_id, vec_id,
                 row_number() OVER (PARTITION BY query_id
                   ORDER BY approx DESC, vec_id ASC) AS arank
          FROM adc)
        WHERE arank <= 100),
      rer AS (
        SELECT sh.query_id, sh.vec_id,
               list_reduce(list_prepend(0.0,
                 [q.nv[i+1] * x.nv[i+1] for i in range(64)]),
                 (acc, u) -> acc + u) AS cos
        FROM short sh
        JOIN nvt x ON x.vec_id = sh.vec_id
        JOIN nvt q ON q.vec_id = sh.query_id),
      ranked AS (
        SELECT query_id, vec_id AS neighbor_id,
               CAST(row_number() OVER (PARTITION BY query_id
                 ORDER BY cos DESC, vec_id ASC) AS INTEGER) AS rank
        FROM rer)
      SELECT query_id, rank, neighbor_id FROM ranked
      WHERE rank <= 10 ORDER BY query_id, rank"""

  /** DuckDB replay of [[pcaTopComponent]]: one CTE pair per power-
    * iteration step, same integer recurrence. Exactness argument:
    *  - nv: float->double casts are exact; the l2 norm is the same
    *    0.0-seeded left fold (list_reduce over a list_prepend(0.0,..))
    *    graft_dot / Spark's aggregate() run, and sqrt / divide are
    *    correctly-rounded IEEE ops — nv is bit-identical.
    *  - per step: proj is the same ordered fold; the per-dimension
    *    contribution floor(nv[i]*proj*1e12) is a pure IEEE mul-mul-
    *    floor, so the BIGINT sums are exact and order-independent;
    *    v = raw/||raw|| uses the same fold + sqrt + divide.
    *  - pc1 = floor(dot*1e9)/1e9 from bit-identical v.
    * Dim is pinned to 64 (all shipped corpora; the Spark side reads
    * it from data and agrees). ~dim*n rows per step CTE — trivial at
    * oracle SF.
    */
  private def pcaOracleSql(iters: Int): String = {
    val fold = "(a, b) -> a + b"
    def dotNvV = s"""list_reduce(list_prepend(0.0,
            [nv[i+1] * v[i+1] for i in range(64)]), $fold)"""
    val prelude = s"""
      WITH ed AS (
        SELECT vec_id, [CAST(x AS DOUBLE) for x in embedding] AS e
        FROM embeddings),
      nvt AS (
        SELECT vec_id, [x / nrm for x in e] AS nv
        FROM (SELECT vec_id, e,
                sqrt(list_reduce(list_prepend(0.0, [x * x for x in e]),
                                 $fold)) AS nrm
              FROM ed)),
      v0 AS (SELECT [CASE WHEN i = 0 THEN 1.0 ELSE 0.0 END
                     for i in range(64)] AS v)"""
    val steps = (1 to iters).map { k =>
      s"""
      p$k AS (
        SELECT vec_id, nv, $dotNvV AS proj
        FROM nvt, v${k - 1}),
      s$k AS (
        SELECT i AS pos,
          CAST(sum(CAST(floor(nv[i+1] * proj * 1000000000000.0) AS BIGINT))
               AS BIGINT) AS s
        FROM p$k, range(64) t(i)
        GROUP BY i),
      v$k AS (
        SELECT [r / nrm for r in raws] AS v
        FROM (SELECT raws,
                sqrt(list_reduce(list_prepend(0.0, [r * r for r in raws]),
                                 $fold)) AS nrm
              FROM (SELECT list(CAST(s AS DOUBLE) ORDER BY pos) AS raws
                    FROM s$k)))"""
    }.mkString(",\n", ",\n", "")
    prelude + steps + s"""
      SELECT vec_id,
        CAST(floor($dotNvV * 1000000000.0) AS BIGINT) / 1000000000.0 AS pc1
      FROM nvt, v$iters
      ORDER BY vec_id"""
  }

  /** Default cells/nprobe are sized for the test corpus (500 random
    * 64-dim vectors): measured recall@10 = 0.92 at cells=8, nprobe=4.
    * At corpus scale size cells ~ sqrt(n) and tune nprobe to the
    * recall target; on data with real cluster structure the
    * recall-per-probe is far better than on this uniform test set.
    */
  def ivfTopK(s: SparkSession, dir: String, k: Int = 10,
      cells: Int = 8, nprobe: Int = 4): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    val emb = nvCache(s, dir)
    ivfProbe(s, dir, emb, fitCellsCached(dir, cells, emb), k, nprobe)
  }

  /** The IVF probe path shared by the trained and seeded quantizers:
    * corpus side takes its primary cell only (classic IVF); query
    * side probes the nprobe nearest cells. Both assignments are the
    * same per-row codegen expression — no driver round-trip, no
    * extra shuffle; the only shuffle is the cell-keyed candidate
    * join, which is the 100 TB shape (cells bucket the corpus).
    */
  private def ivfProbe(s: SparkSession, dir: String, emb: DataFrame,
      cents: Seq[Seq[Double]], k: Int, nprobe: Int): DataFrame = {
    val assigned = emb.withColumn("cell",
      element_at(nearestCellsExpr(col("nv"), cents, 1), 1))
    val queries = queryVectors(s, dir)
      .select(col("query_id"), l2normExpr(col("qv")).as("qnv"))
      .withColumn("cell", explode(nearestCellsExpr(col("qnv"), cents, nprobe)))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("vec_id").asc)
    broadcast(queries)
      .join(assigned, Seq("cell"))
      .filter(col("query_id") =!= col("vec_id"))
      .withColumn("cos", dot(col("qnv"), col("nv")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("vec_id").as("neighbor_id"))
      .orderBy("query_id", "rank")
  }

  /** Deterministic stride-sampled coarse centroids — the ORACLE-MODE
    * quantizer (vs the KMeans-trained scale mode, the dedup_simhash
    * md5/xxhash64 device): the `cells` corpus vectors at vec_id in
    * {0, stride, 2*stride, ...}, stride = n div cells, L2-normalized.
    * Sampling corpus points as coarse centroids is a standard
    * non-trained IVF quantizer; here it additionally makes the WHOLE
    * index replayable: seed selection is pure integer arithmetic and
    * nv is a bit-identical fold in both engines, so cell assignment,
    * probe order and the final rank are cell-exact in DuckDB.
    * Centroid list is ordered by vec_id, so cell id == vec_id div
    * stride in both engines.
    */
  def seedCentroids(s: SparkSession, dir: String, cells: Int): Seq[Seq[Double]] = {
    graft.functions.GraftFunctions.register(s)
    val n = Tables.embeddings(s, dir).count()
    require(n >= cells, s"ANN corpus has $n vectors < $cells seed cells")
    val stride = n / cells
    val seeds = Tables.embeddings(s, dir)
      .filter(col("vec_id") % stride === 0 && col("vec_id") < stride * cells)
      .select(col("vec_id"), l2normExpr(col("embedding")).as("nv"))
      .orderBy("vec_id")
      .collect()
      .map(_.getSeq[Double](1).toSeq).toSeq
    // the stride filter assumes a dense 0..n-1 vec_id domain; on a
    // sparse-id corpus it would silently under-seed the index (and the
    // oracle, replaying the same arithmetic, would still agree) — so a
    // short seed list must fail loudly here instead
    require(seeds.length == cells,
      s"seedCentroids got ${seeds.length} of $cells seeds — vec_id is " +
        "not a dense 0..n-1 domain; re-key the corpus or train KMeans cells")
    seeds
  }

  /** [[ivfTopK]] with the stride-sampled oracle-mode quantizer. */
  def ivfTopKSeeded(s: SparkSession, dir: String, k: Int = 10,
      cells: Int = 8, nprobe: Int = 4): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    val emb = nvCache(s, dir)
    ivfProbe(s, dir, emb, seedCentroids(s, dir, cells), k, nprobe)
  }

  /** [[pqTopK]] with oracle-mode codebooks: codeword c of subspace
    * sub is the sub-th slice of seed vector c (the same stride
    * sample [[seedCentroids]] takes, at ks seeds). The encode / LUT
    * / ADC / rerank pipeline is IDENTICAL to the trained path.
    */
  def pqTopKSeeded(s: SparkSession, dir: String, k: Int = 10, m: Int = 8,
      ks: Int = 32, rr: Int = 100): DataFrame = {
    val seeds = seedCentroids(s, dir, ks)
    val subLen = seeds.head.length / m
    val books = (0 until m).map { sub =>
      seeds.map(_.slice(sub * subLen, (sub + 1) * subLen))
    }
    pqAdc(s, dir, books, k, m, rr)
  }

  // ---- IVF-PQ: the composed production serving index ----------------

  /** IVF-PQ top-k — the PRODUCTION high-dimension serving composition
    * (the FAISS IVFx,PQy shape): a coarse IVF stage restricts the
    * candidate set to the `nprobe` cells nearest each query, then PQ
    * ADC scores ONLY those candidates from their m-byte codes, and the
    * top `rr` rerank exactly. Vs the registry's two single-stage rows:
    * ann_ivf_topk pays an exact dot per candidate (dim multiplies the
    * probe cost — untenable at dim >= 256), ann_pq_topk ADC-scans the
    * WHOLE corpus per query (n multiplies the LUT-lookup cost). The
    * composition pays dim nowhere in the scan (codes are dim-free
    * lookups) and n only within probed cells — which is why every
    * production vector store serves from exactly this index.
    *
    * Plan shape (100 TB argument): corpus-side work is one codegen
    * pass emitting (cell, m codes) per vector — at scale this is the
    * persisted index, bucketed by cell. The probe set broadcasts; the
    * candidate restriction is a broadcast semi-join on cell; ADC
    * partials come from a broadcast (query x sub x code) LUT; the
    * per-(query, candidate) sum is a map-side-combinable hash agg
    * keyed (query_id, vec_id); only rr rows per query fetch raw
    * vectors for the rerank. No shuffle carries a raw vector except
    * the final rr-row fetch.
    *
    * ADC partials are floor-quantized to 1e-12 units ([[pqAdc]]'s
    * device), so the shortlist is an exact BIGINT sum — order-free
    * under any partitioning, and DuckDB-replayable in oracle mode.
    */
  private def ivfPqAdc(s: SparkSession, dir: String, emb: DataFrame,
      cents: Seq[Seq[Double]], books: Seq[Seq[Seq[Double]]],
      k: Int, nprobe: Int, rr: Int,
      queriesOpt: Option[DataFrame] = None): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    import s.implicits._
    val m = books.length
    val dim = books.map(_.head.length).sum
    val subLen = dim / m

    // one codegen pass per corpus vector: coarse cell + all m PQ
    // codes (one native PqEncode node). The cell expression MUST be
    // projected in its own select BELOW the explode: in a select
    // that mixes a generator with other expressions, Spark plans the
    // non-generator expressions ABOVE the Generate, re-evaluating
    // the full cells x dim nearest-cell scan once per EXPLODED row
    // (m x per vector — measured 14.4 s vs 0.55 s at sf1/dim 256).
    val assigned = emb
      .select(col("vec_id"),
        element_at(nearestCellsExpr(col("nv"), cents, 1), 1).as("cell"),
        pqEncodeExpr(col("nv"), books).as("codes"))
      .select(col("vec_id"), col("cell"),
        posexplode(col("codes")).as(Seq("sub", "code")))

    val queries = queriesOpt.getOrElse(queryVectors(s, dir))
      .select(col("query_id"), l2normExpr(col("qv")).as("qnv"))
    val probes = broadcast(queries
      .withColumn("cell", explode(nearestCellsExpr(col("qnv"), cents, nprobe)))
      .select("query_id", "cell"))

    val bookDf = broadcast(books.zipWithIndex.flatMap { case (cb, sub) =>
      cb.zipWithIndex.map { case (cw, code) => (sub, code, cw) }
    }.toDF("sub", "code", "cw"))
    val lut = broadcast(queries.crossJoin(bookDf)
      .select(col("query_id"), col("sub"), col("code"),
        floor(dot(
            slice(col("qnv"), col("sub") * lit(subLen) + lit(1), lit(subLen)),
            col("cw")) * lit(1e12)).cast("long").as("contrib_q")))

    // candidate restriction (broadcast semi-shape on cell) -> ADC sum
    val wApprox = Window.partitionBy("query_id")
      .orderBy(col("approx_cos").desc, col("vec_id").asc)
    val shortlist = assigned
      .join(probes, Seq("cell"))
      .join(lut, Seq("query_id", "sub", "code"))
      .filter(col("query_id") =!= col("vec_id"))
      .groupBy("query_id", "vec_id")
      .agg(sum(col("contrib_q")).as("approx_cos"))
      .withColumn("arank", row_number().over(wApprox))
      .filter(col("arank") <= rr)
      .select("query_id", "vec_id")

    val wExact = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("vec_id").asc)
    shortlist
      .join(emb, Seq("vec_id"))
      .join(broadcast(queries), Seq("query_id"))
      .withColumn("cos", dot(col("qnv"), col("nv")))
      .withColumn("rank", row_number().over(wExact))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("vec_id").as("neighbor_id"))
      .orderBy("query_id", "rank")
  }

  /** [[ivfPqAdc]] with the TRAINED index: KMeans coarse cells +
    * per-subspace KMeans codebooks, both disk-memoized (train once,
    * serve many — [[fitCellsCached]] / [[fitPqCodebooks]]).
    */
  def ivfPqTopK(s: SparkSession, dir: String, k: Int = 10, cells: Int = 8,
      nprobe: Int = 4, m: Int = 8, ks: Int = 32, rr: Int = 100,
      nQueries: Int = 5): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    val emb = nvCache(s, dir)
    ivfPqAdc(s, dir, emb, fitCellsCached(dir, cells, emb),
      fitPqCodebooks(s, dir, m, ks), k, nprobe, rr,
      queriesOpt = if (nQueries == 5) None
        else Some(queryVectors(s, dir, nQueries)))
  }

  /** [[ivfPqAdc]] with oracle-mode state: stride-sampled coarse
    * centroids (cells=8) AND stride-sampled codebooks (ks=32 seed
    * slices) — both pure integer seed arithmetic, so the WHOLE
    * two-stage index replays in DuckDB ([[ivfPqSeededOracleSql]]).
    */
  def ivfPqTopKSeeded(s: SparkSession, dir: String, k: Int = 10,
      cells: Int = 8, nprobe: Int = 4, m: Int = 8, ks: Int = 32,
      rr: Int = 100): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    val emb = nvCache(s, dir)
    val seeds = seedCentroids(s, dir, ks)
    val subLen = seeds.head.length / m
    val books = (0 until m).map { sub =>
      seeds.map(_.slice(sub * subLen, (sub + 1) * subLen))
    }
    ivfPqAdc(s, dir, emb, seedCentroids(s, dir, cells), books, k, nprobe, rr)
  }

  /** Derived IVF-PQ serving parameters plus the calibration evidence
    * they were accepted on.
    */
  case class ServingParams(nprobe: Int, rr: Int, coverageNprobe: Int,
      validatedRecall: Double)

  // key carries the FULL sizing (m, ks, nValidate) the disk-cache key
  // below carries — two same-session calls differing only in PQ sizing
  // must not reuse each other's (nprobe, rerank)
  private val servingParamsCache =
    new java.util.concurrent.ConcurrentHashMap[
      (String, Int, Int, Int, Int, Double, Int), ServingParams]()

  /** Derive (nprobe, rerank) for a trained IVF-PQ index from a RECALL
    * CONTRACT — the IVF analogue of [[srpParams]]. SRP's collision law
    * is analytic, so srpParams inverts a formula; an IVF index's
    * probe-coverage law (P[a true top-k neighbor's cell is within the
    * q nearest cells of its query]) depends on the trained centroids
    * and the data geometry, so this inverts the law MEASURED on the
    * index itself:
    *
    *  1. exact ground-truth top-k for a held-out validation sample
    *     (disjoint from the fixed serving probe set; nq x n dots —
    *     one cheap corpus pass, paid once per index like training);
    *  2. for every true neighbor, the PROBE RANK of its assigned cell
    *     in its query's centroid ranking — one pass yields the entire
    *     coverage curve; nprobe0 = the curve's recallTarget+margin
    *     quantile (the margin absorbs the ADC shortlist tail);
    *  3. a bounded VERIFY loop: measured end-to-end recall@k of the
    *     full serving pipeline on the validation sample; while below
    *     target + 0.03 margin, double the rerank (shortlist tail)
    *     then widen nprobe — at most 8 steps.
    *
    * This is what fixes the r11-measured decay (recall@10 0.94 / 0.82
    * / 0.68 at 2k / 20k / 200k rows under the fixed RELATIVE nprobe =
    * cells/4): as cells = sqrt(n) grows, centroid ranking gets noisier
    * and neighbors spread past any fixed fraction of probed cells, so
    * the probe count must be derived from the measured curve, not a
    * ratio. Results are memoized per (corpus, cells, k, target) both
    * in-process AND on disk (the fitCellsCached device) — train once,
    * derive once, serve many, across driver restarts.
    */
  def ivfServingParams(s: SparkSession, dir: String, cells: Int,
      m: Int, ks: Int, k: Int = 10, recallTarget: Double = 0.9,
      nValidate: Int = 128): ServingParams =
    servingParamsCache.computeIfAbsent(
      (dir, cells, m, ks, k, recallTarget, nValidate), _ => {
      // DISK-memoized like the trained index itself (fitCellsCached):
      // calibration is "derive once, serve many" ACROSS driver
      // processes too — a fresh JVM serving the same corpus must not
      // re-pay the 200k rung's ~4-minute calibration. Keyed by corpus
      // fingerprint + index sizing + contract; the 4-double payload is
      // (nprobe, rr, coverageNprobe0, validatedRecall).
      val pct = (recallTarget * 100).toInt
      val (_, arr) = diskCachedDoubles(
        s"${corpusFingerprint(dir)}-$TrainVersion-serve$cells-m$m-ks$ks-k$k-r$pct-nv$nValidate",
        _ == Seq(4),
        {
          val sp = deriveServingParams(s, dir, cells, m, ks, k,
            recallTarget, nValidate)
          (Seq(4), Array(sp.nprobe.toDouble, sp.rr.toDouble,
            sp.coverageNprobe.toDouble, sp.validatedRecall))
        })
      ServingParams(arr(0).toInt, arr(1).toInt, arr(2).toInt, arr(3))
    })

  private def deriveServingParams(s: SparkSession, dir: String, cells: Int,
      m: Int, ks: Int, k: Int, recallTarget: Double,
      nValidate: Int): ServingParams = {
      graft.functions.GraftFunctions.register(s)
      val emb = nvCache(s, dir)
      val n = emb.count()
      val cents = fitCellsCached(dir, cells, emb)
      val books = fitPqCodebooks(s, dir, m, ks)
      val nCells = cents.length
      // held-out validation queries: an id window past the fixed
      // serving probe set (vec_id < 5), clamped into the corpus
      val nq = math.min(nValidate.toLong, math.max(1L, n / 4)).toInt
      val off = math.max(8L, math.min(n - nq, 1024L))
      val qs = emb.filter(col("vec_id") >= off && col("vec_id") < off + nq)
        .select(col("vec_id").as("query_id"), col("nv").as("qnv"))
      val wT = Window.partitionBy("query_id")
        .orderBy(col("cos").desc, col("vec_id").asc)
      val truth = broadcast(qs).crossJoin(emb)
        .filter(col("query_id") =!= col("vec_id"))
        .withColumn("cos", dot(col("qnv"), col("nv")))
        .withColumn("rank", row_number().over(wT))
        .filter(col("rank") <= k)
        .select(col("query_id"), col("vec_id"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val truthN = truth.count()
      // the measured coverage curve: each neighbor's cell rank in its
      // query's centroid ordering (nq*k bounded rows to the driver)
      val ranks = truth
        .join(emb, Seq("vec_id"))
        .join(broadcast(qs), Seq("query_id"))
        .withColumn("ncell", element_at(nearestCellsExpr(col("nv"), cents, 1), 1))
        .withColumn("crank", array_position(
          nearestCellsExpr(col("qnv"), cents, nCells), col("ncell")))
        .select("crank").collect().map(_.getLong(0)).sorted
      val coverTarget = math.min(0.98, recallTarget + 0.05)
      // tiny corpus (n <= off): the validation window is empty, so
      // there is no curve to invert — probe every cell (trivially
      // meets any recall target at that size) instead of indexing
      // into an empty ranks array
      val nprobe0 =
        if (ranks.isEmpty) nCells
        else {
          val idx = math.min(ranks.length - 1,
            math.max(0, math.ceil(coverTarget * ranks.length).toInt - 1))
          math.max(4, math.min(nCells, ranks(idx).toInt))
        }
      val truthPairs = truth.withColumnRenamed("vec_id", "neighbor_id")
      def measured(np: Int, rr: Int): Double = {
        val got = ivfPqAdc(s, dir, emb, cents, books, k, np, rr,
          Some(qs.select(col("query_id"), col("qnv").as("qv"))))
        val hits = got.select("query_id", "neighbor_id")
          .join(truthPairs, Seq("query_id", "neighbor_id"), "left_semi")
          .count()
        if (truthN == 0) 1.0 else hits.toDouble / truthN
      }
      var np = nprobe0
      var rr = math.max(100, 20 * k)
      // the loop verifies against target + margin: the validation
      // recall is an ESTIMATE from nValidate queries, and a loop that
      // exits at exactly the target ships a ~50% chance of measuring
      // below it on disjoint serving queries (r12's first cut: sf1
      // validated 0.925, measured 0.866 on a disjoint 50-query probe).
      // The margin absorbs the sampling noise; 8 steps bounds np at
      // ~25x coverage-nprobe0 and rr at 8192 — the honest cost of a
      // recall contract is probe latency, not a silently-missed target
      val verifyTarget = math.min(0.98, recallTarget + 0.03)
      var rec = measured(np, rr)
      var step = 0
      while (rec < verifyTarget && step < 8 && (np < nCells || rr < 8192)) {
        if (step % 2 == 0) rr = math.min(8192, rr * 2)
        else np = math.min(nCells, math.max(np + 1, (np * 3) / 2))
        rec = measured(np, rr)
        step += 1
      }
      truth.unpersist(blocking = false)
      ServingParams(np, rr, nprobe0, rec)
  }

  /** The dim-256 BENCH shape of [[ivfPqTopK]]: serves the GenData
    * dim-256 twin corpus ([[dim256BenchDir]]) with an index sized for
    * it — cells ~ sqrt(n) (the classic IVF sizing; the dim-64 default
    * of 8 is a fixture of the 500-vector oracle corpus), PQ at
    * CONSTANT subspace length 8: m = dim/8, ks=64. Holding subLen —
    * not m — fixed as dim grows is the part that matters: at m=8 a
    * dim-256 subspace is 32-dim, where 32 codewords carry ~no signal
    * and the ADC shortlist measured 0.50 recall; at subLen=8 the
    * per-subspace geometry (and recall) matches the dim-64 index
    * while codes stay a 32x compression (m bytes/vector).
    *
    * nprobe/rerank come from [[ivfServingParams]]'s recall@10 >= 0.9
    * contract, NOT a fixed cells/4 ratio — the ratio sizing decayed
    * to 0.68 recall at the 200k rung (EMB_SCALE_r11) because the
    * coverage law shifts with corpus size. AnnSpec pins the contract
    * at two corpus sizes (ANN_RECALL_D256.json).
    */
  def ivfPqTopKD256(s: SparkSession, dir: String): DataFrame = {
    val d256 = dim256BenchDir(s, dir)
    val n = Tables.embeddings(s, d256).count()
    val dim = corpusDim(s, d256)
    require(dim % 8 == 0, s"ivfPqTopKD256 sizes m = dim/8 but dim=$dim")
    val cells = math.max(16, math.sqrt(n.toDouble).toInt)
    val sp = ivfServingParams(s, d256, cells, m = dim / 8, ks = 64,
      k = 10, recallTarget = 0.9)
    ivfPqTopK(s, d256, cells = cells, nprobe = sp.nprobe,
      m = dim / 8, ks = 64, rr = sp.rr)
  }

  /** DuckDB replay of [[ivfPqTopKSeeded]] (cells=8, nprobe=4, m=8,
    * ks=32, subLen=8, rerank=100, k=10, dim pinned 64): the coarse
    * CTEs are [[ivfSeededOracleSql]]'s (stride n/8 seeds, nearest-cell
    * assignment, nprobe=4 probe list), the code CTEs are
    * [[pqSeededOracleSql]]'s (stride n/32 seed slices, per-subspace
    * argmin encode, 1e-12-unit LUT), and the ADC join additionally
    * restricts candidates to vectors whose cell is in the query's
    * probe list — the same restriction the Spark broadcast semi-join
    * applies. Every distance/dot is the shared 0.0-seeded fold, the
    * shortlist is an exact BIGINT sum, so assignment, probe order,
    * shortlist and final rank are all bit-identical.
    */
  private def ivfPqSeededOracleSql: String = s"""
      $nvPrelude,
      cst AS (SELECT count(*) // 8 AS stride FROM nvt),
      csd AS MATERIALIZED (
        SELECT CAST(vec_id // (SELECT stride FROM cst) AS INTEGER) AS cell,
               nv AS snv
        FROM nvt
        WHERE vec_id % (SELECT stride FROM cst) = 0
          AND vec_id < 8 * (SELECT stride FROM cst)),
      asg AS MATERIALIZED (
        SELECT vec_id, cell FROM (
          SELECT x.vec_id, s.cell,
                 row_number() OVER (PARTITION BY x.vec_id ORDER BY
                   list_reduce(list_prepend(0.0,
                     [(s.snv[i+1] - x.nv[i+1]) * (s.snv[i+1] - x.nv[i+1])
                      for i in range(64)]), (acc, t) -> acc + t) ASC,
                   s.cell ASC) AS rn
          FROM nvt x CROSS JOIN csd s)
        WHERE rn = 1),
      qp AS (
        SELECT query_id, cell FROM (
          SELECT q.vec_id AS query_id, s.cell,
                 row_number() OVER (PARTITION BY q.vec_id ORDER BY
                   list_reduce(list_prepend(0.0,
                     [(s.snv[i+1] - q.nv[i+1]) * (s.snv[i+1] - q.nv[i+1])
                      for i in range(64)]), (acc, t) -> acc + t) ASC,
                   s.cell ASC) AS rn
          FROM nvt q CROSS JOIN csd s WHERE q.vec_id < 5)
        WHERE rn <= 4),
      pst AS (SELECT count(*) // 32 AS stride FROM nvt),
      psd AS MATERIALIZED (
        SELECT CAST(vec_id // (SELECT stride FROM pst) AS INTEGER) AS code,
               nv AS snv
        FROM nvt
        WHERE vec_id % (SELECT stride FROM pst) = 0
          AND vec_id < 32 * (SELECT stride FROM pst)),
      enc AS MATERIALIZED (
        SELECT vec_id, sub, code FROM (
          SELECT x.vec_id, t.sub, s.code,
                 row_number() OVER (PARTITION BY x.vec_id, t.sub ORDER BY
                   list_reduce(list_prepend(0.0,
                     [(s.snv[t.sub*8 + i + 1] - x.nv[t.sub*8 + i + 1])
                      * (s.snv[t.sub*8 + i + 1] - x.nv[t.sub*8 + i + 1])
                      for i in range(8)]), (acc, u) -> acc + u) ASC,
                   s.code ASC) AS rn
          FROM nvt x CROSS JOIN range(8) t(sub) CROSS JOIN psd s)
        WHERE rn = 1),
      lut AS MATERIALIZED (
        SELECT q.vec_id AS query_id, t.sub, s.code,
               CAST(floor(list_reduce(list_prepend(0.0,
                 [q.nv[t.sub*8 + i + 1] * s.snv[t.sub*8 + i + 1]
                  for i in range(8)]), (acc, u) -> acc + u)
                 * 1000000000000.0) AS BIGINT) AS contrib_q
        FROM nvt q CROSS JOIN range(8) t(sub) CROSS JOIN psd s
        WHERE q.vec_id < 5),
      adc AS (
        SELECT l.query_id, e.vec_id, CAST(sum(l.contrib_q) AS BIGINT) AS approx
        FROM enc e
        JOIN asg a ON a.vec_id = e.vec_id
        JOIN qp p ON p.cell = a.cell
        JOIN lut l ON l.query_id = p.query_id
                  AND l.sub = e.sub AND l.code = e.code
        WHERE l.query_id <> e.vec_id
        GROUP BY l.query_id, e.vec_id),
      short AS (
        SELECT query_id, vec_id FROM (
          SELECT query_id, vec_id,
                 row_number() OVER (PARTITION BY query_id
                   ORDER BY approx DESC, vec_id ASC) AS arank
          FROM adc)
        WHERE arank <= 100),
      rer AS (
        SELECT sh.query_id, sh.vec_id,
               list_reduce(list_prepend(0.0,
                 [q.nv[i+1] * x.nv[i+1] for i in range(64)]),
                 (acc, u) -> acc + u) AS cos
        FROM short sh
        JOIN nvt x ON x.vec_id = sh.vec_id
        JOIN nvt q ON q.vec_id = sh.query_id),
      ranked AS (
        SELECT query_id, vec_id AS neighbor_id,
               CAST(row_number() OVER (PARTITION BY query_id
                 ORDER BY cos DESC, vec_id ASC) AS INTEGER) AS rank
        FROM rer)
      SELECT query_id, rank, neighbor_id FROM ranked
      WHERE rank <= 10 ORDER BY query_id, rank"""

  // ---- Self-kNN join + semantic dedup (the kNN-graph family) --------

  /** IVF-bucketed k-NN JOIN: every corpus vector gets its k nearest
    * neighbors (cosine) in one pass. Unlike the ann_*_topk serving
    * rows, the query side IS the corpus, so nothing broadcasts: the
    * corpus takes its primary cell, queries replicate to their nprobe
    * nearest cells, and candidate generation is a cell-keyed
    * SHUFFLE-HASH join — the bucketed-join shape that survives any
    * corpus size (cells ~ sqrt(n) bounds per-cell work; total
    * candidate volume is n * nprobe * n/cells ~ n^1.5 vs brute
    * force's n^2).
    *
    * Three lessons from this repo's own sf10/sf100 failures are baked
    * in: the cosine is computed INSIDE the join projection, so no
    * shuffle after the join carries a raw vector (the SRP/minhash
    * candidate-x-payload lesson); the join is hinted shuffle_hash so
    * the candidate stream is never sort-merged; and the per-query
    * top-k is SELECTION, not sorting — a bounded-heap aggregate
    * ([[graft.functions.TopK]], O(k) state per query) whose partials
    * consume the candidate stream inside the join stage, so the
    * n^1.5 candidates are never sorted OR shuffled (the r13 sf100
    * finding: the previous window formulation added no exchange, but
    * its per-partition SORT of ~1.1e10 candidate rows spilled ~300 GB
    * at 2M dim-256 vectors and died on single-host disk — selection
    * makes the candidate path stateless-on-disk at any scale). The
    * only query-keyed shuffle carries one <= k-entry heap per
    * (query, probed cell). Exact w.r.t. the index: identical output
    * to the window formulation (the registry's DuckDB oracle replays
    * the same math cell-exactly; AnnSpec pins TopK == row_number
    * window on a synthetic tied stream), since both take the global
    * top-k within probed cells.
    */
  def knnJoin(emb: DataFrame, cents: Seq[Seq[Double]], k: Int,
      nprobe: Int): DataFrame = {
    // ObjectHashAggregate's sort-based fallback (default threshold:
    // 128 groups) would re-introduce the candidate sort this operator
    // exists to avoid; per-partition group state is ~queries/partition
    // heaps of k ids — megabytes at any corpus size
    emb.sparkSession.conf.set(
      "spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
      (1 << 21).toString)
    val corpus = emb
      .withColumn("cell", element_at(nearestCellsExpr(col("nv"), cents, 1), 1))
      .select(col("cell"), col("vec_id"), col("nv"))
    val queries = emb
      .select(col("vec_id").as("query_id"), col("nv").as("qnv"))
      .withColumn("cell", explode(nearestCellsExpr(col("qnv"), cents, nprobe)))
    val cand = queries.hint("shuffle_hash")
      .join(corpus.hint("shuffle_hash"), Seq("cell"))
      .filter(col("query_id") =!= col("vec_id"))
      .select(col("query_id"), col("vec_id"),
        dot(col("qnv"), col("nv")).as("cos"))
    cand.groupBy("query_id")
      .agg(graft.functions.TopK(k, col("cos"), col("vec_id")).as("nbrs"))
      .select(col("query_id"),
        posexplode(col("nbrs")).as(Seq("pos", "neighbor_id")))
      .select(col("query_id"), (col("pos") + 1).cast("integer").as("rank"),
        col("neighbor_id"))
      .orderBy("query_id", "rank")
  }

  /** [[knnJoin]] with the stride-seeded oracle-mode quantizer
    * (cells=8, nprobe=4, k=3; dim pinned 64 by the registry guard) —
    * cell-exactly replayed by [[knnJoinSeededOracleSql]]. nprobe=4
    * matches ann_ivf_topk's seeded mode: 8 random-corpus-point cells
    * scatter dim-64 neighborhoods enough that 2 probes measured 0.46
    * recall@3; 4 probes measure ~0.7 (AnnSpec pins the floor).
    */
  def knnJoinSeeded(s: SparkSession, dir: String, k: Int = 3,
      cells: Int = 8, nprobe: Int = 4): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    knnJoin(nvCache(s, dir), seedCentroids(s, dir, cells), k, nprobe)
  }

  /** [[knnJoin]] in production trim — the BENCHED shape: the dim-256
    * GenData twin under a KMeans-trained index sized cells ~ sqrt(n)
    * (train once, graph the whole corpus), nprobe=4, k=10.
    */
  def knnJoinD256(s: SparkSession, dir: String): DataFrame = {
    val d256 = dim256BenchDir(s, dir)
    val n = Tables.embeddings(s, d256).count()
    val cells = math.max(16, math.sqrt(n.toDouble).toInt)
    graft.functions.GraftFunctions.register(s)
    val emb = nvCache(s, d256)
    knnJoin(emb, fitCellsCached(d256, cells, emb), k = 10, nprobe = 4)
  }

  /** DuckDB replay of [[knnJoinSeeded]] (cells=8, nprobe=4, k=3, dim
    * pinned 64). The coarse CTEs are [[ivfSeededOracleSql]]'s; the
    * differences are that EVERY vector is a query (no vec_id < 5
    * filter) and the Spark side's two-stage top-k collapses to one
    * rank here (they agree by the containment argument in
    * [[knnJoin]]'s scaladoc).
    */
  private def knnJoinSeededOracleSql: String = s"""
      $nvPrelude,
      st AS (SELECT count(*) // 8 AS stride FROM nvt),
      sd AS MATERIALIZED (
        SELECT CAST(vec_id // (SELECT stride FROM st) AS INTEGER) AS cell,
               nv AS snv
        FROM nvt
        WHERE vec_id % (SELECT stride FROM st) = 0
          AND vec_id < 8 * (SELECT stride FROM st)),
      asg AS MATERIALIZED (
        SELECT vec_id, nv, cell FROM (
          SELECT x.vec_id, x.nv, s.cell,
                 row_number() OVER (PARTITION BY x.vec_id ORDER BY
                   list_reduce(list_prepend(0.0,
                     [(s.snv[i+1] - x.nv[i+1]) * (s.snv[i+1] - x.nv[i+1])
                      for i in range(64)]), (acc, t) -> acc + t) ASC,
                   s.cell ASC) AS rn
          FROM nvt x CROSS JOIN sd s)
        WHERE rn = 1),
      qp AS (
        SELECT query_id, qnv, cell FROM (
          SELECT q.vec_id AS query_id, q.nv AS qnv, s.cell,
                 row_number() OVER (PARTITION BY q.vec_id ORDER BY
                   list_reduce(list_prepend(0.0,
                     [(s.snv[i+1] - q.nv[i+1]) * (s.snv[i+1] - q.nv[i+1])
                      for i in range(64)]), (acc, t) -> acc + t) ASC,
                   s.cell ASC) AS rn
          FROM nvt q CROSS JOIN sd s)
        WHERE rn <= 4),
      cand AS (
        SELECT p.query_id, a.vec_id,
               list_reduce(list_prepend(0.0,
                 [p.qnv[i+1] * a.nv[i+1] for i in range(64)]),
                 (acc, t) -> acc + t) AS cos
        FROM qp p JOIN asg a USING (cell)
        WHERE p.query_id <> a.vec_id),
      ranked AS (
        SELECT query_id, vec_id AS neighbor_id,
               CAST(row_number() OVER (PARTITION BY query_id
                 ORDER BY cos DESC, vec_id ASC) AS INTEGER) AS rank
        FROM cand)
      SELECT query_id, rank, neighbor_id FROM ranked
      WHERE rank <= 3 ORDER BY query_id, rank"""

  /** SemDeDup-style semantic dedup (Abbas et al. 2023,
    * arXiv:2303.09540): cluster the normalized embeddings, call a
    * document a semantic duplicate if a LOWER-vec_id member of its
    * cell sits within cosine >= threshold, keep the lowest id of each
    * duplicate group. The deterministic keeper choice (min id, the
    * dedup_rep_select convention) makes the whole verdict replayable.
    * Output: one row per vector — (vec_id, cell, dup_of = smallest
    * qualifying lower id or NULL, is_dup).
    *
    * Scale shape: the pairwise check is CONFINED to cells (the
    * SemDeDup observation that near-duplicates co-cluster), so the
    * cell-keyed shuffle-hash self-join costs sum_c(n_c^2) ~ n^2/cells
    * ~ n^1.5 at cells ~ sqrt(n) — never a global product; the verdict
    * join-back is keyed on vec_id. Like [[knnJoin]], the cosine is
    * evaluated inside the join projection, so nothing after the join
    * shuffles a raw vector. Recall is by construction that of the
    * clustering (pairs split across cells are missed — the documented
    * SemDeDup trade; the shipped-corpus coverage is pinned in
    * DedupSpec against the exact dedup_embedding pair set).
    */
  def semanticDedup(emb: DataFrame, cents: Seq[Seq[Double]],
      threshold: Double): DataFrame = {
    val assigned = emb
      .withColumn("cell", element_at(nearestCellsExpr(col("nv"), cents, 1), 1))
      .select(col("cell"), col("vec_id"), col("nv"))
    val b = assigned.select(col("cell"), col("vec_id").as("id_b"),
      col("nv").as("nvb"))
    val dupOf = assigned.hint("shuffle_hash")
      .join(b.hint("shuffle_hash"), Seq("cell"))
      .filter(col("id_b") < col("vec_id") &&
        dot(col("nv"), col("nvb")) >= threshold)
      .groupBy("vec_id").agg(min(col("id_b")).as("dup_of"))
    assigned.select(col("vec_id"), col("cell"))
      .join(dupOf, Seq("vec_id"), "left")
      .select(col("vec_id"), col("cell"), col("dup_of"),
        col("dup_of").isNotNull.as("is_dup"))
      .orderBy("vec_id")
  }

  /** [[semanticDedup]] with the stride-seeded oracle-mode quantizer
    * (cells=8, threshold 0.45 — the corpus's planted near-dup cosine,
    * dedup_embedding's gate; dim pinned 64 by the registry guard).
    */
  def semanticDedupSeeded(s: SparkSession, dir: String,
      threshold: Double = 0.45, cells: Int = 8): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    semanticDedup(nvCache(s, dir), seedCentroids(s, dir, cells), threshold)
  }

  /** [[semanticDedup]] in production trim — the BENCHED shape: the
    * dim-256 twin, KMeans-trained cells ~ sqrt(n), threshold 0.8
    * (planted clones sit at cos >= ~0.87; random dim-256 cosines
    * concentrate within ~6/sqrt(dim) of 0, so 0.8 separates cleanly).
    */
  def semanticDedupD256(s: SparkSession, dir: String): DataFrame = {
    val d256 = dim256BenchDir(s, dir)
    val n = Tables.embeddings(s, d256).count()
    val cells = math.max(16, math.sqrt(n.toDouble).toInt)
    graft.functions.GraftFunctions.register(s)
    val emb = nvCache(s, d256)
    semanticDedup(emb, fitCellsCached(d256, cells, emb), threshold = 0.8)
  }

  /** DuckDB replay of [[semanticDedupSeeded]] (cells=8, threshold
    * 0.45, dim pinned 64): seeds/assignment are
    * [[ivfSeededOracleSql]]'s CTEs, the pair predicate is the shared
    * normalized-dot fold (bit-identical in both engines, and the
    * corpus's minimum threshold margin makes membership insensitive
    * to the last ulp anyway), the verdict a LEFT JOIN to min(lower
    * id) — so the flag set is exact.
    */
  private[operators] def semanticDedupOracleSql: String = s"""
      $nvPrelude,
      st AS (SELECT count(*) // 8 AS stride FROM nvt),
      sd AS MATERIALIZED (
        SELECT CAST(vec_id // (SELECT stride FROM st) AS INTEGER) AS cell,
               nv AS snv
        FROM nvt
        WHERE vec_id % (SELECT stride FROM st) = 0
          AND vec_id < 8 * (SELECT stride FROM st)),
      asg AS MATERIALIZED (
        SELECT vec_id, nv, cell FROM (
          SELECT x.vec_id, x.nv, s.cell,
                 row_number() OVER (PARTITION BY x.vec_id ORDER BY
                   list_reduce(list_prepend(0.0,
                     [(s.snv[i+1] - x.nv[i+1]) * (s.snv[i+1] - x.nv[i+1])
                      for i in range(64)]), (acc, t) -> acc + t) ASC,
                   s.cell ASC) AS rn
          FROM nvt x CROSS JOIN sd s)
        WHERE rn = 1),
      dup AS (
        SELECT a.vec_id, min(b.vec_id) AS dup_of
        FROM asg a JOIN asg b ON a.cell = b.cell AND b.vec_id < a.vec_id
        WHERE list_reduce(list_prepend(0.0,
                [a.nv[i+1] * b.nv[i+1] for i in range(64)]),
                (acc, t) -> acc + t) >= 0.45
        GROUP BY a.vec_id)
      SELECT g.vec_id, g.cell, d.dup_of, d.dup_of IS NOT NULL AS is_dup
      FROM asg g LEFT JOIN dup d USING (vec_id)
      ORDER BY vec_id"""
}
