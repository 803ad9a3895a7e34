package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Group E of SURVEY.md §2 — the deduplication family for a
  * training-data pipeline.
  *
  * Scale shape of every operator here: nothing materializes O(n²).
  * - exact dedup: one hash aggregation on the normalized text.
  * - ngram-jaccard: inverted-index (shingle) join — pairs are only
  *   generated for docs that SHARE a shingle, then verified exactly.
  * - minhash-LSH: banded signatures key the shuffle; candidate pairs
  *   are bounded by bucket sizes, then verified exactly.
  * - simhash: block-PAIR banding (28 bands of 16-bit-entropy keys)
  *   guarantees recall for hamming<=6 and bounds bucket sizes with a
  *   per-bucket candidate cap against skew.
  * - embedding cosine: the oracled baseline is exact; the scale path
  *   is the IVF/LSH route in [[Ann]].
  *
  * At 100 TB the one extra safeguard needed is a stop-shingle filter
  * (drop shingles with document-frequency above a cap before the
  * self-join) — standard practice, noted inline where it applies.
  */
object Dedup {

  /** Canonical text normalization shared by the dedup operators. */
  def normText(c: Column): Column =
    regexp_replace(trim(lower(c)), " +", " ")

  /** Distinct word k-shingles of `text`, HASHED to 64-bit longs: each
    * token is xxhash64'd once, then k consecutive token hashes combine
    * into one shingle key. Long keys make the distinct, the explode,
    * and the self-join shuffle dramatically cheaper than string
    * shingles, and a 64-bit collision between distinct shingles is
    * negligible at any realistic corpus size (the jaccard values are
    * then identical to string-shingle jaccard). 1-based closed
    * arithmetic mirrors the DuckDB oracle's shingle count; docs with
    * fewer than k tokens produce no shingles.
    */
  def shingleExpr(k: Int): String = {
    val parts = (0 until k).map(j => s"element_at(th, i + $j)").mkString(", ")
    // The short-doc branch must be explicit: sequence(1, 0) is the
    // DESCENDING sequence [1, 0], so an unguarded transform would
    // evaluate element_at(th, 0) (always an error) for any doc with
    // fewer than k tokens.
    s"""IF(size(th) >= $k,
        array_distinct(transform(sequence(1, size(th) - ${k - 1}),
          i -> xxhash64($parts))),
        CAST(array() AS array<bigint>))"""
  }

  /** docs -> (doc_id, shingles: array<long>, n_sh), shingle-bearing
    * docs only. The repartition spreads the CPU-bound hashing across
    * cores: a small-but-expression-heavy table often arrives as one
    * input split (one task), and this stage is compute-bound, not
    * IO-bound. At 100 TB the scan itself yields enough partitions and
    * AQE coalesces this to a no-op-ish exchange.
    */
  def docShingles(s: SparkSession, dir: String, k: Int = 3): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    Tables.documents(s, dir)
      .repartition(s.sparkContext.defaultParallelism)
      // native codegen shingler (functions/Shingles.scala): the HOF
      // formulation (shingleExpr, kept as the reference semantics)
      // runs its lambdas interpreted — ~20x slower on this
      // compute-bound stage
      .withColumn("norm", normText(col("text")))
      .selectExpr("doc_id", s"graft_shingles(norm, $k) AS shingles")
      .withColumn("n_sh", size(col("shingles")))
      .filter(col("n_sh") > 0)
  }

  /** Exact-jaccard verified pairs from an inverted-index self-join:
    * explode shingles, join on the shingle, count shared shingles per
    * pair, compute J = inter / (|A| + |B| - inter).
    *
    * `dfCap` is the stop-shingle guard: a shingle appearing in more
    * than `dfCap` docs contributes df² candidate pairs to the join,
    * which is what blows an inverted-index join up at corpus scale —
    * so those shingles are dropped from the index before the
    * self-join. Pairs whose similarity rests only on such
    * ubiquitous-boilerplate shingles are exactly the ones a near-dup
    * pipeline wants to ignore. The default cap is far above any
    * doc-frequency in the test data, so test-SF results are exact.
    */
  def jaccardPairs(sh: DataFrame, threshold: Double, dfCap: Int = 1000,
      memoKey: Option[String] = None): DataFrame = {
    // persist the exploded index: both self-join legs read it, and
    // alias divergence defeats Spark's exchange reuse otherwise.
    // With a memoKey the persisted index is shared across calls on
    // the same corpus instead of leaking one copy per call.
    val raw = sh.select(col("doc_id"), col("n_sh"), explode(col("shingles")).as("sh"))
    val hot = raw.groupBy("sh").agg(count(lit(1)).as("df"))
      .filter(col("df") > dfCap)
      .select("sh")
    // the stop-shingle set is Zipf-small in practice but UNBOUNDED in
    // principle (<= occurrences/dfCap entries — linear in corpus size
    // adversarially), so its exclusion broadcast is size-gated like
    // pageRank's ranks: past the threshold the anti join shuffles on
    // the shingle key the index join shuffles on anyway. The count is
    // a one-time index-build job (the index is memoized per corpus).
    def built = {
      val s = sh.sparkSession
      val hotSide =
        if (SizeGate.fits(s, hot.count(), 64L)) broadcast(hot) else hot
      raw.join(hotSide, Seq("sh"), "left_anti")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    }
    val ex = memoKey.fold(built)(k => graft.DfCache.memo(built, s"shingle-idx:$k:$dfCap"))
    val a = ex.select(col("sh"), col("doc_id").as("id_a"), col("n_sh").as("na"))
    val b = ex.select(col("sh"), col("doc_id").as("id_b"), col("n_sh").as("nb"))
    a.join(b, Seq("sh"))
      .filter(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b", "na", "nb")
      .agg(count(lit(1)).as("inter"))
      .withColumn("jaccard",
        col("inter").cast("double") / (col("na") + col("nb") - col("inter")))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }

  /** Connected components over the near-dup pair graph by iterative
    * min-label propagation — the canonicalization step a dedup
    * pipeline ends with: pairs say "a duplicates b", clusters say
    * "keep exactly one of {a,b,c}". Each doc's cluster_id becomes the
    * smallest doc_id reachable from it; singletons keep their own id.
    *
    * Scale shape: each round is one join + one aggregation shuffled
    * on doc_id, and converges in O(cluster diameter) rounds — dup
    * groups are near-cliques (diameter 1-2) at corpus scale.
    * `localCheckpoint` truncates lineage per round so the plan does
    * not grow with iterations. For adversarial long-chain graphs the
    * same join shapes extend to large-star/small-star (O(log n)
    * rounds, public Kiveris et al. "Connected Components in
    * MapReduce"); plain propagation is the right default here.
    */
  def componentLabels(pairs: DataFrame, docs: DataFrame): DataFrame =
    componentLabelsCounted(pairs, docs)._1

  /** [[componentLabels]] plus the CONVERGENCE ROUND COUNT — the
    * quantity the O(diameter) claim rests on. DedupSpec measures it on
    * planted clique vs long-chain graphs and on the real corpus pair
    * graph (CC_ROUNDS_r13.json): dup groups are near-cliques (2-3
    * rounds incl. the confirming pass), so plain propagation is the
    * default; past `jumpAfter` un-converged rounds the loop ESCAPES to
    * pointer-jumping (each round also shortcuts label(v) :=
    * label(label(v)) — the doubling device of the large-star/small-star
    * family, Kiveris et al. "Connected Components in MapReduce and
    * Beyond"), so an adversarial chain-shaped pair graph converges in
    * O(diameter-threshold + log diameter) rounds instead of O(diameter)
    * full join+agg supersteps. The jump preserves the invariant that
    * label(v) is always a node REACHABLE from v with label(v) <= v
    * (neighbor-min: reachable by one hop; label-of-label: reachable by
    * transitivity), so both regimes converge to the same fixpoint —
    * cluster_id = min reachable doc_id — and results are byte-identical
    * to pure propagation (DedupSpec pins clique, chain, and the real
    * corpus).
    */
  private[graft] def componentLabelsCounted(pairs: DataFrame,
      docs: DataFrame, jumpAfter: Int = 4): (DataFrame, Int) = {
    val edges = pairs
      .select(col("id_a").as("src"), col("id_b").as("dst"))
      .union(pairs.select(col("id_b").as("src"), col("id_a").as("dst")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var labels = docs.select(col("doc_id"), col("doc_id").as("cluster_id"))
    var changed = 1L
    var rounds = 0
    // round i's checkpoint blocks are dead once round i+1's exist;
    // free them explicitly — a big heap may never GC, and the
    // ContextCleaner only acts on collected objects (the pagerank
    // r13 sf100 lesson, applied to every checkpoint loop)
    var prevCkpt: DataFrame = null
    while (changed > 0) {
      rounds += 1
      val neighborMin = edges.join(labels,
          edges("dst") === labels("doc_id"))
        .groupBy(col("src")).agg(min(col("cluster_id")).as("nmin"))
        .withColumnRenamed("src", "doc_id")
      val stepped = labels.join(neighborMin, Seq("doc_id"), "left")
        .select(col("doc_id"),
          least(col("cluster_id"), coalesce(col("nmin"), col("cluster_id")))
            .as("next_id"),
          col("cluster_id"))
      val next = (if (rounds <= jumpAfter) stepped
        else {
          // pointer jump: next_id := label(next_id). One extra shuffle
          // per round buys doubling — the chain regime's O(log n).
          val lbl = labels.select(col("doc_id").as("jid"),
            col("cluster_id").as("jmin"))
          stepped.join(lbl, stepped("next_id") === lbl("jid"), "left")
            .select(stepped("doc_id"),
              least(col("next_id"), coalesce(col("jmin"), col("next_id")))
                .as("next_id"),
              stepped("cluster_id"))
        }).localCheckpoint(true)
      changed = next.filter(col("next_id") =!= col("cluster_id")).count()
      if (prevCkpt != null)
        org.apache.spark.sql.GraftBenchShim.unpersistLocalCheckpoint(prevCkpt)
      prevCkpt = next
      labels = next.select(col("doc_id"), col("next_id").as("cluster_id"))
    }
    edges.unpersist(blocking = false)
    (labels, rounds)
  }

  /** Component labels memoized per corpus: the label DF is already
    * materialized (eager localCheckpoint), so dedup_clusters and
    * dedup_rep_select share ONE propagation run per session+corpus
    * instead of re-iterating the join loop each call.
    */
  def labelsCached(s: org.apache.spark.sql.SparkSession, dir: String)
      : org.apache.spark.sql.DataFrame =
    graft.DfCache.memo(componentLabels(
      jaccardPairs(docShingles(s, dir), 0.5, memoKey = Some(dir))
        .select("id_a", "id_b"),
      Tables.documents(s, dir).select("doc_id")), s"cc-labels:$dir:0.5")

  /** DuckDB oracle for [[componentLabels]] over the exact jaccard
    * pair set: transitive closure via a recursive CTE, cluster_id =
    * min reachable doc_id.
    */
  private def clustersCte(k: Int, threshold: Double): String = s"""
    WITH RECURSIVE t AS (SELECT doc_id,
           string_split(regexp_replace(trim(lower(text)), ' +', ' ', 'g'), ' ') toks
         FROM documents),
    sh AS (SELECT doc_id,
             list_distinct([array_to_string(toks[i:i+${k - 1}], ' ')
                            for i in range(1, len(toks) - ${k - 2})]) shingles
           FROM t WHERE len(toks) >= $k),
    p AS (SELECT a.doc_id id_a, b.doc_id id_b,
            CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE) /
              (len(a.shingles) + len(b.shingles)
               - len(list_intersect(a.shingles, b.shingles))) j
          FROM sh a JOIN sh b ON a.doc_id < b.doc_id),
    pair AS (SELECT id_a, id_b FROM p WHERE j >= $threshold),
    edges AS (SELECT id_a AS s, id_b AS d FROM pair
              UNION SELECT id_b, id_a FROM pair),
    reach(s, d) AS (
      SELECT s, d FROM edges
      UNION
      SELECT r.s, e.d FROM reach r JOIN edges e ON r.d = e.s),
    mn AS (SELECT s AS doc_id, min(d) AS mn FROM reach GROUP BY s)"""

  def clustersOracle(k: Int, threshold: Double): String =
    clustersCte(k, threshold) + """
    SELECT doc.doc_id, least(doc.doc_id, coalesce(mn.mn, doc.doc_id)) AS cluster_id
    FROM documents doc LEFT JOIN mn ON doc.doc_id = mn.doc_id
    ORDER BY doc.doc_id"""

  /** Oracle for [[Dedup.all]]'s dedup_rep_select: same transitive
    * closure, then the per-cluster representative by (n_chars DESC,
    * doc_id ASC).
    */
  def repOracle(k: Int, threshold: Double): String =
    clustersCte(k, threshold) + """,
    lab AS (SELECT doc.doc_id,
              least(doc.doc_id, coalesce(mn.mn, doc.doc_id)) AS cluster_id
            FROM documents doc LEFT JOIN mn ON doc.doc_id = mn.doc_id),
    r AS (SELECT l.cluster_id, d.doc_id, d.n_chars,
            row_number() OVER (PARTITION BY l.cluster_id
              ORDER BY d.n_chars DESC, d.doc_id ASC) AS rn
          FROM lab l JOIN documents d USING (doc_id)),
    g AS (SELECT cluster_id, count(*) AS n_docs, max(n_chars) AS rep_chars
          FROM r GROUP BY cluster_id)
    SELECT g.cluster_id, g.n_docs, r.doc_id AS rep_doc, g.rep_chars
    FROM g JOIN r ON g.cluster_id = r.cluster_id AND r.rn = 1
    ORDER BY g.cluster_id"""

  /** 64-permutation minhash signature over the (hashed) shingle
    * array — the native codegen MinHashSig expression, one tight
    * primitive loop per row, no shuffle.
    */
  val minhashSigExpr: String = "graft_minhash(shingles)"

  /** LSH banding of a 64-long signature into `bands` band hashes. */
  def bandExpr(bands: Int): String = {
    val r = 64 / bands
    val parts = (1 to r).map(j => s"element_at(sig, b * $r + $j)").mkString(", ")
    s"""transform(sequence(0, ${bands - 1}), b -> xxhash64(b, $parts))"""
  }

  /** SimHash near-dup pairs from (doc_id, sig), banded by PAIRS of
    * 8-bit blocks: the 64-bit signature splits into 8 byte-blocks,
    * and each of the C(8,2) = 28 block pairs hashes to one 16-bit-
    * entropy band key. By pigeonhole, any signature pair with
    * hamming <= 6 leaves at least two of the 8 blocks untouched, so
    * recall at hamming <= 6 is EXACT; at hamming == 7 a pair escapes
    * only if all 7 flipped bits land in 7 distinct blocks
    * (8!/8^7 ~ 2% of random flip patterns). Single 8-bit blocks as
    * keys (the naive layout) give only 256 bucket values — every
    * bucket holds ~n/256 docs at corpus scale and the self-join
    * degenerates to ~8·(n/256)² candidates, quadratic; 16-bit pair
    * keys give 65,536 values per band, the same key space as 4x16
    * banding but with exact recall to hamming 6 instead of 3.
    *
    * `bucketCap` is the skew guard, same idea as the stop-shingle df
    * cap: a band bucket of b docs contributes b² candidate pairs, so
    * buckets above the cap are dropped before the self-join. NOTE the
    * cap weakens the recall guarantee: a pair whose every clean band
    * is hot loses all its candidate paths (DedupSpec demonstrates
    * this deliberately with a 50-doc crowd). That trade is the point
    * — such crowds are boilerplate a near-dup pipeline wants capped —
    * but the hamming bound above is only exact while no shared band
    * overflows. The default cap is far above any bucket size in the
    * test data, so test-SF results are unaffected.
    *
    * The default `maxHamming = 6` matches the banding's exactness
    * bound, so the returned set is COMPLETE by construction; pass 7
    * to widen the net at a documented ~2% miss rate for 7-bit pairs.
    */
  def simhashPairs(sigs: DataFrame, maxHamming: Int = 6,
      bucketCap: Int = 1000, memoKey: Option[String] = None): DataFrame = {
    val bandKeys = (for {
      i <- 0 until 8; j <- (i + 1) until 8
    } yield s"xxhash64(${i * 8 + j}, shiftright(sig, ${i * 8}) & 255, shiftright(sig, ${j * 8}) & 255)")
      .mkString("array(", ", ", ")")
    val bands = sigs
      .select(col("doc_id"), col("sig"), posexplode(expr(bandKeys)))
      .select(col("doc_id"), col("sig"), col("pos").as("band"), col("col").as("bv"))
    val hot = bands.groupBy("band", "bv").agg(count(lit(1)).as("df"))
      .filter(col("df") > bucketCap)
      .select("band", "bv")
    // hot-bucket exclusion gated like jaccardPairs' stop-shingle set:
    // <= bands*n/bucketCap entries adversarially, so past the
    // broadcast threshold the anti join shuffles on the (band, bv)
    // key the self-join shuffles on anyway (one-time, index memoized)
    def built = {
      val s = sigs.sparkSession
      val hotSide =
        if (SizeGate.fits(s, hot.count(), 64L)) broadcast(hot) else hot
      bands.join(hotSide, Seq("band", "bv"), "left_anti")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    }
    val idx = memoKey.fold(built)(k =>
      graft.DfCache.memo(built, s"simhash-idx:$k:$bucketCap"))
    idx.as("x").join(idx.as("y"),
        col("x.band") === col("y.band") && col("x.bv") === col("y.bv") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("id_a"), col("y.doc_id").as("id_b"),
        bit_count(col("x.sig").bitwiseXOR(col("y.sig"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** Distinct 3-word shingle strings from a `toks` column (the
    * jaccard operators' proven tokenization) — shared by both simhash
    * feature-hash modes below.
    */
  private val simhashShingles: String = """
    array_distinct(IF(size(toks) >= 3,
      transform(sequence(1, size(toks) - 2),
        i -> concat_ws(' ', element_at(toks, i), element_at(toks, i + 1),
                       element_at(toks, i + 2))),
      CAST(array() AS array<string>)))"""

  /** Engine-portable simhash features for the chosen hash mode:
    *  - "md5" (the default everywhere an oracle gates the result):
    *    md5 of the same UTF-8 text yields the same hex in Spark and
    *    DuckDB, so the 64-bit feature hash (first 16 hex chars,
    *    assembled from two 32-bit `conv` halves because one 16-char
    *    conv would overflow signed bigint) is cross-engine identical
    *    — the whole signature -> hamming -> pair-set pipeline oracles
    *    cell-exactly. The oracle-ability mode.
    *  - "xxhash64": one codegen'd hash per shingle instead of an md5
    *    plus two base-16 convs — the cheaper hash for a 100 TB
    *    corpus, at the cost of DuckDB replayability. The scale mode.
    * The hash choice is a FUNCTION PARAMETER (see
    * [[simhashNearDupPairs]]), deliberately not a session conf: the
    * registry's dedup_simhash entry is bound to the md5 replay oracle,
    * so ambient session state must not be able to flip its features
    * out from under the oracle. The signature pipeline downstream of
    * the features is hash-agnostic; DedupSpec asserts BOTH modes
    * yield valid near-dup pair sets (subset of exact jaccard pairs,
    * high recall).
    */
  def simhashFeatureExpr(hash: String): String = hash match {
    case "md5" => s"""
      transform($simhashShingles,
        s -> shiftleft(CAST(conv(substring(md5(s), 1, 8), 16, 10) AS BIGINT), 32)
             | CAST(conv(substring(md5(s), 9, 8), 16, 10) AS BIGINT))"""
    case "xxhash64" => s"transform($simhashShingles, s -> xxhash64(s))"
    case other => throw new IllegalArgumentException(
      s"simhash feature hash must be 'md5' or 'xxhash64', got '$other'")
  }

  /** SimHash near-dup pairs over the documents table with the chosen
    * feature hash — the configurable entry point ([[simhashFeatureExpr]]
    * explains the modes). The registry's dedup_simhash is this with
    * hash = "md5" (pinned to its DuckDB replay oracle).
    */
  def simhashNearDupPairs(s: SparkSession, dir: String,
      hash: String = "md5"): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    // simhash over 3-word shingles (unigrams are too coarse: with a
    // small vocabulary most docs share most token SETS, so shingles
    // are what separates near-dups from merely same-domain docs)
    val sigs = Tables.documents(s, dir)
      .repartition(s.sparkContext.defaultParallelism)
      .withColumn("toks", split(normText(col("text")), " "))
      .selectExpr("doc_id", s"${simhashFeatureExpr(hash)} AS fh")
      .filter(size(col("fh")) > 0)
      .withColumn("sig", expr("graft_simhash(fh)"))
      .select("doc_id", "sig")
    simhashPairs(sigs, memoKey = Some(s"$dir:$hash")).orderBy("id_a", "id_b")
  }

  /** DuckDB oracle for [[all]]'s dedup_simhash: recompute the same
    * md5-derived signatures bit-by-bit (votes per hex-digit bit, so
    * no 64-bit unsigned value is ever materialized — bit b of the
    * feature long is bit (b%4) of hex char (15-b/4), a bijection, so
    * per-pair hamming is identical), then brute-force all pairs at
    * hamming <= 6. Validated char-exact against a JVM reference on
    * the test corpus.
    */
  val simhashOracle: String = """
    WITH t AS (SELECT doc_id,
           string_split(regexp_replace(trim(lower(text)), ' +', ' ', 'g'), ' ') toks
         FROM documents),
    shl AS (SELECT doc_id,
             list_distinct([array_to_string(toks[i:i+2], ' ')
                            for i in range(1, len(toks) - 1)]) shingles
           FROM t WHERE len(toks) >= 3),
    f AS (SELECT doc_id, md5(unnest(shingles)) AS hx FROM shl),
    b AS (SELECT doc_id, p.p AS p, q.q AS q,
            CASE WHEN (strpos('0123456789abcdef',
                              substr(hx, CAST(p.p AS INTEGER) + 1, 1)) - 1)
                      & (1 << CAST(q.q AS INTEGER)) <> 0
                 THEN 1 ELSE -1 END AS v
          FROM f, range(16) p(p), range(4) q(q)),
    d AS (SELECT doc_id, p,
            sum(CASE WHEN sv > 0 THEN (1 << CAST(q AS INTEGER)) ELSE 0 END) AS dg
          FROM (SELECT doc_id, p, q, sum(v) AS sv FROM b GROUP BY doc_id, p, q)
          GROUP BY doc_id, p),
    sg AS (SELECT doc_id, list(dg ORDER BY p) AS digits FROM d GROUP BY doc_id),
    h AS (SELECT a.doc_id AS id_a, b2.doc_id AS id_b,
            CAST(list_sum([bit_count(xor(CAST(a.digits[i+1] AS BIGINT),
                                         CAST(b2.digits[i+1] AS BIGINT)))
                           for i in range(16)]) AS INTEGER) AS hamming
          FROM sg a JOIN sg b2 ON a.doc_id < b2.doc_id)
    SELECT id_a, id_b, hamming FROM h WHERE hamming <= 6 ORDER BY id_a, id_b"""

  /** SQL oracle for threshold near-dup pairs — brute force in DuckDB
    * (test-SF-sized), mirroring normalization + shingling exactly.
    */
  def jaccardOracle(k: Int, threshold: Double, withJ: Boolean): String = {
    val j = if (withJ) ", j AS jaccard" else ""
    s"""
      WITH t AS (SELECT doc_id,
                   string_split(regexp_replace(trim(lower(text)), ' +', ' ', 'g'), ' ') toks
                 FROM documents),
      sh AS (SELECT doc_id,
               list_distinct([array_to_string(toks[i:i+${k - 1}], ' ')
                              for i in range(1, len(toks) - ${k - 2})]) shingles
             FROM t WHERE len(toks) >= $k),
      p AS (SELECT a.doc_id id_a, b.doc_id id_b,
              CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE) /
                (len(a.shingles) + len(b.shingles)
                 - len(list_intersect(a.shingles, b.shingles))) j
            FROM sh a JOIN sh b ON a.doc_id < b.doc_id)
      SELECT id_a, id_b$j FROM p WHERE j >= $threshold ORDER BY id_a, id_b"""
  }

  val all: Map[String, Q] = Map(
    // ------------------------------------------------------------------
    // Exact dedup: keep the lowest doc_id per normalized text. One
    // hash aggregation; the map-side partial keeps shuffle narrow.
    "dedup_exact" -> Q(
      (s, dir) => {
        Tables.documents(s, dir)
          .groupBy(normText(col("text")).as("norm"))
          .agg(min(col("doc_id")).as("doc_id"), count(lit(1)).as("n_copies"))
          .select("doc_id", "n_copies")
          .orderBy("doc_id")
      },
      Some("""
        SELECT min(doc_id) AS doc_id, count(*) AS n_copies
        FROM documents
        GROUP BY regexp_replace(trim(lower(text)), ' +', ' ', 'g')
        ORDER BY doc_id""")),

    // ------------------------------------------------------------------
    // Exact n-gram Jaccard pairs (J >= 0.5) via the inverted-index
    // join; DuckDB brute-forces the same pairs.
    "dedup_ngram_jaccard" -> Q(
      (s, dir) => jaccardPairs(docShingles(s, dir), 0.5, memoKey = Some(dir))
        .orderBy("id_a", "id_b"),
      Some(jaccardOracle(3, 0.5, withJ = true))),

    // ------------------------------------------------------------------
    // Near-dup CLUSTERS: connected components over the exact jaccard
    // pair graph, cluster_id = min doc_id of the component — the
    // keep-one-representative step after pair finding. Oracle walks
    // the same pair set transitively with a recursive CTE.
    "dedup_clusters" -> Q(
      (s, dir) => labelsCached(s, dir).orderBy("doc_id"),
      Some(clustersOracle(3, 0.5))),

    // ------------------------------------------------------------------
    // Representative selection — the step after clustering: keep ONE
    // doc per near-dup cluster, chosen by quality (longest text here,
    // ties to the smallest id), not arbitrarily. One max_by aggregate
    // over the cluster labels; the struct ordering key makes the
    // argmax deterministic, and nothing materializes per-cluster
    // beyond the single running best row.
    "dedup_rep_select" -> Q(
      (s, dir) => {
        labelsCached(s, dir)
          .join(Tables.documents(s, dir).select("doc_id", "n_chars"), "doc_id")
          .groupBy("cluster_id")
          .agg(count(lit(1)).as("n_docs"),
            max_by(col("doc_id"),
              struct(col("n_chars"), (-col("doc_id")).as("neg"))).as("rep_doc"),
            max(col("n_chars")).as("rep_chars"))
          .orderBy("cluster_id")
      },
      Some(repOracle(3, 0.5))),

    // ------------------------------------------------------------------
    // MinHash + LSH: signatures -> 16 bands of 4 -> bucket join ->
    // exact-jaccard verification of candidates only. The planted
    // near-dups (J ~ 0.99) collide in a band with probability
    // 1 - (1 - J^4)^16 ~ 1, so the verified output equals the exact
    // pair set and shares its oracle; the spec additionally checks
    // candidate recall against the brute-force pairs.
    "dedup_minhash_lsh" -> Q(
      (s, dir) => {
        graft.functions.GraftFunctions.register(s)
        // shingles are read three times (signatures + two verify legs);
        // memoized so repeated calls share one resident copy
        val sh = graft.DfCache.memo(
          docShingles(s, dir)
            .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK),
          s"doc-shingles:$dir")
        val sigs = sh.withColumn("sig", expr(minhashSigExpr))
        val bands = sigs
          .select(col("doc_id"), posexplode(expr(bandExpr(16))))
          .select(col("doc_id"), col("pos").as("band"), col("col").as("bh"))
        val cands = bands.as("x").join(bands.as("y"),
            col("x.band") === col("y.band") && col("x.bh") === col("y.bh") &&
              col("x.doc_id") < col("y.doc_id"))
          .select(col("x.doc_id").as("id_a"), col("y.doc_id").as("id_b"))
          .distinct()
        // shuffle-HASH hints on the verify fetch, never sort-merge:
        // the candidate set with both shingle ARRAYS attached must not
        // be sorted (the same mechanism that spilled the SRP verify at
        // the 200k rung, Ann.scala — r11's clean sf10 ladder measured
        // this join family at 18.5x/decade before the hint)
        val withSets = cands
          .join(sh.select(col("doc_id").as("id_a"), col("shingles").as("sha"),
            col("n_sh").as("na")).hint("shuffle_hash"), Seq("id_a"))
          .join(sh.select(col("doc_id").as("id_b"), col("shingles").as("shb"),
            col("n_sh").as("nb")).hint("shuffle_hash"), Seq("id_b"))
        withSets
          .withColumn("inter", size(array_intersect(col("sha"), col("shb"))))
          .withColumn("jaccard",
            col("inter").cast("double") / (col("na") + col("nb") - col("inter")))
          .filter(col("jaccard") >= 0.5)
          .select("id_a", "id_b", "jaccard")
          .orderBy("id_a", "id_b")
      },
      Some(jaccardOracle(3, 0.5, withJ = true))),

    // ------------------------------------------------------------------
    // SimHash: 64-bit signature from shingle hashes (per-row codegen
    // expression), block-pair banding (pigeonhole-guaranteed recall
    // for hamming <= 6), verified with bit_count(xor). Features are
    // md5-derived (simhashFeatureExpr) so the DuckDB oracle recomputes
    // the identical signatures and pins the exact pair set WITH
    // hamming values — a full cell-exact gate, not rows-only.
    "dedup_simhash" -> Q(
      // hash pinned to "md5": this entry is gated by the md5 replay
      // oracle, so the feature hash must not be swappable under it
      // (scale mode is the hash="xxhash64" parameter of
      // simhashNearDupPairs, specced in DedupSpec). The BENCH runs
      // the xxhash64 scale mode (Q.benchFn, the dq_profile_approx
      // device): md5-per-shingle is oracle-ability machinery, not
      // the production cost of the operator.
      (s, dir) => simhashNearDupPairs(s, dir, hash = "md5"),
      Some(simhashOracle),
      benchFn = Some((s, dir) => simhashNearDupPairs(s, dir, hash = "xxhash64"))),

    // ------------------------------------------------------------------
    // Embedding cosine near-dup pairs (cos >= 0.45). This is the
    // exact correctness baseline (pair ids only — similarity VALUES
    // are engine-fp-sensitive, membership is not: min threshold
    // margin in the test data is 5e-4). bench=false: the scale path
    // is Ann's IVF route, not an all-pairs product.
    "dedup_embedding" -> Q(
      (s, dir) => {
        graft.functions.GraftFunctions.register(s)
        val e = Tables.embeddings(s, dir)
          .select(col("vec_id"), col("embedding"))
        val a = e.select(col("vec_id").as("id_a"), col("embedding").as("va"))
        val b = e.select(col("vec_id").as("id_b"), col("embedding").as("vb"))
        a.crossJoin(b).filter(col("id_a") < col("id_b"))
          .withColumn("cos", Ann.cosineExpr(col("va"), col("vb")))
          .filter(col("cos") >= 0.45)
          .select("id_a", "id_b")
          .orderBy("id_a", "id_b")
      },
      Some("""
        SELECT a.vec_id AS id_a, b.vec_id AS id_b
        FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.45
        ORDER BY id_a, id_b"""),
      bench = false),

    // ------------------------------------------------------------------
    // IVF-bucketed cosine threshold pairs — the 100 TB twin of
    // dedup_embedding, and exact at ANY scale by construction:
    // candidates are generated only for triangle-inequality-admissible
    // cell pairs (ball-bound pruning) and exact-verified with the
    // codegen dot product. See Ann.embeddingIvfPairs.
    "dedup_embedding_ivf" -> Q(
      (s, dir) => Ann.embeddingIvfPairs(s, dir).orderBy("id_a", "id_b"),
      Some("""
        SELECT a.vec_id AS id_a, b.vec_id AS id_b
        FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.45
        ORDER BY id_a, id_b""")),

    // ------------------------------------------------------------------
    // Banded sign-random-projection LSH pairs — the HIGH-DIMENSION
    // scale path of the family (IVF ball-bound pruning is geometry-
    // dead past ~dim 100; see Ann.embeddingSrpPairs). Gated by the
    // FULL-REPLAY device (dedup_simhash's md5 precedent, one level
    // up): planes are md5-derived in oracle mode, so DuckDB recomputes
    // planes -> signs -> packed band signatures -> (band, sig) bucket
    // join -> hot-bucket cap -> exact cosine verification — the oracle
    // pins the ALGORITHM, not just its output, and recall vs the
    // exact pair set stays a spec-pinned measurement (AnnSpec).
    // Oracle-mode banding is r=8, b=42: at the shipped corpus's
    // near-threshold cosines (~0.45-0.6) that keeps true-pair
    // collisions likely-but-not-certain, so the emitted set is
    // SENSITIVE to every signature bit (r=14 would emit ~nothing at
    // cos 0.5 — an empty, gate-less oracle; r=4 would admit every
    // pair and gate only the verifier). The BENCH runs the production
    // shape — splitmix planes, r=14, b=24 — on the dim-256 GenData
    // twin corpus (planted ~0.5% eps-clones, the construction real
    // embedding columns have), where banding is the measured scale
    // win (Ann.dim256BenchDir).
    "dedup_embedding_srp" -> Q(
      (s, dir) => {
        // the oracle below replays md5 planes over range(0, 64) — a
        // corpus with a different dim would silently DROP components
        // in the plane join and gate against a wrong replay, so it
        // must fail loudly here instead (the ann_ivf_topk device)
        val dim = Ann.corpusDim(s, dir)
        require(dim == 64,
          s"dedup_embedding_srp's oracle pins dim=64 but the corpus is $dim-dim")
        Ann.embeddingSrpPairs(s, dir, threshold = 0.45,
            bands = 42, rowsPerBand = 8, planeMode = "md5")
          .orderBy("id_a", "id_b")
      },
      Some("""
        WITH planes AS (
          SELECT pk.k AS k, pj.j AS j,
                 CASE WHEN substring(md5(CAST(pk.k AS VARCHAR) || ':' ||
                        CAST(pj.j AS VARCHAR)), 1, 1)
                      BETWEEN '0' AND '7' THEN 1.0 ELSE -1.0 END AS s
          FROM range(0, 336) pk(k), range(0, 64) pj(j)),
        vec AS (
          SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS j,
                 unnest(embedding) AS v
          FROM embeddings),
        acc AS (
          SELECT v.vec_id, p.k // 8 AS band, p.k % 8 AS r,
                 sum(p.s * v.v) AS a
          FROM vec v JOIN planes p ON p.j = v.j
          GROUP BY 1, 2, 3),
        sigs AS (
          SELECT vec_id, band,
                 sum(CASE WHEN a >= 0 THEN (CAST(1 AS BIGINT) << r)
                     ELSE 0 END) AS sig
          FROM acc GROUP BY 1, 2),
        buckets AS (
          SELECT vec_id, band, sig,
                 row_number() OVER (PARTITION BY band, sig
                                    ORDER BY vec_id) AS rn,
                 count(*) OVER (PARTITION BY band, sig) AS cnt
          FROM sigs),
        cand AS (
          SELECT DISTINCT x.vec_id AS id_a, y.vec_id AS id_b
          FROM buckets x JOIN buckets y
            ON x.band = y.band AND x.sig = y.sig AND x.vec_id < y.vec_id
           AND (x.cnt <= 64 OR y.rn = x.rn + 1))
        SELECT c.id_a, c.id_b
        FROM cand c
        JOIN embeddings a ON a.vec_id = c.id_a
        JOIN embeddings b ON b.vec_id = c.id_b
        WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.45
        ORDER BY id_a, id_b"""),
      benchFn = Some((s, dir) =>
        // self-tuning banding (srpParams, n-aware FP budget): fixed
        // r=14/b=24 went quadratic in false candidates at the 200k
        // ladder rung — see Ann.embeddingSrpPairsAuto
        Ann.embeddingSrpPairsAuto(s, Ann.dim256BenchDir(s, dir)))),

    // ------------------------------------------------------------------
    // SemDeDup-style SEMANTIC dedup (Abbas et al. 2023): one verdict
    // row per document — duplicate iff a lower-vec_id member of its
    // embedding cluster sits within cosine >= threshold, keeper = the
    // group's min id. Where the other embedding rows emit PAIRS, this
    // is the decision operator a curation pipeline actually applies
    // (filter on is_dup). Pairwise work is confined to cells, so the
    // cell-keyed shuffle-hash self-join costs ~n^2/cells (n^1.5 at
    // the trained bench sizing cells ~ sqrt(n)) — never a global
    // product. CELL-EXACTLY oracled via the stride-seeded quantizer
    // (Ann.semanticDedupOracleSql replays assignment, the normalized-
    // dot pair predicate and the min-id verdict); the BENCH runs the
    // dim-256 twin under KMeans-trained cells (Ann.semanticDedupD256).
    // Cross-cell recall is pinned in DedupSpec against the exact
    // dedup_embedding pair set.
    "dedup_semantic" -> Q(
      (s, dir) => {
        val dim = Ann.corpusDim(s, dir)
        require(dim == 64,
          s"dedup_semantic's oracle pins dim=64 but the corpus is $dim-dim")
        Ann.semanticDedupSeeded(s, dir)
      },
      Some(Ann.semanticDedupOracleSql),
      benchFn = Some((s, dir) => Ann.semanticDedupD256(s, dir))),

    // ------------------------------------------------------------------
    // INCREMENTAL dedup — the shape every production ingest actually
    // runs: a small new batch (sources src18/src19 stand in for
    // today's crawl) probed against the HISTORY's inverted shingle
    // index, never history x history. The join is asymmetric (new x
    // all, proportional to the batch), history's exploded index is
    // the persisted artifact a resident pipeline keeps between
    // batches, and candidate verification only touches pairs sharing
    // a shingle. DuckDB brute-forces the same cross pairs.
    "dedup_incremental" -> Q(
      (s, dir) => {
        // r14 (verdict #1b): r13's eager checkpoint of the full shingle
        // table was a driver-measured 0.64x regression (materializing
        // every doc's shingle array cost more than the duplicated
        // compute it saved), and the r12 shape shingled the WHOLE
        // corpus once per branch. Both are dominated by pushing the
        // source split BELOW the shingler: each branch filters source
        // at the parquet scan (PushedFilters: In(source, ...)) and
        // shingles only its own documents — one full normText+shingle
        // pass total, split across the branches, no join to re-attach
        // source and no materialization. The branch sum equals one
        // corpus pass at any SF.
        graft.functions.GraftFunctions.register(s)
        val isNew = col("source").isin("src18", "src19")
        def shingled(pred: org.apache.spark.sql.Column) =
          Tables.documents(s, dir)
            .filter(pred)
            .repartition(s.sparkContext.defaultParallelism)
            .withColumn("norm", normText(col("text")))
            .selectExpr("doc_id", "graft_shingles(norm, 3) AS shingles")
            .withColumn("n_sh", size(col("shingles")))
            .filter(col("n_sh") > 0)
        val hist = shingled(!isNew)
          .select(col("doc_id").as("id_hist"), col("n_sh").as("nh"),
            explode(col("shingles")).as("sh"))
        val probe = shingled(isNew)
          .select(col("doc_id").as("id_new"), col("n_sh").as("nn"),
            explode(col("shingles")).as("sh"))
        probe.join(hist, Seq("sh"))
          .groupBy("id_new", "id_hist", "nn", "nh")
          .agg(count(lit(1)).as("inter"))
          .withColumn("jaccard", col("inter").cast("double") /
            (col("nn") + col("nh") - col("inter")))
          .filter(col("jaccard") >= 0.5)
          .select("id_new", "id_hist", "jaccard")
          .orderBy("id_new", "id_hist")
      },
      Some("""
        WITH t AS (SELECT doc_id, source,
               string_split(regexp_replace(trim(lower(text)), ' +', ' ', 'g'),
                            ' ') toks
             FROM documents),
        sh AS (SELECT doc_id, source,
                 list_distinct([array_to_string(toks[i:i+2], ' ')
                                for i in range(1, len(toks) - 1)]) shingles
               FROM t WHERE len(toks) >= 3),
        p AS (SELECT n.doc_id id_new, h.doc_id id_hist,
                CAST(len(list_intersect(n.shingles, h.shingles)) AS DOUBLE) /
                  (len(n.shingles) + len(h.shingles)
                   - len(list_intersect(n.shingles, h.shingles))) j
              FROM sh n JOIN sh h
                ON n.source IN ('src18', 'src19')
               AND h.source NOT IN ('src18', 'src19'))
        SELECT id_new, id_hist, j AS jaccard FROM p
        WHERE j >= 0.5 ORDER BY id_new, id_hist"""))
  )
}
