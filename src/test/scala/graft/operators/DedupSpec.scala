package graft.operators

import graft.{SparkEntry, SparkSpec}
import graft.functions.{GraftFunctions, SimHash64}
import org.apache.spark.sql.functions._

class DedupSpec extends SparkSpec {
  import graft.SparkSpec.spark.implicits._

  private def pairs(name: String): Set[(Long, Long)] =
    SparkEntry.registry(name).fn(spark, sf)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("componentLabels resolves chains, merges, and singletons") {
    // Components: {1,2,3,4} via a chain 1-2, 2-3, 3-4 (needs >1
    // propagation round), {10,11}, and singletons 20, 21.
    val pairEdges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L))
      .toDF("id_a", "id_b")
    val docs = Seq(1L, 2L, 3L, 4L, 10L, 11L, 20L, 21L).toDF("doc_id")
    val got = Dedup.componentLabels(pairEdges, docs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 20L -> 20L, 21L -> 21L))
  }

  test("componentLabels round count: clique/real graphs stay in the propagation regime; chains escape to pointer-jumping in O(log n)") {
    // dedup_clusters' cost model is rounds x (join + agg). Min-label
    // propagation pays diameter + 1 rounds (one hop per round plus the
    // confirming pass) — right for real dup groups, which are
    // near-cliques. The r12 verdict's open defect was the adversarial
    // regime: a chain-shaped pair graph (boilerplate chains, near-dup
    // ladders) paid 64 full supersteps. componentLabelsCounted now
    // escapes to pointer-jumping past `jumpAfter` un-converged rounds
    // (label(v) := label(label(v)) doubling), so the chain converges in
    // O(log n) extra rounds, and BOTH regimes reach the identical
    // fixpoint (cluster_id = min reachable doc_id).
    def edgesOf(pairs: Seq[(Long, Long)]) =
      pairs.toDF("id_a", "id_b")
    def docsOf(n: Long) = spark.range(n).toDF("doc_id")
    def labelMap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // 64-clique: diameter 1 — converges before the escape threshold
    val clique = for (i <- 0L until 64L; j <- (i + 1) until 64L) yield (i, j)
    val (cliqueLabels, cliqueRounds) =
      Dedup.componentLabelsCounted(edgesOf(clique), docsOf(64))
    assert(cliqueLabels.select("cluster_id").distinct().count() === 1L)
    assert(cliqueRounds <= 3, s"clique took $cliqueRounds rounds")
    // 64-chain: diameter 63. Pure propagation (jumpAfter = MaxValue)
    // pays ~diameter rounds; the default hybrid must land <= 12 AND
    // produce byte-identical labels.
    val chain = (0L until 63L).map(i => (i, i + 1))
    val (chainLabels, chainRounds) =
      Dedup.componentLabelsCounted(edgesOf(chain), docsOf(64))
    assert(chainLabels.select("cluster_id").distinct().count() === 1L)
    assert(chainRounds <= 12,
      s"chain rounds $chainRounds — pointer-jump escape did not engage")
    val (chainPure, chainPureRounds) = Dedup.componentLabelsCounted(
      edgesOf(chain), docsOf(64), jumpAfter = Int.MaxValue)
    assert(chainPureRounds >= 32 && chainPureRounds <= 66,
      s"pure-propagation chain rounds $chainPureRounds not ~diameter")
    assert(labelMap(chainLabels) == labelMap(chainPure),
      "hybrid and pure propagation disagree on the chain graph")
    // the REAL corpus pair graph: near-cliques, so rounds must stay in
    // the clique regime (the escape never engages on real corpora) —
    // and the hybrid's labels must equal pure propagation's.
    val realPairs = Dedup.jaccardPairs(
      Dedup.docShingles(spark, sf), 0.5).select("id_a", "id_b")
    val realDocs = graft.Tables.documents(spark, sf).select("doc_id")
    val (realLabels, realRounds) =
      Dedup.componentLabelsCounted(realPairs, realDocs)
    assert(realRounds <= 4,
      s"real pair graph took $realRounds rounds — chains appeared")
    val (realPure, _) = Dedup.componentLabelsCounted(
      realPairs, realDocs, jumpAfter = Int.MaxValue)
    assert(labelMap(realLabels) == labelMap(realPure),
      "hybrid and pure propagation disagree on the real pair graph")
    info(s"rounds: clique(64)=$cliqueRounds chain(64)=$chainRounds " +
      s"chainPure(64)=$chainPureRounds real(sf0.001)=$realRounds")
    java.nio.file.Files.write(
      java.nio.file.Paths.get("CC_ROUNDS_r13.json"),
      (s"""{"metric":"cc_label_propagation_rounds",""" +
        s""""clique64":$cliqueRounds,"chain64":$chainRounds,""" +
        s""""chain64_pure_propagation":$chainPureRounds,""" +
        s""""real_pair_graph_sf0001":$realRounds,""" +
        s""""note":"default = min-label propagation with a pointer-jumping escape after 4 un-converged rounds (Kiveris et al. large-star/small-star family); cliques and real dup groups converge in the propagation regime (2-3 rounds), adversarial chains now pay O(log n) doubling rounds instead of O(diameter); labels byte-identical across regimes (asserted)"}\n""")
        .getBytes("UTF-8"))
  }

  test("minhash-LSH finds exactly the exact-jaccard pairs on the test data") {
    val exact = pairs("dedup_ngram_jaccard")
    val lsh = pairs("dedup_minhash_lsh")
    assert(exact.nonEmpty, "test data should contain planted near-dups")
    assert(lsh == exact, s"LSH=${lsh.size} exact=${exact.size}")
  }

  test("simhash pairs are a subset of exact near-dup pairs with high recall") {
    val exact = pairs("dedup_ngram_jaccard")
    val sim = pairs("dedup_simhash")
    assert((sim -- exact).isEmpty, s"false positives: ${(sim -- exact).take(5)}")
    assert(sim.size >= (exact.size * 0.7).toInt,
      s"recall too low: ${sim.size}/${exact.size}")
  }

  test("simhash scale mode (xxhash64 features) also yields a valid pair set") {
    // same validity law as the md5 default: no false positives vs the
    // exact jaccard pair set, and high recall — the banding pipeline
    // is feature-hash-agnostic, only oracle-replayability differs
    val exact = pairs("dedup_ngram_jaccard")
    val sim = Dedup.simhashNearDupPairs(spark, sf, hash = "xxhash64")
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert((sim -- exact).isEmpty, s"false positives: ${(sim -- exact).take(5)}")
    assert(sim.size >= (exact.size * 0.7).toInt,
      s"recall too low: ${sim.size}/${exact.size}")
  }

  test("simhashPairs finds all hamming<=6 pairs and caps hot buckets") {
    val base = 0x0123456789ABCDEFL
    val near = Seq(
      base,
      base ^ 1L,
      base ^ ((1L << 5) | (1L << 20)),
      base ^ ((1L << 1) | (1L << 17) | (1L << 40)),
      base ^ (1L << 63)).zipWithIndex.map { case (s, i) => (i.toLong + 1, s) }
    // 50 docs whose signatures differ only inside byte-block 2: every
    // band NOT involving block 2 (21 of 28) holds all 50 docs — the
    // hot-bucket shape the cap must drop
    val crowd = (100 until 150).map(i => (i.toLong, i.toLong << 16))
    val sigs = (near ++ crowd).toDF("doc_id", "sig")
    // <= 6: the default maxHamming matches the banding's pigeonhole
    // exactness bound, so completeness below it is guaranteed (the
    // crowd contains hamming-7 pairs, e.g. 127^129, which the banding
    // may legitimately miss and the default therefore excludes)
    def expected(docs: Seq[(Long, Long)]): Set[(Long, Long)] = (for {
      (a, sa) <- docs; (b, sb) <- docs
      if a < b && java.lang.Long.bitCount(sa ^ sb) <= 6
    } yield (a, b)).toSet
    def got(cap: Int): Set[(Long, Long)] =
      Dedup.simhashPairs(sigs, bucketCap = cap).select("id_a", "id_b")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // roomy cap: every hamming<=6 pair found (pigeonhole: <=6 flips
    // leave at least one block pair untouched)
    assert(got(1000) == expected(near ++ crowd))
    // cap=10 drops the 50-doc buckets: crowd pairs (which share only
    // hot bands) disappear, small-bucket pairs are untouched
    assert(got(10) == expected(near))
  }

  test("exact dedup keeps one representative per duplicated text") {
    val dup = Seq((1L, "a b c"), (2L, "a b c"), (3L, "x  y"), (4L, "x y"))
      .toDF("doc_id", "text")
    val out = dup.groupBy(Dedup.normText(col("text")).as("norm"))
      .agg(min(col("doc_id")).as("doc_id"), count(lit(1)).as("n_copies"))
      .select("doc_id", "n_copies").orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // "x  y" normalizes to "x y": two groups survive, min ids kept
    assert(out.toSeq == Seq((1L, 2L), (3L, 2L)))
  }

  test("shingleExpr yields an empty array for docs shorter than k tokens") {
    // sequence(1, 0) is DESCENDING in Spark; an unguarded transform
    // would index element_at(th, 0) and throw for any short doc
    val docs = Seq((1L, "a"), (2L, "a b"), (3L, ""), (4L, "a b c d"))
      .toDF("doc_id", "text")
      .select(col("doc_id"), split(Dedup.normText(col("text")), " ").as("toks"))
      .select(col("doc_id"), expr("transform(toks, t -> xxhash64(t))").as("th"))
      .select(col("doc_id"), expr(Dedup.shingleExpr(3)).as("shingles"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).length).toMap
    assert(docs(1L) == 0 && docs(2L) == 0 && docs(3L) == 0)
    assert(docs(4L) == 2) // "a b c", "b c d"
  }

  test("native graft_shingles matches the HOF reference semantics") {
    graft.functions.GraftFunctions.register(spark)
    // same shingle COUNTS as shingleExpr on every doc (hash values
    // differ by design — both are opaque 64-bit shingle keys), same
    // empty-for-short-docs behavior, distinct within each doc
    val base = Seq((1L, "a"), (2L, "a b c"), (3L, ""), (4L, "a b c d b c d e"),
      (5L, "x x x x x")).toDF("doc_id", "text")
      .withColumn("norm", Dedup.normText(col("text")))
    val both = base
      .select(col("doc_id"), split(col("norm"), " ").as("toks"), col("norm"))
      .select(col("doc_id"), expr("transform(toks, t -> xxhash64(t))").as("th"),
        col("norm"))
      .select(col("doc_id"), expr(Dedup.shingleExpr(3)).as("ref"),
        expr("graft_shingles(norm, 3)").as("fast"))
      .collect()
    for (r <- both) {
      val ref = r.getSeq[Long](1); val fast = r.getSeq[Long](2)
      assert(ref.length == fast.length,
        s"doc ${r.getLong(0)}: ref ${ref.length} vs native ${fast.length}")
      assert(fast.distinct.length == fast.length)
    }
    // order-sensitivity: "a b" and "b a" shingle differently
    import graft.functions.Shingles
    import org.apache.spark.unsafe.types.UTF8String
    val ab = Shingles.wordShingles(UTF8String.fromString("a b"), 2).toLongArray()
    val ba = Shingles.wordShingles(UTF8String.fromString("b a"), 2).toLongArray()
    assert(ab.head != ba.head)
  }

  test("jaccardPairs computes exact jaccard on a constructed pair") {
    val docs = Seq(
      (1L, Array("a b c", "b c d", "c d e"), 3),
      (2L, Array("a b c", "b c d", "z z z"), 3),
      (3L, Array("q q q"), 1)).toDF("doc_id", "shingles", "n_sh")
    val out = Dedup.jaccardPairs(docs, 0.4).collect()
    assert(out.length == 1)
    assert(out(0).getLong(0) == 1L && out(0).getLong(1) == 2L)
    assert(math.abs(out(0).getDouble(2) - 0.5) < 1e-12) // 2 shared / 4 union
  }

  test("SimHash64 expression matches reference and separates feature sets") {
    GraftFunctions.register(spark)
    val fs = Seq(
      Seq(1L, 2L, 3L, Long.MaxValue, -7L),
      Seq(1L, 2L, 3L, Long.MaxValue, -7L, 99L), // near-identical
      Seq(1000L, -2000L, 300045L))              // different
    val got = fs.map(_.toArray).toDF("hs")
      .select(expr("graft_simhash(hs)").as("sig"))
      .collect().map(_.getLong(0))
    assert(got.toSeq == fs.map(SimHash64.hash))
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(got(0), got(1)) < ham(got(0), got(2)))
  }

  test("embedding near-dup pairs agree between exact and re-verified IVF recall") {
    val exact = pairs("dedup_embedding")
    assert(exact.nonEmpty)
    // every exact pair has cosine >= threshold when recomputed
    val e = graft.Tables.embeddings(spark, sf)
    val withCos = exact.toSeq.toDF("id_a", "id_b")
      .join(e.select(col("vec_id").as("id_a"), col("embedding").as("va")), Seq("id_a"))
      .join(e.select(col("vec_id").as("id_b"), col("embedding").as("vb")), Seq("id_b"))
      .withColumn("cos", Ann.cosineExpr(col("va"), col("vb")))
    assert(withCos.filter(col("cos") < 0.45).count() == 0)
  }

  test("dedup_semantic: sound verdicts, min-id keeper, cross-cell recall vs exact pairs") {
    val out = SparkEntry.registry("dedup_semantic").fn(spark, sf).collect()
    val n = graft.Tables.embeddings(spark, sf).count()
    assert(out.length == n, s"${out.length} verdict rows for $n vectors")
    val cellOf = out.map(r => r.getLong(0) -> r.getInt(1)).toMap
    val flagged = out.filter(!_.isNullAt(2))
      .map(r => (r.getLong(0), r.getLong(2))).toSeq
    // is_dup must mirror dup_of presence exactly
    assert(out.forall(r => r.getBoolean(3) == !r.isNullAt(2)))
    // the exact 0.45-cosine pair set (dedup_embedding is the oracled
    // O(n^2) ground truth on this corpus)
    val exact = pairs("dedup_embedding")
    assert(exact.nonEmpty)
    val lowerPartners: Map[Long, Seq[Long]] =
      exact.toSeq.groupBy(_._2).view.mapValues(_.map(_._1)).toMap
    for ((v, dupOf) <- flagged) {
      // soundness: the flagged partner is a true >=0.45 pair, lower
      // id, co-clustered — and the MINIMUM such id in v's cell
      assert(dupOf < v, s"$v flagged against non-lower $dupOf")
      assert(cellOf(dupOf) == cellOf(v), s"$v flagged across cells")
      assert(exact.contains((dupOf, v)),
        s"($dupOf, $v) flagged but not a true >=0.45 pair")
      val minInCell = lowerPartners(v).filter(p => cellOf(p) == cellOf(v)).min
      assert(dupOf == minInCell,
        s"$v: dup_of=$dupOf but min same-cell partner is $minInCell")
    }
    // completeness within cells: every doc with a same-cell lower
    // partner MUST be flagged (the only misses allowed are cross-cell
    // splits — the documented SemDeDup trade)
    val shouldFlag = lowerPartners.collect {
      case (v, ps) if ps.exists(p => cellOf(p) == cellOf(v)) => v
    }.toSet
    assert(flagged.map(_._1).toSet == shouldFlag,
      "within-cell dup verdicts incomplete")
    // cross-cell recall: fraction of all true dup docs that co-cluster
    val dupDocs = lowerPartners.keySet
    val recall = shouldFlag.size.toDouble / dupDocs.size
    info(f"dedup_semantic recall vs exact = $recall%.2f " +
      s"(${shouldFlag.size}/${dupDocs.size} dup docs co-clustered, cells=8)")
    // the seeded 8-random-cell mode exists for DuckDB replayability;
    // at dim 64 with moderate (0.45) pair cosines random-corpus-point
    // cells split pairs often (measured 3/7). The floor only guards
    // degeneration to zero; the PRODUCTION recall point is the
    // trained dim-256 run below, where true clones co-cluster.
    assert(recall >= 0.3, f"semantic dedup recall degenerate: $recall%.2f")
    // determinism
    val again = SparkEntry.registry("dedup_semantic").fn(spark, sf).collect()
    assert(again.map(_.toString).toSeq == out.map(_.toString).toSeq,
      "dedup_semantic not deterministic")
  }

  test("dedup_semantic production trim: trained dim-256 cells catch planted clones") {
    // the BENCHED shape (semanticDedupD256): KMeans cells ~ sqrt(n)
    // over the dim-256 twin, threshold 0.8 — planted eps-clones sit
    // at cos >= ~0.87 and must co-cluster under TRAINED cells (the
    // SemDeDup premise the seeded-mode floor above cannot exercise)
    val d256 = Ann.dim256BenchDir(spark, sf)
    val out = Ann.semanticDedupD256(spark, sf).collect()
    val e = graft.Tables.embeddings(spark, d256)
      .select(col("vec_id"), col("embedding"))
    val a = e.select(col("vec_id").as("id_a"), col("embedding").as("va"))
    val b = e.select(col("vec_id").as("id_b"), col("embedding").as("vb"))
    val exact = a.crossJoin(b).filter(col("id_a") < col("id_b"))
      .withColumn("cos", Ann.cosineExpr(col("va"), col("vb")))
      .filter(col("cos") >= 0.8).select("id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty, "twin corpus has no planted 0.8-clone pairs")
    val dupDocs = exact.map(_._2)
    val flagged = out.filter(!_.isNullAt(2)).map(_.getLong(0)).toSet
    // soundness: only true 0.8-dup docs are flagged
    assert(flagged.subsetOf(dupDocs),
      s"false dup verdicts: ${(flagged -- dupDocs).take(3)}")
    val recall = flagged.size.toDouble / dupDocs.size
    info(f"trained dim-256 semantic-dedup recall = $recall%.2f " +
      s"(${flagged.size}/${dupDocs.size} clone docs)")
    assert(recall >= 0.9, f"trained semantic dedup misses clones: $recall%.2f (pinned 1.00)")
  }
}
