package graft.tools

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic same-shape corpus generator for scale factors the
  * shipped read-only testdata does not include (the driver generates
  * sf0.001/0.01/0.1; the scaling study needs an sf1 point one decade
  * deeper, where data genuinely dominates fixed overhead).
  *
  * Shape-faithful to /root/testdata (schemas, value domains, key
  * cardinality ratios, categorical distributions measured from the
  * shipped corpus), NOT byte-faithful: randomness is hash-derived
  * (`xxhash64(id, salt)`), so generation is seedless-deterministic,
  * fully distributed, and O(rows/cores) — the generator itself is a
  * 100 TB-shaped pipeline (no driver-side RNG state, no collect).
  *
  * Usage: `runMain graft.tools.GenData <sf> <outDir>`
  */
object GenData {

  /** Deterministic uniform [0,1) from (id, salt, seed). */
  def uniform(id: Column, salt: Int, seed: Long): Column =
    pmod(xxhash64(id, lit(salt), lit(seed)), lit(1000000000L))
      .cast("double") / 1e9

  /** Deterministic uniform integer [0, n). */
  def uniformInt(id: Column, salt: Int, n: Long, seed: Long): Column =
    pmod(xxhash64(id, lit(salt), lit(seed)), lit(n))

  def main(args: Array[String]): Unit = {
    require(args.length >= 2,
      "usage: GenData <sf> <outDir> [embDim] [table,table,...]")
    val sf = args(0).toDouble
    val out = args(1)
    val embDim = if (args.length >= 3) args(2).toInt else 64
    val tables = if (args.length >= 4)
      Some(args(3).split(',').map(_.trim).toSet) else None
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    generate(spark, sf, out, embDim = embDim, tables = tables)
    spark.stop()
  }

  /** `seed` perturbs every hash-derived value (not the shape), so
    * property-style fuzzing (OracleFuzzSpec) can draw many distinct
    * same-shape corpora deterministically.
    *
    * `embDim` selects the embeddings construction. 64 (default) is the
    * shipped-corpus shape every oracle pins (cluster centroid + wide
    * random tail). At 64 dims random unit vectors land near cosine
    * 0.45 often enough that the TRUE >=0.45 pair set grows with n² —
    * a corpus-construction artifact that makes near-dup scaling
    * UNMEASURABLE (the r7 ladder's adjudicated 28x). Any other dim
    * (use 256) switches to a measurable construction: random-pair
    * cosine concentrates near 0 (sigma ~ 1/sqrt(dim), so P(cos>=0.45)
    * ~ 0 at dim 256) and near-dups are EXPLICIT — ~0.5% of vectors are
    * eps-perturbed clones of a hash-chosen earlier vector — so the
    * true pair count is ~0.005·n: density per row flat across SFs,
    * the way real corpora dedup.
    */
  def generate(spark: SparkSession, sf: Double, out: String,
      seed: Long = 0L, embDim: Int = 64,
      tables: Option[Set[String]] = None): Unit = {
    def u(id: Column, salt: Int): Column = uniform(id, salt, seed)
    def ui(id: Column, salt: Int, n: Long): Column =
      uniformInt(id, salt, n, seed)
    def pick(id: Column, salt: Int, vals: Seq[String]): Column =
      element_at(array(vals.map(lit): _*),
        (ui(id, salt, vals.size) + 1).cast("int"))
    def day(id: Column, salt: Int, start: String, days: Int): Column =
      date_add(lit(start).cast("date"), ui(id, salt, days).cast("int"))
        .cast("timestamp_ntz")
    def n(base: Long): Long = math.max(1L, (base * sf).round)
    val nCust = n(150000); val nSupp = n(10000); val nPart = n(200000)
    val nOrders = n(1500000); val nEvents = n(1000000)
    val nUsers = n(15000)
    val nDocs = math.max(500L, (50000 * sf).round)
    val nEmb = math.max(500L, (20000 * sf).round)

    // Real ingest pipelines write roughly CONSTANT-SIZE files, so the
    // file count grows with the data — that is what lets scan
    // parallelism scale with corpus size. The base counts are sized
    // for ~sf1; deeper decades multiply them (capped), else a 67 MB
    // documents table arrives as 4 single-row-group files and every
    // text scan runs 4-wide on a 32-core host (measured: the whole
    // >10x tail of the sf1->sf10 ladder was this layout artifact, not
    // operator cost). Shallower decades keep the base (files only
    // shrink below it in bytes, never in count — same as a real lake).
    def write(df: DataFrame, name: String, base: Int): Unit =
      if (tables.forall(_.contains(name))) {
        val files = math.max(base, math.min(512L, (base * sf).round)).toInt
        df.repartition(files)
          .write.mode(SaveMode.Overwrite).parquet(s"$out/$name.parquet")
        println(s"[gendata] $name written ($files files)")
      }

    // fixed dimensions — identical to the shipped corpus
    import spark.implicits._
    write(Seq((0, "AFRICA"), (1, "AMERICA"), (2, "ASIA"), (3, "EUROPE"),
      (4, "MIDDLE EAST")).toDF("r_regionkey", "r_name"), "region", 1)
    write((0 until 25).map(i => (i, s"NATION_$i", i % 5))
      .toDF("n_nationkey", "n_name", "n_regionkey"), "nation", 1)

    val segs = Seq("AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY")
    write(spark.range(nCust).select(
      col("id").as("c_custkey"),
      format_string("Customer#%09d", col("id")).as("c_name"),
      ui(col("id"), 1, 25).cast("int").as("c_nationkey"),
      round(lit(-1000.0) + u(col("id"), 2) * 11000.0, 2).as("c_acctbal"),
      pick(col("id"), 3, segs).as("c_mktsegment")), "customer", 8)

    write(spark.range(nSupp).select(
      col("id").as("s_suppkey"),
      format_string("Supplier#%09d", col("id")).as("s_name"),
      ui(col("id"), 4, 25).cast("int").as("s_nationkey"),
      round(lit(-1000.0) + u(col("id"), 5) * 11000.0, 2).as("s_acctbal")),
      "supplier", 2)

    val adjs = Seq("small", "red", "blue", "hot", "large", "green", "cold", "dim")
    val nouns = Seq("ring", "widget", "bolt", "gear", "gizmo", "cog", "plate", "tube")
    val types = Seq("ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD")
    write(spark.range(nPart).select(
      col("id").as("p_partkey"),
      concat_ws(" ", pick(col("id"), 6, adjs), pick(col("id"), 7, nouns)).as("p_name"),
      concat(lit("Brand#"), (ui(col("id"), 8, 25) + 1).cast("string")).as("p_brand"),
      pick(col("id"), 9, types).as("p_type"),
      (ui(col("id"), 10, 50) + 1).cast("int").as("p_size"),
      round(lit(900.0) + ui(col("id"), 11, 1000).cast("double") * 0.1, 2)
        .as("p_retailprice")), "part", 4)

    val prios = Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")
    // 1995-01-01 .. 2001-08-01 day-grain, uniform (2404-day domain)
    val orders = spark.range(nOrders).select(
      col("id").as("o_orderkey"),
      ui(col("id"), 12, nCust).as("o_custkey"),
      pick(col("id"), 13, Seq("P", "O", "F")).as("o_orderstatus"),
      round(lit(1000.0) + u(col("id"), 14) * 499000.0, 2).as("o_totalprice"),
      day(col("id"), 15, "1995-01-01", 2404).as("o_orderdate"),
      pick(col("id"), 16, prios).as("o_orderpriority"))
    write(orders, "orders", 8)

    // 1..7 lines per order (mean 4 -> lineitem ~ 4x orders); line
    // attributes hash on (orderkey, linenumber) so they are stable
    // under any partitioning
    val li = spark.range(nOrders)
      .select(col("id"),
        (lit(1) + ui(col("id"), 17, 4) + ui(col("id"), 18, 4)).cast("int").as("k"))
      .select(col("id").as("l_orderkey"),
        explode(sequence(lit(1), col("k"))).as("l_linenumber"))
      .withColumn("lid", col("l_orderkey") * 16 + col("l_linenumber"))
    write(li.select(
      col("l_orderkey"),
      ui(col("lid"), 19, nPart).as("l_partkey"),
      ui(col("lid"), 20, nSupp).as("l_suppkey"),
      col("l_linenumber"),
      (ui(col("lid"), 21, 50) + 1).cast("double").as("l_quantity"),
      round(lit(901.0) + u(col("lid"), 22) * 104100.0, 2).as("l_extendedprice"),
      round(ui(col("lid"), 23, 11).cast("double") * 0.01, 2).as("l_discount"),
      round(ui(col("lid"), 24, 9).cast("double") * 0.01, 2).as("l_tax"),
      pick(col("lid"), 25, Seq("A", "N", "R")).as("l_returnflag"),
      pick(col("lid"), 26, Seq("O", "F")).as("l_linestatus"),
      day(col("lid"), 27, "1995-01-02", 2499).as("l_shipdate")), "lineitem", 16)

    // events: 30 days of Jan-2024 at microsecond grain; value is
    // exponential with mean 50 (matches the shipped avg/median shape)
    val epoch20240101us = 1704067200000000L
    write(spark.range(nEvents).select(
      col("id").as("event_id"),
      timestamp_micros(lit(epoch20240101us) +
        (u(col("id"), 28) * 30.0 * 86400.0 * 1e6).cast("long")).as("ts"),
      ui(col("id"), 29, nUsers).as("user_id"),
      pick(col("id"), 30, Seq("click", "error", "purchase", "signup", "view"))
        .as("event_type"),
      round(greatest(lit(0.01), -log(lit(1.0) - u(col("id"), 31)) * 50.0), 2)
        .as("value"),
      format_string("{\"k\": %d}", ui(col("id"), 32, 100)).as("props")),
      "events", 8)

    // documents: word salad over the shipped corpus's vocabulary,
    // 8..97 words (≈300 chars avg), en-heavy language mix, 20 sources
    val vocab = Seq("key", "agg", "row", "scan", "slow", "fast", "table",
      "value", "part", "hash", "batch", "window", "spark", "order", "data",
      "column", "join", "small", "line", "customer", "merge", "big", "a",
      "the", "filter", "group", "sort", "read", "write", "shuffle", "plan",
      "query", "index", "cache", "disk", "node", "task", "stage", "block")
    // Heaps-law vocabulary growth: the shipped corpus uses ~39 words
    // at its 5000-doc top SF; holding that FIXED while docs grow 10x
    // saturates the trigram shingle space and makes random docs
    // collide quadratically (measured 18x super-linear on the
    // inverted-index dedup at sf1). vocab ∝ cbrt(docs) keeps the
    // shingle doc-frequency profile — the statistic dedup cost
    // scales with — flat across SFs, as real corpora do.
    val vocabSize = math.max(vocab.size,
      (2.3 * math.cbrt(nDocs.toDouble)).round.toInt)
    val wordIdx = (i: Column) =>
      pmod(xxhash64(col("id"), i, lit(34), lit(seed)), lit(vocabSize))
    val docs = spark.range(nDocs).select(
      col("id").as("doc_id"),
      array_join(transform(
        sequence(lit(1), (ui(col("id"), 33, 90) + 8).cast("int")),
        i => when(wordIdx(i) < vocab.size,
          element_at(array(vocab.map(lit): _*),
            (wordIdx(i) + 1).cast("int")))
          .otherwise(concat(lit("tok"), wordIdx(i)))), " ").as("text"),
      when(u(col("id"), 35) < 0.6, "en")
        .when(u(col("id"), 35) < 0.7, "fr")
        .when(u(col("id"), 35) < 0.8, "de")
        .when(u(col("id"), 35) < 0.9, "es")
        .otherwise("zh").as("lang"),
      concat(lit("src"), ui(col("id"), 36, 20).cast("string")).as("source"))
      .withColumn("n_chars", length(col("text")).cast("long"))
    write(docs, "documents", 4)

    // embeddings: 10 label clusters, unit-normalized 64-dim float
    // vectors = per-(label, dim) centroid + per-(id, dim) noise. The
    // noise scale is tuned so the >=0.45-cosine pair DENSITY matches
    // the shipped corpus (~7e-5 of all pairs): near-dup density is
    // the statistic the dedup/ANN operators' cost scales with — a
    // tighter cluster makes the TRUE pair set quadratic and any
    // scaling study meaningless.
    val embBase =
      if (embDim == 64) {
        val noiseScale = 3.5
        val raw = transform(sequence(lit(0), lit(63)), j =>
          (pmod(xxhash64(col("label"), j, lit(37)), lit(1000)).cast("double") / 1000.0
            - 0.5) +
            (pmod(xxhash64(col("id"), j, lit(38), lit(seed)), lit(1000))
              .cast("double") / 1000.0 - 0.5) * noiseScale)
        spark.range(nEmb)
          .withColumn("label", ui(col("id"), 39, 10).cast("int"))
          .withColumn("raw", raw)
      } else {
        // measurable construction (see scaladoc): ~0.5% of ids clone a
        // hash-chosen earlier id's BASE vector plus eps-noise; the base
        // vector is a pure function of (label(base), base), so clone
        // and original agree without any cross-row dependency in the
        // generator (stays one embarrassingly-parallel projection).
        // cos(clone, base) ≈ 1/sqrt(1 + eps²/1.09) ∈ [0.87, 0.98] for
        // eps ∈ [0.2, 0.6] — all comfortably above the 0.45 threshold,
        // while unrelated pairs sit 6+ sigma below it.
        val isDup = (u(col("id"), 40) < 0.005) && (col("id") >= lit(64L))
        spark.range(nEmb)
          .withColumn("dup", isDup)
          .withColumn("base", when(isDup,
            pmod(xxhash64(col("id"), lit(41), lit(seed)), col("id")))
            .otherwise(col("id")))
          .withColumn("eps",
            ui(col("id"), 42, 5).cast("double") * 0.1 + lit(0.2))
          // label follows the base so clones stay inside one IVF cluster
          .withColumn("label", ui(col("base"), 39, 10).cast("int"))
          .withColumn("raw", transform(sequence(lit(0), lit(embDim - 1)), j =>
            (pmod(xxhash64(col("label"), j, lit(37)), lit(1000))
              .cast("double") / 1000.0 - 0.5) * 0.3 +
              (pmod(xxhash64(col("base"), j, lit(38), lit(seed)), lit(1000))
                .cast("double") / 1000.0 - 0.5) +
              when(col("dup"),
                (pmod(xxhash64(col("id"), j, lit(43), lit(seed)), lit(1000))
                  .cast("double") / 1000.0 - 0.5) * col("eps"))
                .otherwise(lit(0.0))))
      }
    write(embBase
      .withColumn("nrm", sqrt(aggregate(col("raw"), lit(0.0), (a, x) => a + x * x)))
      .select(
        col("id").as("vec_id"),
        transform(col("raw"), x => (x / col("nrm")).cast("float")).as("embedding"),
        col("label")), "embeddings", 4)
    // the corpus at `out` just changed under any same-JVM reader —
    // drop Ann's memoized embedding dim for it
    graft.operators.Ann.invalidateDim(out)
  }
}
