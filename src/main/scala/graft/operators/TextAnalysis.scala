package graft.operators

import graft.{Q, Tables}
import graft.functions.GraftFunctions
import org.apache.spark.sql.functions._

/** Group H of SURVEY.md §2 — text analysis for a training-data
  * pipeline. Everything is per-row expression work (no shuffles at
  * all until the final presentation sort), so these scale linearly:
  * at 100 TB they are pure map stages over the parquet scan.
  */
object TextAnalysis {

  /** Stopword lists used by both the Spark side and the SQL oracle. */
  val stop: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "in", "is", "that", "for", "a", "on"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "mit", "ein"),
    "es" -> Seq("el", "la", "los", "de", "que", "y", "en", "un"),
    "fr" -> Seq("le", "les", "et", "des", "une", "que", "dans", "pour"))

  private def inList(ws: Seq[String]) = ws.map(w => s"'$w'").mkString(", ")

  /** score_<lang> = number of tokens that are stopwords of <lang>. */
  private def scoreExpr(lang: String) =
    s"size(filter(split(text, ' '), t -> t IN (${inList(stop(lang))})))"
  private def scoreSql(lang: String) =
    s"CAST(len(list_filter(string_split(text, ' '), t -> t IN (${inList(stop(lang))}))) AS INTEGER)"

  /** Iterative BPE tokenizer training (Sennrich-style, word-level):
    * greedy top-pair merges applied corpus-wide. Spark shape:
    *
    *   - The ONE corpus-sized job is the initial word-frequency
    *     aggregate (map-side combined scan). Everything after runs on
    *     the VOCAB-sized (word, freq, symbols) state — supersteps
    *     cost is independent of corpus bytes, which is what makes BPE
    *     trainable at 100 TB.
    *   - Each step: adjacent symbol pairs via slice+zip_with
    *     (codegen'd), one freq-weighted count, a deterministic top-1
    *     (score desc, pair asc — ties never flap), then the merge is
    *     applied to every word in one HOF fold (greedy left-to-right,
    *     non-overlapping: "aaa" + (a,a) -> [aa, a]). The interpreted
    *     lambda touches vocab rows only, never the corpus.
    *   - Lineage is checkpoint-cut per step like [[graft.operators.Graph.pageRank]].
    *
    * Returns the merge table (step, left, right, score) — the learned
    * tokenizer.
    */
  def bpeTrain(docs: org.apache.spark.sql.DataFrame, merges: Int)
      : org.apache.spark.sql.DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val words = docs
      .select(explode(split(lower(col("text")), "\\s+")).as("w"))
      .filter(length(col("w")) >= 2)
      .groupBy("w").agg(count(lit(1)).as("freq"))
    var state = words
      .select(col("freq"), split(col("w"), "").as("syms"))
      .localCheckpoint(eager = true)
    val learned = scala.collection.mutable.ListBuffer.empty[(Int, String, String, Long)]
    var step = 0
    var exhausted = false
    while (step < merges && !exhausted) {
      step += 1
      val n = size(col("syms"))
      val pairs = state.select(col("freq"), explode(
        zip_with(slice(col("syms"), lit(1), n - 1),
          slice(col("syms"), lit(2), n - 1),
          (a, b) => struct(a.as("a"), b.as("b")))).as("p"))
      val top = pairs
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum(col("freq")).as("score"))
        .orderBy(col("score").desc, col("a"), col("b"))
        .limit(1).collect()
      if (top.isEmpty) exhausted = true
      else {
        val (a, b) = (top(0).getString(0), top(0).getString(1))
        learned += ((step, a, b, top(0).getLong(2)))
        val prev = state
        state = state.withColumn("syms",
          aggregate(col("syms"), array().cast("array<string>"),
            (acc, x) => when(
              size(acc) > 0 && element_at(acc, -1) === lit(a) && x === lit(b),
              concat(slice(acc, lit(1), size(acc) - 1),
                array(concat_ws("", element_at(acc, -1), x))))
              .otherwise(concat(acc, array(x)))))
          .localCheckpoint(eager = true)
        // step i-1's checkpoint is dead once step i's materializes —
        // free it without waiting for a GC (the pagerank lesson)
        org.apache.spark.sql.GraftBenchShim.unpersistLocalCheckpoint(prev)
      }
    }
    // the merge table is already collected on the driver — the final
    // state checkpoint has no further reader, free it now (r14 advice:
    // the leak class CkptSlot handles for frames that ARE returned)
    org.apache.spark.sql.GraftBenchShim.unpersistLocalCheckpoint(state)
    learned.toSeq.toDF("step", "left", "right", "score")
  }

  /** DuckDB replay of [[bpeTrain]] — one unrolled CTE trio per merge
    * step (the graph_pagerank device for an iterative TEXT operator).
    * The load-bearing trick is the merge step: Spark's greedy
    * left-to-right non-overlapping HOF fold is exactly SQL
    * `replace()` semantics on a separator-wrapped symbol string —
    * each symbol rides as chr(31)||s||chr(31), so the pattern
    * ␟a␟␟b␟ -> ␟ab␟ consumes matches left-to-right without
    * overlapping and preserves the neighbors' separators ("abab"
    * merges both pairs, "aaa" merges only the first — the same law
    * the fold implements; chr(31) never occurs in the corpus).
    * Scores are exact integer sums and the top-1 tie-break (score
    * desc, pair asc) is binary-collation-identical in both engines,
    * so all `merges` rows pin cell-exactly. CTEs are MATERIALIZED:
    * each state feeds the next step twice, and inlining would
    * re-evaluate the chain exponentially.
    */
  private def bpeOracleSql(merges: Int): String = {
    val sep = "chr(31)"
    def step(k: Int) = s"""
    p$k AS MATERIALIZED (
      SELECT p.a AS a, p.b AS b, CAST(sum(freq) AS BIGINT) AS score
      FROM (SELECT freq,
              unnest([{'a': syms[i+1], 'b': syms[i+2]}
                      for i in range(len(syms) - 1)]) AS p
            FROM (SELECT freq,
                    string_split(substr(cat, 2, length(cat) - 2),
                                 $sep || $sep) AS syms
                  FROM s${k - 1}))
      GROUP BY p.a, p.b),
    t$k AS MATERIALIZED (SELECT a, b, score FROM p$k
             ORDER BY score DESC, a, b LIMIT 1),
    s$k AS MATERIALIZED (
      SELECT freq, replace(cat,
        (SELECT $sep || a || $sep || $sep || b || $sep FROM t$k),
        (SELECT $sep || a || b || $sep FROM t$k)) AS cat
      FROM s${k - 1})"""
    s"""
    WITH w0 AS MATERIALIZED (
      SELECT w, CAST(count(*) AS BIGINT) AS freq
      FROM (SELECT unnest(string_split_regex(lower(text), '\\s+')) AS w
            FROM documents)
      WHERE length(w) >= 2
      GROUP BY w),
    s0 AS MATERIALIZED (
      SELECT freq,
        list_aggregate([$sep || c || $sep for c in string_split(w, '')],
                       'string_agg', '') AS cat
      FROM w0),""" +
      (1 to merges).map(step).mkString(",") + "\n" +
      (1 to merges).map(k =>
        s"""SELECT CAST($k AS INTEGER) AS step, a AS "left", b AS "right", score FROM t$k""")
        .mkString(" UNION ALL ") +
      " ORDER BY step"
  }

  val all: Map[String, Q] = Map(
    // ------------------------------------------------------------------
    // Iterative BPE training (see bpeTrain): 10 greedy merges over the
    // documents corpus — CELL-EXACTLY oracled (round 6) by the
    // unrolled replace()-merge replay in [[bpeOracleSql]]. TextSpec
    // additionally pins the first four merges of the classic
    // low/lower/newest/widest corpus by hand.
    "txt_bpe_train" -> Q(
      (s, dir) => bpeTrain(Tables.documents(s, dir), 10),
      Some(bpeOracleSql(10))),

    // ------------------------------------------------------------------
    // Vocabulary growth curve (Heaps' law measurement, the tokenizer-
    // sizing input) over 3-gram shingles: cumulative distinct-shingle
    // count after each decile of the corpus WITHOUT any windowed
    // distinct — each shingle contributes only its FIRST-occurrence
    // decile (one min per shingle), then a 10-row cumulative sum.
    // Two narrow aggregations however large the corpus.
    "txt_vocab_growth" -> Q(
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val docs = Tables.documents(s, dir)
        val n = docs.agg(count(lit(1)).as("n_docs"))
        // tokenize ONCE per row into a bound column: HOF lambdas run
        // interpreted, so a split() inside the lambda body would re-run
        // the regex once per shingle POSITION (O(tokens^2) per doc)
        val firsts = docs.crossJoin(broadcast(n))
          .select(expr("CAST((doc_id * 10) div n_docs AS INT)").as("decile"),
            split(lower(col("text")), "\\s+").as("tl"))
          .select(col("decile"),
            explode(expr("""
              transform(sequence(1, size(tl) - 2),
                i -> concat_ws(' ', slice(tl, i, 3)))
              """)).as("term"))
          .groupBy("term").agg(min(col("decile")).as("first_decile"))
        firsts.groupBy("first_decile")
          .agg(count(lit(1)).as("new_terms"))
          .withColumn("vocab_size",
            sum(col("new_terms")).over(Window.orderBy("first_decile")
              .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .orderBy("first_decile")
      },
      Some("""
        WITH firsts AS (
          SELECT unnest([array_to_string(tl[i:i+2], ' ')
                         for i in range(1, len(tl) - 1)]) AS term,
                 CAST((doc_id * 10) // (SELECT count(*) FROM documents)
                   AS INTEGER) AS decile
          FROM (SELECT doc_id,
                  regexp_split_to_array(lower(text), '\s+') AS tl
                FROM documents)),
        f AS (SELECT term, min(decile) AS first_decile FROM firsts
              GROUP BY term),
        d AS (SELECT first_decile, count(*) AS new_terms FROM f GROUP BY 1)
        SELECT first_decile, new_terms,
               CAST(sum(new_terms) OVER (ORDER BY first_decile
                 ROWS UNBOUNDED PRECEDING) AS BIGINT) AS vocab_size
        FROM d ORDER BY first_decile""")),

    // ------------------------------------------------------------------
    // Language ID: stopword-hit scoring per candidate language plus a
    // CJK-character count; argmax with a fixed priority order on ties.
    "txt_lang_id" -> Q(
      (s, dir) => {
        val langs = Seq("en", "de", "es", "fr")
        var df = Tables.documents(s, dir)
        for (l <- langs) df = df.withColumn(s"score_$l", expr(scoreExpr(l)))
        df.withColumn("score_zh",
            length(regexp_replace(col("text"), "[^\\u4e00-\\u9fff]", "")))
          .withColumn("pred_lang",
            expr("""CASE
              WHEN score_zh > 0 THEN 'zh'
              WHEN score_en >= score_de AND score_en >= score_es
                   AND score_en >= score_fr THEN 'en'
              WHEN score_de >= score_es AND score_de >= score_fr THEN 'de'
              WHEN score_es >= score_fr THEN 'es'
              ELSE 'fr' END"""))
          .select("doc_id", "score_en", "score_de", "score_es", "score_fr",
            "score_zh", "pred_lang")
          .orderBy("doc_id")
      },
      Some(s"""
        WITH scored AS (
          SELECT doc_id,
                 ${scoreSql("en")} AS score_en,
                 ${scoreSql("de")} AS score_de,
                 ${scoreSql("es")} AS score_es,
                 ${scoreSql("fr")} AS score_fr,
                 CAST(length(regexp_replace(text, '[^\\x{4e00}-\\x{9fff}]', '', 'g'))
                   AS INTEGER) AS score_zh
          FROM documents)
        SELECT doc_id, score_en, score_de, score_es, score_fr, score_zh,
               CASE
                 WHEN score_zh > 0 THEN 'zh'
                 WHEN score_en >= score_de AND score_en >= score_es
                      AND score_en >= score_fr THEN 'en'
                 WHEN score_de >= score_es AND score_de >= score_fr THEN 'de'
                 WHEN score_es >= score_fr THEN 'es'
                 ELSE 'fr' END AS pred_lang
        FROM scored ORDER BY doc_id""")),

    // ------------------------------------------------------------------
    // Quality scoring: length/punctuation/stopword signals combined
    // with fixed weights (identical operand order in both engines so
    // the doubles are bit-identical).
    "txt_quality" -> Q(
      (s, dir) => {
        GraftFunctions.register(s)
        Tables.documents(s, dir)
          .withColumn("n_tokens", size(split(col("text"), " ")))
          .withColumn("sum_tok_len",
            expr("aggregate(split(text, ' '), 0, (a, t) -> a + length(t))"))
          .withColumn("n_punct",
            length(col("text")) - length(regexp_replace(col("text"), "[^a-z0-9 ]", "")))
          .withColumn("n_stop", expr(scoreExpr("en")))
          .withColumn("avg_token_len",
            col("sum_tok_len").cast("double") / col("n_tokens"))
          .withColumn("stop_ratio", col("n_stop").cast("double") / col("n_tokens"))
          .withColumn("punct_ratio",
            col("n_punct").cast("double") / length(col("text")))
          .withColumn("quality_score",
            col("stop_ratio") * 0.5
              + least(col("n_tokens"), lit(100)).cast("double") / 100.0 * 0.3
              + (lit(1.0) - col("punct_ratio")) * 0.2)
          .select("doc_id", "n_tokens", "avg_token_len", "stop_ratio",
            "punct_ratio", "quality_score")
          .orderBy("doc_id")
      },
      Some(s"""
        WITH feat AS (
          SELECT doc_id,
                 CAST(len(string_split(text, ' ')) AS INTEGER) AS n_tokens,
                 CAST(list_sum(list_transform(string_split(text, ' '),
                   t -> length(t))) AS INTEGER) AS sum_tok_len,
                 CAST(length(text) - length(regexp_replace(text, '[^a-z0-9 ]', '', 'g'))
                   AS INTEGER) AS n_punct,
                 ${scoreSql("en")} AS n_stop,
                 CAST(length(text) AS INTEGER) AS n_chars
          FROM documents)
        SELECT doc_id, n_tokens,
               CAST(sum_tok_len AS DOUBLE) / n_tokens AS avg_token_len,
               CAST(n_stop AS DOUBLE) / n_tokens AS stop_ratio,
               CAST(n_punct AS DOUBLE) / n_chars AS punct_ratio,
               (CAST(n_stop AS DOUBLE) / n_tokens) * 0.5
                 + CAST(least(n_tokens, 100) AS DOUBLE) / 100.0 * 0.3
                 + (1.0 - CAST(n_punct AS DOUBLE) / n_chars) * 0.2
                 AS quality_score
        FROM feat ORDER BY doc_id""")),

    // ------------------------------------------------------------------
    // Token counting: whitespace tokens + a BPE-ish regex token count
    // (letter runs / digit runs / single punctuation marks).
    "txt_token_count" -> Q(
      (s, dir) => {
        Tables.documents(s, dir)
          .select(col("doc_id"),
            size(split(col("text"), " ")).as("n_ws_tokens"),
            regexp_count(col("text"), lit("[a-z]+|[0-9]+|[^a-z0-9 ]"))
              .as("n_bpe_tokens"),
            length(col("text")).as("len_chars"))
          .orderBy("doc_id")
      },
      Some("""
        SELECT doc_id,
               CAST(len(string_split(text, ' ')) AS INTEGER) AS n_ws_tokens,
               CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]'))
                 AS INTEGER) AS n_bpe_tokens,
               CAST(length(text) AS INTEGER) AS len_chars
        FROM documents ORDER BY doc_id""")),

    // ------------------------------------------------------------------
    // Rolling polynomial fingerprint via the native codegen'd
    // PolyHash64 expression. The hash is pure wrap-around integer
    // arithmetic over UTF-8 bytes, so DuckDB replays it exactly: a
    // per-char list_reduce in HUGEINT mod 2^64, re-signed at the end.
    // (documents.text is ASCII at every SF, so unicode(c) == the
    // byte.) PolyHashSpec additionally pins the expression against
    // the reference implementation including non-ASCII inputs.
    "txt_fingerprint" -> Q(
      (s, dir) => {
        GraftFunctions.register(s)
        Tables.documents(s, dir)
          .select(col("doc_id"), expr("graft_polyhash(text)").as("fingerprint"))
          .orderBy("doc_id")
      },
      Some("""
        SELECT doc_id,
          CAST(CASE WHEN h >= 9223372036854775808 THEN
                 h - 18446744073709551616 ELSE h END AS BIGINT)
            AS fingerprint
        FROM (
          SELECT doc_id,
            list_reduce(
              list_prepend(CAST(0 AS HUGEINT),
                [CAST(unicode(c) AS HUGEINT)
                 for c in string_split(text, '')]),
              (acc, x) -> (acc * 1000003 + x)
                % CAST(18446744073709551616 AS HUGEINT)) AS h
          FROM documents)
        ORDER BY doc_id""")),

    // ------------------------------------------------------------------
    // TF-IDF keyword extraction: top-3 terms per doc by tf * (N/df).
    // The raw-ratio idf (no log) keeps the score a product/quotient of
    // exact integers — bit-identical across engines, same ranking
    // monotonicity as log-idf.
    //
    // Scale shape (re-derived at the generated sf10 decade, where the
    // first formulation measured 22.5x for the 10x step): df is NOT a
    // second distinct pass over the raw tokens — tf's group keys ARE
    // the distinct (doc, term) pairs, so df aggregates tf itself. The
    // tf<->df join is Zipf-skewed BY NATURE on the tf side (a stopword
    // row count per term == its df =~ nDocs), so it takes the same
    // HEAD/TAIL split as txt_unigram_logprob: the top-1024 terms by df
    // join broadcast (they carry the Zipf mass, zero shuffle), the
    // tail shuffle-joins but every tail key's tf-side group is <= the
    // head minimum — skew-free by construction. A real vocabulary
    // outgrows one broadcast; its head never does. The optimizer
    // additionally pushes the head-exclusion LeftAnti BELOW the tail's
    // (doc, term) aggregation (term is a grouping key), so head tokens
    // are dropped before the tail aggregates — each branch re-scans
    // the corpus with map-side partial aggs rather than caching tf,
    // the right trade at 100 TB where a scan is cheaper than a
    // persisted shuffle's disk footprint. Measured 73.6 -> 17.3 s at
    // sf10; decade ratio 22.5x -> 6.1x.
    "txt_tfidf" -> Q(
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val toks = Tables.documents(s, dir)
          .select(col("doc_id"),
            explode(split(Dedup.normText(col("text")), " ")).as("term"))
        val n = Tables.documents(s, dir).count()
        val tf = toks.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
        val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
        val head = df.orderBy(col("df").desc, col("term").asc).limit(1024)
        val joined = tf.join(broadcast(head), Seq("term"))
          .unionByName(
            tf.join(broadcast(head.select("term")), Seq("term"), "left_anti")
              .join(df, Seq("term")))
        val w = Window.partitionBy("doc_id")
          .orderBy(col("score").desc, col("term").asc)
        joined
          .withColumn("score",
            col("tf").cast("double") * (lit(n.toDouble) / col("df")))
          .withColumn("rank", row_number().over(w))
          .filter(col("rank") <= 3)
          .select(col("doc_id"), col("rank"), col("term"), col("tf"), col("df"))
          .orderBy("doc_id", "rank")
      },
      Some("""
        WITH t AS (SELECT doc_id,
               unnest(string_split(regexp_replace(trim(lower(text)),
                 ' +', ' ', 'g'), ' ')) AS term
             FROM documents),
        tf AS (SELECT doc_id, term, count(*) AS tf FROM t GROUP BY 1, 2),
        df AS (SELECT term, count(DISTINCT doc_id) AS df FROM t GROUP BY 1),
        nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM documents),
        scored AS (SELECT tf.doc_id, tf.term, tf.tf, df.df,
               CAST(tf.tf AS DOUBLE) * ((SELECT n FROM nn) / df.df) AS score
             FROM tf JOIN df USING (term)),
        ranked AS (SELECT doc_id, term, tf, df,
               CAST(row_number() OVER (PARTITION BY doc_id
                 ORDER BY score DESC, term ASC) AS INTEGER) AS rank
             FROM scored)
        SELECT doc_id, rank, term, tf, df FROM ranked
        WHERE rank <= 3 ORDER BY doc_id, rank""")),

    // ------------------------------------------------------------------
    // Corpus bigram frequency (the n-gram statistics pass a training
    // pipeline runs for contamination checks and tokenizer prep): the
    // per-doc bigram build is a narrow slice/zip/explode — no data
    // moves until the single count aggregation, whose map-side
    // partials shrink each partition to its distinct bigrams before
    // the shuffle. slice() handles one-word docs (empty result)
    // without a size guard.
    "txt_ngram_freq" -> Q(
      (s, dir) => {
        val toks = split(Dedup.normText(col("text")), " ")
        Tables.documents(s, dir)
          .select(explode(zip_with(
            slice(toks, lit(1), greatest(size(toks) - 1, lit(0))),
            slice(toks, lit(2), greatest(size(toks) - 1, lit(0))),
            (a, b) => concat(a, lit(" "), b))).as("bigram"))
          .groupBy("bigram").agg(count(lit(1)).as("n"))
          .orderBy(col("n").desc, col("bigram").asc)
          .limit(20)
      },
      Some("""
        SELECT bigram, count(*) AS n FROM (
          SELECT unnest(toks[1:len(toks)-1]) || ' ' || unnest(toks[2:len(toks)])
                 AS bigram
          FROM (SELECT string_split(regexp_replace(trim(lower(text)),
                  ' +', ' ', 'g'), ' ') AS toks
                FROM documents) t)
        GROUP BY bigram ORDER BY n DESC, bigram LIMIT 20""")),

    // ------------------------------------------------------------------
    // PII scrubbing (training-data redaction): emails and phone
    // numbers replaced with typed placeholders. The PII is
    // synthesized deterministically from customer rows so the oracle
    // can verify the SCRUB — both engines run the same regexes over
    // the same constructed text; a pass proves every planted email
    // and phone was caught. Pure per-row regex work, no shuffle.
    "txt_pii_scrub" -> Q(
      (s, dir) => {
        val synth = concat(lit("contact "), col("c_name"),
          lit(" at user"), col("c_custkey"),
          lit("@mail.example.com or +1-555-"),
          lpad(pmod(col("c_custkey"), lit(10000)).cast("string"), 4, "0"))
        Tables.customer(s, dir)
          .select(col("c_custkey"), synth.as("raw"))
          .withColumn("scrubbed",
            regexp_replace(
              regexp_replace(col("raw"),
                "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+", "<EMAIL>"),
              "\\+1-555-[0-9]{4}", "<PHONE>"))
          .orderBy("c_custkey")
      },
      Some("""
        SELECT c_custkey, raw,
               regexp_replace(regexp_replace(raw,
                 '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+', '<EMAIL>', 'g'),
                 '\+1-555-[0-9]{4}', '<PHONE>', 'g') AS scrubbed
        FROM (SELECT c_custkey,
                'contact ' || c_name || ' at user' || c_custkey ||
                '@mail.example.com or +1-555-' ||
                lpad(CAST(c_custkey % 10000 AS VARCHAR), 4, '0') AS raw
              FROM customer)
        ORDER BY c_custkey""")),

    // ------------------------------------------------------------------
    // Stratified sampling for dataset mixing (per-source quotas, the
    // knob a training pipeline turns to rebalance corpora):
    // deterministic id-hash bucketing keeps the sample reproducible
    // across runs and engines, and the emitted weight column is the
    // inverse sampling rate for unbiased downstream statistics. Pure
    // filter — no shuffle, fully pushed to the scan.
    "txt_stratified_sample" -> Q(
      (s, dir) => {
        val rate = when(col("source") === "src0", 50)
          .when(col("source") === "src1", 20).otherwise(10)
        Tables.documents(s, dir)
          .withColumn("rate", rate)
          .filter(pmod(col("doc_id"), lit(100)) < col("rate"))
          .select(col("doc_id"), col("source"),
            (lit(100.0) / col("rate")).as("weight"))
          .orderBy("doc_id")
      },
      Some("""
        SELECT doc_id, source, CAST(100 AS DOUBLE) / rate AS weight
        FROM (SELECT doc_id, source,
                CASE WHEN source = 'src0' THEN 50
                     WHEN source = 'src1' THEN 20 ELSE 10 END AS rate
              FROM documents)
        WHERE doc_id % 100 < rate ORDER BY doc_id""")),

    // ------------------------------------------------------------------
    // Benchmark contamination check (the n-gram-collision scan run
    // before training: does any training doc share a word 4-gram with
    // the eval set?). The eval side is a small deterministic holdout
    // (doc_id % 11), so its exploded shingle index BROADCASTS — the
    // corpus side streams map-side with no shuffle until the tiny
    // per-pair count agg. Shingles are the 64-bit hashed k-grams of
    // docShingles; the oracle intersects the equivalent string
    // shingles (counts agree — a 64-bit collision is negligible).
    "txt_contamination" -> Q(
      (s, dir) => {
        graft.functions.GraftFunctions.register(s)
        val sh = Dedup.docShingles(s, dir, k = 4)
        val bench = sh.filter(col("doc_id") % 11 === 0)
          .select(col("doc_id").as("bench_id"), explode(col("shingles")).as("sh"))
        val corpus = sh.filter(col("doc_id") % 11 =!= 0)
          .select(col("doc_id"), explode(col("shingles")).as("sh"))
        corpus.join(broadcast(bench), Seq("sh"))
          .groupBy("doc_id", "bench_id")
          .agg(count(lit(1)).as("n_shared"))
          .orderBy("doc_id", "bench_id")
      },
      Some("""
        WITH t AS (SELECT doc_id,
                     string_split(regexp_replace(trim(lower(text)),
                       ' +', ' ', 'g'), ' ') toks
                   FROM documents),
        sh AS (SELECT doc_id,
                 list_distinct([array_to_string(toks[i:i+3], ' ')
                                for i in range(1, len(toks) - 2)]) shingles
               FROM t WHERE len(toks) >= 4),
        b AS (SELECT * FROM sh WHERE doc_id % 11 = 0),
        c AS (SELECT * FROM sh WHERE doc_id % 11 <> 0)
        SELECT c.doc_id, b.doc_id AS bench_id,
               CAST(len(list_intersect(c.shingles, b.shingles)) AS BIGINT)
                 AS n_shared
        FROM c JOIN b ON len(list_intersect(c.shingles, b.shingles)) >= 1
        ORDER BY c.doc_id, bench_id""")),

    // ------------------------------------------------------------------
    // Repetition-based quality filters (the Gopher-rules shape): the
    // share of tokens taken by the single most frequent word, and the
    // fraction of word bigrams that are repeats. Both are per-document
    // aggregations over one explode — the shuffles are keyed by
    // doc_id only, so at corpus scale this is a linear map + local
    // agg pass (a doc's tokens always hash to one reducer). Divisions
    // are single IEEE ops on identical integers in both engines.
    "txt_repetition" -> Q(
      (s, dir) => {
        val docs = Tables.documents(s, dir)
          .select(col("doc_id"), split(col("text"), " ").as("ws"))
          .withColumn("n", size(col("ws")))
          .filter(col("n") >= 2)
        val topWord = docs
          .select(col("doc_id"), col("n"), explode(col("ws")).as("w"))
          .groupBy("doc_id", "n", "w").agg(count(lit(1)).as("c"))
          .groupBy("doc_id", "n").agg(max(col("c")).as("top_c"))
        val bigrams = docs
          .select(col("doc_id"), col("n"),
            explode(expr(
              "transform(slice(ws, 1, n - 1), (w, i) -> concat(w, ' ', ws[i + 1]))"))
              .as("bg"))
          .groupBy("doc_id", "n")
          .agg(countDistinct(col("bg")).as("distinct_bg"))
        topWord.join(bigrams, Seq("doc_id", "n"))
          .select(col("doc_id"), col("n").as("n_words"),
            (col("top_c").cast("double") / col("n")).as("top_word_frac"),
            ((col("n") - 1 - col("distinct_bg")).cast("double") / (col("n") - 1))
              .as("dup_bigram_frac"))
          .orderBy("doc_id")
      },
      Some("""
        WITH d AS (SELECT doc_id, string_split(text, ' ') AS ws,
                          len(string_split(text, ' ')) AS n
                   FROM documents),
        dd AS (SELECT * FROM d WHERE n >= 2),
        tw AS (SELECT doc_id, n, max(c) AS top_c
               FROM (SELECT doc_id, n, w, count(*) AS c
                     FROM (SELECT doc_id, n, unnest(ws) AS w FROM dd)
                     GROUP BY 1, 2, 3)
               GROUP BY 1, 2),
        bg AS (SELECT doc_id, n, count(DISTINCT b) AS distinct_bg
               FROM (SELECT doc_id, n,
                       unnest([ws[i] || ' ' || ws[i + 1]
                               for i in range(1, n)]) AS b
                     FROM dd)
               GROUP BY 1, 2)
        SELECT tw.doc_id, tw.n AS n_words,
               CAST(top_c AS DOUBLE) / tw.n AS top_word_frac,
               CAST(tw.n - 1 - distinct_bg AS DOUBLE) / (tw.n - 1)
                 AS dup_bigram_frac
        FROM tw JOIN bg ON tw.doc_id = bg.doc_id AND tw.n = bg.n
        ORDER BY tw.doc_id""")),

    // ------------------------------------------------------------------
    // Cross-document duplicate-chunk scan (the substring-level
    // companion to whole-doc dedup): split every document into
    // non-overlapping 5-word chunks, mark chunks that occur in more
    // than one document, and score each document by its duplicated-
    // chunk fraction — the standard "boilerplate / copypasta" signal
    // a corpus-cleaning pipeline filters on. Scale shape: one explode
    // (corpus-linear) + two hash aggs keyed by chunk/doc; "appears in
    // >1 doc" is min(doc)<max(doc), NOT count(distinct) — constant
    // state per chunk instead of a per-chunk id set. At 100 TB the
    // chunk strings would be xxhash64'd before the shuffle; the
    // string key keeps the oracle comparable here.
    "txt_chunk_dedup" -> Q(
      (s, dir) => {
        val k = 5
        val toks = split(regexp_replace(trim(lower(col("text"))), " +", " "), " ")
        val chunks = Tables.documents(s, dir)
          .select(col("doc_id"), toks.as("toks"))
          .withColumn("nc", (size(col("toks")) / k).cast("int"))
          .filter(col("nc") >= 1)
          .select(col("doc_id"), explode(expr(
            s"transform(sequence(0, nc - 1), i -> concat_ws(' ', slice(toks, i * $k + 1, $k)))"))
            .as("chunk"))
        val freq = chunks.groupBy("chunk")
          .agg((min(col("doc_id")) < max(col("doc_id"))).as("dup"))
        chunks.join(freq, Seq("chunk"))
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_chunks"),
            count(when(col("dup"), 1)).as("n_dup_chunks"))
          .withColumn("dup_frac", col("n_dup_chunks") / col("n_chunks"))
          .orderBy("doc_id")
      },
      Some("""
        WITH t AS (SELECT doc_id,
               string_split(regexp_replace(trim(lower(text)), ' +', ' ', 'g'), ' ')
                 AS toks
             FROM documents),
        i AS (SELECT doc_id, toks, unnest(range(len(toks) // 5)) AS i
              FROM t WHERE len(toks) // 5 >= 1),
        c AS (SELECT doc_id,
                array_to_string(toks[(5 * i + 1):(5 * i + 5)], ' ') AS chunk
              FROM i),
        g AS (SELECT chunk, min(doc_id) < max(doc_id) AS dup
              FROM c GROUP BY chunk)
        SELECT doc_id, count(*) AS n_chunks,
               count(*) FILTER (dup) AS n_dup_chunks,
               count(*) FILTER (dup) / count(*) AS dup_frac
        FROM c JOIN g USING (chunk)
        GROUP BY doc_id ORDER BY doc_id""")),

    // ------------------------------------------------------------------
    // URL canonicalization + dedup (the crawl-cleaning step before
    // any by-URL grouping): case-fold scheme/host, strip tracking
    // params and fragments, keep the identifying param — then count
    // how many raw variants collapse into each canonical URL. The
    // raw URLs are constructed with deterministic noise (mixed-case
    // host, utm_* params, fragments) from part rows, and the ORACLE
    // rebuilds the canonical form from the same raw fields, so a
    // pass proves the parse+normalize actually inverts the noise.
    // Per-row expression work + one hash agg on the canonical key.
    "txt_url_canon" -> Q(
      (s, dir) => {
        val id = pmod(col("p_partkey"), lit(500)).cast("string")
        val raw = concat(lit("HTTPS://"),
          when(pmod(col("p_partkey"), lit(2)) === 0,
            lit("Shop.Example.COM")).otherwise(lit("shop.example.com")),
          lit("/item/"), id,
          lit("?utm_source=ads&id="), id,
          when(pmod(col("p_partkey"), lit(3)) === 0,
            lit("&utm_campaign=x")).otherwise(lit("")),
          lit("#sec"), col("p_partkey").cast("string"))
        Tables.part(s, dir)
          .select(col("p_partkey"), raw.as("url"))
          .withColumn("canon", concat(lit("https://"),
            lower(parse_url(col("url"), lit("HOST"))),
            parse_url(col("url"), lit("PATH")),
            lit("?id="), parse_url(col("url"), lit("QUERY"), lit("id"))))
          .groupBy("canon")
          .agg(count(lit(1)).as("n_variants"),
            min(col("p_partkey")).as("first_key"))
          .orderBy("canon")
      },
      Some("""
        SELECT 'https://shop.example.com/item/'
                 || CAST(p_partkey % 500 AS VARCHAR)
                 || '?id=' || CAST(p_partkey % 500 AS VARCHAR) AS canon,
               count(*) AS n_variants, min(p_partkey) AS first_key
        FROM part GROUP BY 1 ORDER BY canon""")),

    // ------------------------------------------------------------------
    // Winnowing fingerprints (Schleimer/Wilkerson/Aiken 2003 — the
    // MOSS algorithm): hash every word 3-gram, slide a window of 4
    // hashes, keep the window minimum (rightmost on ties); the
    // guarantee is any shared run of >= w+k-1 tokens between two
    // documents shares a fingerprint, at ~1/w the storage of all
    // grams. The robust local fingerprinting behind plagiarism /
    // contamination detection at corpus scale.
    //
    // All window-function work partitioned by doc — one shuffle on
    // doc_id, no cross-doc state. Cross-engine exactness: the gram
    // hash is md5 (identical in both engines) and the rightmost-tie
    // argmin is encoded into ONE sortable string — hash then
    // zero-padded (10^6 - pos) — so a plain min() implements the
    // winnowing selection rule in Spark and DuckDB alike.
    "txt_winnowing" -> Q(
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val wOrd = Window.partitionBy("doc_id").orderBy("pos")
        val toks = Tables.documents(s, dir)
          .select(col("doc_id"),
            posexplode(split(Dedup.normText(col("text")), " ")).as(Seq("pos", "t")))
        val grams = toks
          .withColumn("t1", lead("t", 1).over(wOrd))
          .withColumn("t2", lead("t", 2).over(wOrd))
          .filter(col("t2").isNotNull)
          .withColumn("h", md5(concat_ws(" ", col("t"), col("t1"), col("t2"))))
          .withColumn("k", concat(col("h"),
            lpad((lit(1000000) - col("pos")).cast("string"), 7, "0")))
          .withColumn("rn", row_number().over(wOrd))
        val sel = grams
          .withColumn("sk", min("k").over(wOrd.rowsBetween(-3, 0)))
          .filter(col("rn") >= 4)
          .select(col("doc_id"), substring(col("sk"), 1, 32).as("fp"),
            (lit(1000000) - substring(col("sk"), 33, 7).cast("int")).as("fpos"))
          .distinct()
        sel.groupBy("doc_id")
          .agg(count(lit(1)).as("n_fps"),
            concat_ws(",",
              transform(array_sort(collect_list(struct(col("fpos"), col("fp")))),
                x => concat(x("fp"), lit(":"), x("fpos")))).as("fingerprints"))
          .orderBy("doc_id")
      },
      Some("""
        WITH toks AS (
          SELECT doc_id,
                 unnest(string_split(regexp_replace(trim(lower(text)),
                   ' +', ' ', 'g'), ' ')) AS t,
                 generate_subscripts(string_split(regexp_replace(trim(lower(text)),
                   ' +', ' ', 'g'), ' '), 1) - 1 AS pos
          FROM documents),
        g0 AS (
          SELECT doc_id, pos,
                 md5(t || ' ' || lead(t, 1) OVER w || ' '
                       || lead(t, 2) OVER w) AS h
          FROM toks WINDOW w AS (PARTITION BY doc_id ORDER BY pos)),
        g AS (
          SELECT doc_id, pos, h,
                 h || lpad(CAST(1000000 - pos AS VARCHAR), 7, '0') AS k,
                 row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS rn
          FROM g0 WHERE h IS NOT NULL),
        sel AS (
          SELECT DISTINCT doc_id, substr(sk, 1, 32) AS fp,
                 1000000 - CAST(substr(sk, 33, 7) AS INTEGER) AS fpos
          FROM (SELECT doc_id, rn,
                       min(k) OVER (PARTITION BY doc_id ORDER BY rn
                         ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS sk
                FROM g) WHERE rn >= 4)
        SELECT doc_id, count(*) AS n_fps,
               string_agg(fp || ':' || fpos, ',' ORDER BY fpos, fp)
                 AS fingerprints
        FROM sel GROUP BY doc_id ORDER BY doc_id""")),

    // ------------------------------------------------------------------
    // Training-mixture sampling: each source gets a target rate and
    // every document keeps/drops by a DETERMINISTIC keyed-hash coin —
    // substr(md5, 1, 8) compared against the rate's hex threshold, so
    // the identical subset falls out on any engine, any run, any
    // cluster layout (rand() would give none of those). Pure per-row
    // expression work + one count aggregation; rates here derive from
    // the source id (src<i> -> (i%4+1)/4) standing in for a mixture
    // config table.
    "txt_mixture_sample" -> Q(
      (s, dir) => {
        val idx = substring(col("source"), 4, 10).cast("int")
        val thr = when(idx % 4 === 0, "40000000")
          .when(idx % 4 === 1, "80000000")
          .when(idx % 4 === 2, "c0000000")
          .otherwise("g") // every md5 hex digit < 'g': rate 1.0
        val kept = substring(md5(concat(col("source"), lit(":"), col("doc_id"))),
          1, 8) < thr
        Tables.documents(s, dir)
          .withColumn("kept", kept.cast("int"))
          .groupBy("source")
          .agg(count(lit(1)).as("n_total"),
            sum(col("kept")).cast("long").as("n_kept"),
            min(when(col("kept") === 1, col("doc_id"))).as("first_kept"),
            sum(when(col("kept") === 1, col("n_chars"))).cast("long")
              .as("kept_chars"))
          .orderBy("source")
      },
      Some("""
        WITH k AS (
          SELECT source, doc_id, n_chars,
                 CASE WHEN substr(md5(source || ':' || doc_id), 1, 8) <
                   (CASE CAST(substr(source, 4) AS INTEGER) % 4
                      WHEN 0 THEN '40000000' WHEN 1 THEN '80000000'
                      WHEN 2 THEN 'c0000000' ELSE 'g' END)
                 THEN 1 ELSE 0 END AS kept
          FROM documents)
        SELECT source, count(*) AS n_total,
               CAST(sum(kept) AS BIGINT) AS n_kept,
               min(CASE WHEN kept = 1 THEN doc_id END) AS first_kept,
               CAST(sum(CASE WHEN kept = 1 THEN n_chars END) AS BIGINT)
                 AS kept_chars
        FROM k GROUP BY source ORDER BY source""")),

    // ------------------------------------------------------------------
    // Sequence packing for training: documents are hash-sharded, and
    // within each shard a running token sum assigns each document to
    // bin floor((cumsum - tokens) / budget) — streaming packing where
    // a bin may overflow the budget by at most one document (the
    // padding-free packing compromise: no driver-side bin packing, no
    // second pass, one window per shard). Output is the bin manifest.
    "txt_pack_sequences" -> Q(
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val budget = 256
        val w = Window.partitionBy("shard").orderBy("doc_id")
        Tables.documents(s, dir)
          .select(col("doc_id"), pmod(col("doc_id"), lit(8)).as("shard"),
            size(split(Dedup.normText(col("text")), " ")).as("toks"))
          .withColumn("cum", sum(col("toks")).over(w))
          .withColumn("bin", floor((col("cum") - col("toks")) / budget))
          .groupBy("shard", "bin")
          .agg(count(lit(1)).as("n_docs"),
            sum(col("toks")).cast("long").as("fill_tokens"),
            min(col("doc_id")).as("first_doc"),
            max(col("doc_id")).as("last_doc"))
          .orderBy("shard", "bin")
      },
      Some("""
        WITH t AS (
          SELECT doc_id, doc_id % 8 AS shard,
                 len(string_split(regexp_replace(trim(lower(text)),
                   ' +', ' ', 'g'), ' ')) AS toks
          FROM documents),
        c AS (
          SELECT doc_id, shard, toks,
                 sum(toks) OVER (PARTITION BY shard ORDER BY doc_id) AS cum
          FROM t)
        SELECT shard, CAST((cum - toks) // 256 AS BIGINT) AS bin, count(*) AS n_docs,
               CAST(sum(toks) AS BIGINT) AS fill_tokens,
               min(doc_id) AS first_doc, max(doc_id) AS last_doc
        FROM c GROUP BY 1, 2 ORDER BY shard, bin""")),

    // ------------------------------------------------------------------
    // The full pretraining-corpus pipeline in one dataflow — what a
    // user of this library actually ships: mixture sampling (keyed-
    // hash coins) -> quality gate (min token count) -> exact dedup
    // (first doc per normalized-text hash) -> eval-set decontamination
    // (drop docs sharing any 4-gram with the held-out eval slice) ->
    // token-budget sequence packing -> shard/bin manifest. Every
    // stage is deterministic and SQL-expressible, so the WHOLE chain
    // is one cell-exact oracle — end-to-end, not per-stage. Shuffles:
    // dedup keys on the text hash, decontamination on the shingle,
    // packing on the shard — all natural keys; the holdout shingle
    // set broadcasts.
    "pipeline_pretrain_corpus" -> Q(
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        def shingles(tl: org.apache.spark.sql.Column) =
          array_distinct(transform(sequence(lit(1), size(tl) - 3),
            i => concat_ws(" ", slice(tl, i, lit(4)))))
        val norm = Tables.documents(s, dir)
          .select(col("doc_id"), col("source"),
            Dedup.normText(col("text")).as("nt"))
        val idx = substring(col("source"), 4, 10).cast("int")
        val thr = when(idx % 4 === 0, "40000000")
          .when(idx % 4 === 1, "80000000")
          .when(idx % 4 === 2, "c0000000").otherwise("g")
        val mix = norm.filter(
          substring(md5(concat(col("source"), lit(":"), col("doc_id"))), 1, 8) < thr)
        val qual = mix.withColumn("tl", split(col("nt"), " "))
          .withColumn("toks", size(col("tl")))
          .filter(col("toks") >= 30)
        val ded = qual.withColumn("keeper",
            min("doc_id").over(Window.partitionBy(md5(col("nt")))))
          .filter(col("doc_id") === col("keeper"))
        val holdSh = norm.filter(pmod(col("doc_id"), lit(11)) === 0)
          .withColumn("tl", split(col("nt"), " "))
          .filter(size(col("tl")) >= 4)
          .select(explode(shingles(col("tl"))).as("sh")).distinct()
        val corpus = ded.filter(pmod(col("doc_id"), lit(11)) =!= 0)
        val bad = corpus
          .select(col("doc_id"), explode(shingles(col("tl"))).as("sh"))
          .join(broadcast(holdSh), Seq("sh"))
          .select("doc_id").distinct()
        val clean = corpus.join(bad, Seq("doc_id"), "left_anti")
        val w = Window.partitionBy("shard").orderBy("doc_id")
        clean.select(col("doc_id"), col("toks"),
            pmod(col("doc_id"), lit(4)).as("shard"))
          .withColumn("cum", sum(col("toks")).over(w))
          .withColumn("bin", floor((col("cum") - col("toks")) / 512))
          .groupBy("shard", "bin")
          .agg(count(lit(1)).as("n_docs"),
            sum(col("toks")).cast("long").as("fill_tokens"),
            min(col("doc_id")).as("first_doc"),
            max(col("doc_id")).as("last_doc"))
          .orderBy("shard", "bin")
      },
      Some("""
        WITH norm AS (
          SELECT doc_id, source,
                 regexp_replace(trim(lower(text)), ' +', ' ', 'g') AS nt
          FROM documents),
        mix AS (
          SELECT * FROM norm
          WHERE substr(md5(source || ':' || doc_id), 1, 8) <
            (CASE CAST(substr(source, 4) AS INTEGER) % 4
               WHEN 0 THEN '40000000' WHEN 1 THEN '80000000'
               WHEN 2 THEN 'c0000000' ELSE 'g' END)),
        qual AS (
          SELECT doc_id, nt, string_split(nt, ' ') AS tl,
                 len(string_split(nt, ' ')) AS toks
          FROM mix WHERE len(string_split(nt, ' ')) >= 30),
        ded AS (
          SELECT doc_id, tl, toks FROM (
            SELECT *, min(doc_id) OVER (PARTITION BY md5(nt)) AS keeper
            FROM qual) WHERE doc_id = keeper),
        hold AS (
          SELECT DISTINCT unnest(list_distinct(
            [array_to_string(tl[i:i+3], ' ')
             for i in range(1, len(tl) - 2)])) AS sh
          FROM (SELECT string_split(nt, ' ') AS tl FROM norm
                WHERE doc_id % 11 = 0 AND len(string_split(nt, ' ')) >= 4)),
        corpus AS (SELECT * FROM ded WHERE doc_id % 11 <> 0),
        bad AS (
          SELECT DISTINCT doc_id FROM (
            SELECT doc_id, unnest(list_distinct(
              [array_to_string(tl[i:i+3], ' ')
               for i in range(1, len(tl) - 2)])) AS sh
            FROM corpus) e JOIN hold USING (sh)),
        clean AS (
          SELECT doc_id, toks FROM corpus
          WHERE doc_id NOT IN (SELECT doc_id FROM bad)),
        packed AS (
          SELECT doc_id, toks, doc_id % 4 AS shard,
                 sum(toks) OVER (PARTITION BY doc_id % 4
                   ORDER BY doc_id) AS cum
          FROM clean)
        SELECT shard, CAST((cum - toks) // 512 AS BIGINT) AS bin,
               count(*) AS n_docs, CAST(sum(toks) AS BIGINT) AS fill_tokens,
               min(doc_id) AS first_doc, max(doc_id) AS last_doc
        FROM packed GROUP BY 1, 2 ORDER BY shard, bin"""))
  )
}
