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

  /** Cosine similarity of two float-array columns, computed in double.
    * Pure per-row expression work — no UDF, no shuffle.
    */
  def cosineExpr(a: Column, b: Column): Column = {
    def dot(x: Column, y: Column) =
      aggregate(zip_with(x, y, (p, q) => p.cast("double") * q.cast("double")),
        lit(0.0), (acc, v) => acc + v)
    dot(a, b) / sqrt(dot(a, a) * dot(b, b))
  }

  /** The fixed probe set: the first `n` vec_ids. */
  def queryVectors(s: SparkSession, dir: String, n: Int = 5): DataFrame =
    Tables.embeddings(s, dir).filter(col("vec_id") < n)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))

  /** Exact top-k neighbors per query by (cosine desc, vec_id asc). */
  def bruteForceTopK(s: SparkSession, dir: String, k: Int = 10): DataFrame = {
    val corpus = Tables.embeddings(s, dir)
      .select(col("vec_id"), col("embedding"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("vec_id").asc)
    broadcast(queryVectors(s, dir)).crossJoin(corpus)
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
    // IVF (KMeans-cell) approximate top-k: assign every vector to its
    // nearest of 16 centroids, probe the 4 cells nearest each query,
    // exact-rerank inside them. Approximate -> rows-only for the
    // driver; AnnSpec measures recall@10 against the brute force.
    "ann_ivf_topk" -> Q(
      (s, dir) => ivfTopK(s, dir),
      None)
  )

  def ivfTopK(s: SparkSession, dir: String, k: Int = 10,
      cells: Int = 16, nprobe: Int = 4): DataFrame = {
    val emb = Tables.embeddings(s, dir)
      .select(col("vec_id"), col("embedding"),
        array_to_vector(col("embedding")).as("features"))
    // Training fits on the driver here; at real scale train on
    // .sample(fraction) — cell quality degrades gracefully.
    val model = new KMeans().setK(cells).setSeed(42L).setMaxIter(5)
      .fit(emb.select("features"))
    val assigned = model.transform(emb)
      .select(col("vec_id"), col("embedding"), col("prediction").as("cell"))
    val centroids = model.clusterCenters.map(_.toArray)

    // nprobe nearest cells per query, computed driver-side from the
    // (tiny) query set x (tiny) centroid set.
    val queries = queryVectors(s, dir).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val probes = for {
      (qid, qv) <- queries.toSeq
      cell <- centroids.zipWithIndex
        .map { case (c, i) =>
          val d = c.zip(qv).map { case (x, y) => val e = x - y; e * e }.sum
          (i, d)
        }
        .sortBy(_._2).take(nprobe).map(_._1)
    } yield (qid, cell)
    import s.implicits._
    val probeDf = probes.toDF("query_id", "cell")

    val w = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("vec_id").asc)
    broadcast(probeDf.join(queryVectors(s, dir), Seq("query_id")))
      .join(assigned, Seq("cell"))
      .filter(col("query_id") =!= col("vec_id"))
      .withColumn("cos", cosineExpr(col("qv"), col("embedding")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("vec_id").as("neighbor_id"))
      .orderBy("query_id", "rank")
  }
}
