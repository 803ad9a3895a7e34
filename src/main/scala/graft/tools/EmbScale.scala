package graft.tools

import org.apache.spark.sql.SparkSession

/** Measurability probe for the embedding near-dup family.
  *
  * The r7 scaling ladder could not MEASURE dedup_embedding_ivf: on the
  * shipped 64-dim corpus construction, random-pair cosine mass near the
  * 0.45 threshold makes the TRUE pair set grow ~n² (88x measured across
  * one decade), so the operator's wall-time ratio is output-bound — a
  * corpus artifact, not an operator property (BENCH_SCALING_r7.json
  * adjudication). GenData's dim!=64 construction plants explicit
  * eps-perturbed clones (~0.5% of rows) instead, so true pairs grow ~n
  * and the decade ratio becomes a real measurement.
  *
  * For each corpus dir given, this runs the exact IVF pair finder
  * end-to-end (same code path as the dedup_embedding_ivf registry row)
  * best-of-2 and reports rows, true pairs, pair density per row
  * (pairs/n — flat across SFs iff the corpus is measurable), and
  * steady-state seconds.
  *
  * Usage: runMain graft.tools.EmbScale <out.json> <sf>=<dir> ...
  */
object EmbScale {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: EmbScale <out.json> <sf>=<dir> ...")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.register(spark)

    val results = args.drop(1).toSeq.map { arg =>
      val Array(sf, dir) = arg.split("=", 2)
      val n = graft.Tables.embeddings(spark, dir).count()
      val dim = graft.operators.Ann.corpusDim(spark, dir)
      def once(): (Long, Double) = {
        val t0 = System.nanoTime()
        val pairs = graft.operators.Ann.embeddingIvfPairs(spark, dir).count()
        (pairs, (System.nanoTime() - t0) / 1e9)
      }
      val (pairs, t1) = once(); val (_, t2) = once()
      val sec = math.min(t1, t2)
      println(f"[embscale] $sf dir=$dir n=$n dim=$dim pairs=$pairs " +
        f"density_per_row=${pairs.toDouble / n}%.4f sec=$sec%.2f")
      f""""$sf":{"dir":"$dir","n":$n,"dim":$dim,"pairs":$pairs,""" +
        f""""pairs_per_row":${pairs.toDouble / n}%.5f,"sec":$sec%.3f}"""
    }
    spark.stop()
    val doc = "{" +
      "\"what\":\"dedup_embedding_ivf on GenData dim-256 corpora: " +
      "explicit ~0.5%-clone construction makes true pairs ~n, so " +
      "pairs_per_row must stay ~flat across SFs and the wall-time " +
      "decade ratio measures the OPERATOR (the 64-dim corpus was " +
      "output-bound, r7 adjudication). Best-of-2, local[" + cpus + "].\"," +
      results.mkString(",") + "}"
    java.nio.file.Files.writeString(java.nio.file.Paths.get(args(0)), doc + "\n")
    println(doc)
  }
}
