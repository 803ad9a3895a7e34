package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.hadoop.fs.Path

/** Snapshot-versioned table layout with time travel (the
  * Iceberg/Delta-style contract a 100 TB warehouse needs: writers
  * publish immutable snapshots, readers pin a version, old versions
  * stay readable until explicitly expired).
  *
  * Layout under `root/`:
  *   data/s<N>/...parquet     one immutable file set per commit
  *   manifest-v<N>.txt        newline-separated data dirs composing
  *                            version N (append = parent's list + the
  *                            new dir; overwrite = just the new dir)
  *
  * The key property — identical to the manifest trick in
  * [[graft.sources.Zorder]]'s pruned reads and the metastore pointer
  * flip described at [[Sink.compactPartitioned]] — is that a commit
  * never rewrites or deletes a file another version references:
  * publishing is writing one small manifest, so concurrent readers of
  * version N-1 are never torn, and "time travel" is just reading an
  * older manifest. Data files are shared structurally between
  * versions (an append's manifest reuses every parent dir), so the
  * storage cost of history is one file LIST per commit, not a copy.
  */
object TimeTravel {

  private def fs(spark: SparkSession, root: String) =
    new Path(root).getFileSystem(spark.sessionState.newHadoopConf())

  /** Highest committed version under root, 0 if none. */
  def currentVersion(spark: SparkSession, root: String): Int = {
    val f = fs(spark, root)
    val p = new Path(root)
    if (!f.exists(p)) 0
    else f.listStatus(p).toSeq.map(_.getPath.getName)
      .filter(_.startsWith("manifest-v"))
      .map(_.stripPrefix("manifest-v").stripSuffix(".txt").toInt)
      .reduceOption(_ max _).getOrElse(0)
  }

  private def readManifest(spark: SparkSession, root: String, v: Int)
      : Seq[String] = {
    val f = fs(spark, root)
    val in = f.open(new Path(root, s"manifest-v$v.txt"))
    try scala.io.Source.fromInputStream(in, "UTF-8")
      .getLines().filter(_.nonEmpty).toList
    finally in.close()
  }

  private def writeManifest(spark: SparkSession, root: String, v: Int,
      dirs: Seq[String]): Unit = {
    val f = fs(spark, root)
    // write-then-rename: the manifest (the publish point) appears
    // atomically — a reader never sees a half-written version
    val tmpP = new Path(root, s".manifest-v$v.tmp")
    val out = f.create(tmpP, true)
    try out.write((dirs.mkString("\n") + "\n").getBytes("UTF-8"))
    finally out.close()
    f.rename(tmpP, new Path(root, s"manifest-v$v.txt")): Unit
  }

  private def commit(df: DataFrame, root: String, append: Boolean): Int = {
    val spark = df.sparkSession
    val parent = currentVersion(spark, root)
    val v = parent + 1
    val dataDir = s"data/s$v"
    df.write.mode(SaveMode.ErrorIfExists).parquet(s"$root/$dataDir")
    val dirs =
      if (append && parent > 0) readManifest(spark, root, parent) :+ dataDir
      else Seq(dataDir)
    writeManifest(spark, root, v, dirs)
    v
  }

  /** Publish df as a new snapshot that ADDS to the current one.
    * Returns the new version number.
    */
  def commitAppend(df: DataFrame, root: String): Int =
    commit(df, root, append = true)

  /** Publish df as a new snapshot that REPLACES the current one
    * (the full-rewrite path: compaction, backfill, GDPR rewrite).
    * Old versions keep reading their own files.
    */
  def commitOverwrite(df: DataFrame, root: String): Int =
    commit(df, root, append = false)

  /** Read the table as of version v (time travel). The read is a
    * plain multi-dir parquet scan, so pushdown/pruning work exactly
    * as on an unversioned table.
    */
  def readVersion(spark: SparkSession, root: String, v: Int): DataFrame = {
    val dirs = readManifest(spark, root, v).map(d => s"$root/$d")
    spark.read.parquet(dirs: _*)
  }

  /** Read the latest snapshot. */
  def readLatest(spark: SparkSession, root: String): DataFrame =
    readVersion(spark, root, currentVersion(spark, root))

  // ---- write-audit-publish (WAP) ------------------------------------

  /** Stage a batch WITHOUT publishing: files land under
    * data/stage-<tag>, invisible to every reader (readers only follow
    * manifests). The staged copy is what an audit runs against.
    */
  def stage(df: DataFrame, root: String, tag: String): Unit =
    df.write.mode(SaveMode.Overwrite).parquet(s"$root/data/stage-$tag")

  /** Read a staged (unpublished) batch for auditing. */
  def readStaged(spark: SparkSession, root: String, tag: String): DataFrame =
    spark.read.parquet(s"$root/data/stage-$tag")

  /** Promote an audited staged batch to the next snapshot: one
    * directory rename + one manifest write — no data is copied, so
    * publish cost is independent of batch size. Returns the new
    * version.
    */
  def publishStaged(spark: SparkSession, root: String, tag: String,
      append: Boolean = true): Int = {
    val f = fs(spark, root)
    val parent = currentVersion(spark, root)
    val v = parent + 1
    val dataDir = s"data/s$v"
    require(f.rename(new Path(root, s"data/stage-$tag"), new Path(root, dataDir)),
      s"stage-$tag does not exist or s$v is taken")
    val dirs =
      if (append && parent > 0) readManifest(spark, root, parent) :+ dataDir
      else Seq(dataDir)
    writeManifest(spark, root, v, dirs)
    v
  }

  /** Drop a staged batch that failed its audit. Published versions
    * are untouched — the failed data never became visible.
    */
  def abortStaged(spark: SparkSession, root: String, tag: String): Unit =
    fs(spark, root).delete(new Path(root, s"data/stage-$tag"), true): Unit
}
