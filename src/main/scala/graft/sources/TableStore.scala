package graft.sources

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Versioned immutable-file table store with a single-pointer atomic
  * commit — the Delta `_delta_log` shape reduced to its invariant.
  * Data files are immutable once written; each version is described by
  * an immutable MANIFEST (one row per file: path + whatever stats the
  * planner wants — ranges, blooms); the only mutable object in the
  * whole store is a one-line pointer file naming the current version,
  * replaced by write-temp + ATOMIC_MOVE (the
  * [[SnapshotCache]] flip). A reader resolves the pointer ONCE into a
  * [[TableStore.Snapshot]] and plans + reads entirely against that
  * manifest, never the pointer again; because neither the manifest nor
  * the files it names are ever mutated, the read stays consistent
  * while any number of later versions commit underneath it — it can
  * never observe untouched ∪ half-written files, which is exactly the
  * race a bare directory swap admits.
  *
  * Commit ordering is the crash contract: data files first, manifest
  * second, pointer flip last. A crash before the flip leaves orphan
  * files and an unreferenced manifest — invisible to every reader, and
  * reclaimable by any vacuum that keeps referenced paths.
  *
  * Single writer per store, like SnapshotCache: two concurrent
  * committers could both claim version N+1. Real stores serialize this
  * exact point with a conditional put / log-entry CAS; a multi-writer
  * deployment must bring that lock.
  */
object TableStore {

  /** A pinned version: all planning for one query flows through this,
    * so the query's view cannot change mid-read. */
  final case class Snapshot(dir: String, version: Long) {
    def manifestPath: String = TableStore.manifestPath(dir, version)
    def metaPath: String = manifestPath + ".meta"
  }

  private def manifestPath(dir: String, v: Long) = s"$dir/manifests/m$v"

  private def pointer(dir: String) = Paths.get(dir, "_current")

  def currentVersion(dir: String): Option[Long] = {
    val p = pointer(dir)
    if (!Files.exists(p)) None
    else Some(new String(Files.readAllBytes(p), "UTF-8").trim.toLong)
  }

  /** Pin the current committed version. */
  def snapshot(dir: String): Snapshot =
    Snapshot(dir, currentVersion(dir).getOrElse(
      sys.error(s"TableStore: no committed version in $dir")))

  /** Commit `manifest` as the next version: manifest parquet + sidecar
    * metadata first (both named by the version, hence immutable), then
    * one atomic pointer flip. `meta` carries table-level properties that
    * must version WITH the file list — e.g. a column default declared
    * when the schema evolved (`default.<col>` -> literal). */
  def commit(spark: SparkSession, dir: String, manifest: DataFrame,
             meta: Map[String, String] = Map.empty): Snapshot = {
    val next = Snapshot(dir, currentVersion(dir).fold(0L)(_ + 1))
    manifest.write.mode("overwrite").parquet(next.manifestPath)
    val metaText = meta.toSeq.sorted
      .map { case (k, v) => s"$k=$v" }.mkString("\n")
    Files.write(Paths.get(next.metaPath), metaText.getBytes("UTF-8"))
    val tmp = Paths.get(dir, "_current_tmp")
    Files.write(tmp, next.version.toString.getBytes("UTF-8"))
    Files.move(tmp, pointer(dir), StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
    next
  }

  def manifest(spark: SparkSession, s: Snapshot): DataFrame =
    spark.read.parquet(s.manifestPath)

  def meta(s: Snapshot): Map[String, String] = {
    val p = Paths.get(s.metaPath)
    if (!Files.exists(p)) Map.empty
    else new String(Files.readAllBytes(p), "UTF-8").split("\n").toSeq
      .filter(_.contains("="))
      .map { line =>
        val i = line.indexOf('='); line.take(i) -> line.drop(i + 1)
      }.toMap
  }

  /** The snapshot's data file paths — bounded driver metadata (one
    * string per file, the pruned-file-list shape every table format's
    * driver materializes). */
  def filePaths(spark: SparkSession, s: Snapshot): Seq[String] =
    manifest(spark, s).select("path").collect().map(_.getString(0)).toSeq

  /** Retention GC: drop manifests older than the newest `retain`
    * versions, then delete STORE-OWNED data files (under `dir/files/`)
    * that no retained manifest references. Files outside the store's
    * own tree (e.g. a shared base layout the manifests point into) are
    * never touched — vacuum owns only what commit wrote. Deletion
    * order is the reverse of commit: files are unlinked only AFTER the
    * manifests that referenced them are gone, so a crash mid-vacuum
    * still leaves every retained version fully readable. Readers pinned
    * beyond the horizon are the same contract as every table format's
    * VACUUM: retention must exceed the longest running read. Returns
    * (dropped manifest versions, deleted data files). */
  def vacuum(spark: SparkSession, dir: String, retain: Int): (Int, Int) = {
    require(retain >= 1, "must retain at least the current version")
    val cur = currentVersion(dir).getOrElse(
      sys.error(s"TableStore: no committed version in $dir"))
    val horizon = math.max(0L, cur - retain + 1)
    val manifestsDir = Paths.get(dir, "manifests")
    val dropped = Files.list(manifestsDir).iterator().asScala.toSeq
      .filter { p =>
        val n = p.getFileName.toString
        n.startsWith("m") && !n.contains(".") &&
          n.drop(1).forall(_.isDigit) && n.drop(1).toLong < horizon
      }
    // manifests record Hadoop-style file URIs; vacuum walks local
    // paths — normalize both to the bare filesystem path
    def norm(s: String): String =
      if (s.startsWith("file:")) new java.net.URI(s).getPath else s
    val retainedPaths = (horizon to cur).flatMap(v =>
      filePaths(spark, Snapshot(dir, v))).map(norm).toSet
    dropped.foreach { m =>
      deleteRecursively(m)
      Files.deleteIfExists(Paths.get(m.toString + ".meta"))
      ()
    }
    val owned = Paths.get(dir, "files")
    var deleted = 0
    if (Files.isDirectory(owned)) {
      val all = Files.walk(owned).iterator().asScala.toSeq
      all.filter(p => Files.isRegularFile(p) &&
          !retainedPaths.contains(p.toString))
        .foreach { p => Files.delete(p); deleted += 1 }
      // bottom-up sweep of now-empty directories
      all.filter(p => Files.isDirectory(p) && p != owned)
        .sortBy(-_.getNameCount)
        .foreach { d =>
          if (Files.isDirectory(d) && !Files.list(d).iterator().hasNext)
            Files.delete(d)
        }
    }
    (dropped.size, deleted)
  }

  private def deleteRecursively(p: Path): Unit = {
    val f = p.toFile
    if (f.isDirectory) f.listFiles().foreach(c => deleteRecursively(c.toPath))
    f.delete()
    ()
  }
}
