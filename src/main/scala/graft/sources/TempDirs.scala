package graft.sources

import java.nio.file.{Files, Path}

/** Scratch-directory allocator for query-local stores (shard writes,
  * manifest/bloom indexes, streaming checkpoints). Every directory is
  * created under ONE per-JVM root that a shutdown hook deletes
  * recursively, so repeated Bench/Verify runs stop accreting orphan
  * `graft_q*` directories in the system temp dir (each run cleans up
  * after itself; within a run, allocation stays cheap and collision-free
  * via createTempDirectory's random suffix).
  */
object TempDirs {

  private lazy val root: Path = {
    val r = Files.createTempDirectory("graft_run_")
    Runtime.getRuntime.addShutdownHook(new Thread(() => deleteRecursively(r)))
    r
  }

  /** Drop-in for `Files.createTempDirectory(prefix)`, but rooted in the
    * run-scoped directory above. */
  def create(prefix: String): Path = Files.createTempDirectory(root, prefix)

  private def deleteRecursively(p: Path): Unit = {
    val f = p.toFile
    if (f.isDirectory) f.listFiles().foreach(c => deleteRecursively(c.toPath))
    f.delete()
    ()
  }
}
