package graft.sources

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite

/** Pins the scratch cleaner's symlink contract. The sf1 scale probe
  * exposed a data-destruction bug: `File.isDirectory` FOLLOWS symlinks,
  * so a staged streaming-source link pointing at a real directory-layout
  * table was recursed into and the pointed-to data files were deleted by
  * the shutdown hook — the probe's events table vanished out from under
  * later runs. The cleaner must unlink links and only descend real
  * directories. */
class TempDirsSpec extends AnyFunSuite {

  test("cleanup unlinks symlinks without following them into real data") {
    val data = Files.createTempDirectory("graft_spec_data")
    Files.writeString(data.resolve("keep.txt"), "precious")
    val sub = Files.createDirectories(data.resolve("nested"))
    Files.writeString(sub.resolve("also.txt"), "still precious")

    val scratch = Files.createTempDirectory("graft_spec_scratch")
    Files.createSymbolicLink(scratch.resolve("dirlink"), data)
    Files.createSymbolicLink(scratch.resolve("filelink"),
      data.resolve("keep.txt"))
    Files.writeString(scratch.resolve("own.txt"), "scratch-local")
    Files.createDirectories(scratch.resolve("realsub"))
    Files.writeString(scratch.resolve("realsub/gone.txt"), "scratch-local")

    TempDirs.deleteRecursively(scratch)

    assert(!Files.exists(scratch), "scratch dir must be deleted")
    assert(Files.exists(data.resolve("keep.txt")),
      "file behind a directory symlink must survive cleanup")
    assert(Files.exists(sub.resolve("also.txt")),
      "nested data behind a directory symlink must survive cleanup")

    TempDirs.deleteRecursively(data)
    assert(!Files.exists(data))
  }
}
