package graft

import java.nio.file.{Files, Path, Paths}

/** Local-filesystem scratch-dir helpers shared by the driver-facing mains
  * (Bench's store wipe, Queries' exit-time CSV cleanup). */
object Fs {

  /** Recursively delete `path` if it exists. The Files.walk stream is
    * closed via try-with-resources semantics (an unclosed walk holds open
    * directory handles and, when entries vanish under it, can throw
    * UncheckedIOException mid-iteration); entries are deleted deepest
    * first. Failures on individual entries are swallowed — callers use
    * this for best-effort scratch reclamation, never for correctness. */
  def deleteTreeQuietly(path: String): Unit = {
    val p = Paths.get(path)
    if (Files.exists(p)) {
      val walk = Files.walk(p)
      try {
        walk.sorted(java.util.Comparator.reverseOrder[Path]())
          .forEach { f =>
            try Files.deleteIfExists(f)
            catch { case _: java.io.IOException => () }
          }
      } finally walk.close()
    }
  }
}
