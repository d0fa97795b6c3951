package graft.util

import java.nio.file.{Files, Path}
import java.util.Comparator

/** Tiny filesystem helpers shared by the bench/tools/connector cleanup
  * paths (previously four copy-pasted walk/reverse/delete snippets).
  */
object Fs {
  /** Best-effort recursive delete: tolerates concurrent deletion (other
    * shutdown hooks, Spark's own temp cleanup) racing this walk.
    */
  def deleteRecursively(p: Path): Unit =
    try {
      if (Files.exists(p))
        Files.walk(p).sorted(Comparator.reverseOrder[Path]())
          .forEach(q => Files.deleteIfExists(q))
    } catch { case _: Throwable => () }
}
