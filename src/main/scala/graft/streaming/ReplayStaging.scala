package graft.streaming

import java.nio.file.{Files, Path, Paths}
import java.util.concurrent.atomic.AtomicLong

/** Staging helper for file-replay streams: Spark's file streaming
  * source requires a DIRECTORY, so a single parquet table file is
  * exposed behind a symlink in a per-call subdirectory. All staging
  * lives under one per-JVM root that a shutdown hook removes —
  * repeated calls (long-lived sessions, test suites) no longer
  * accumulate orphan temp directories.
  */
object ReplayStaging {

  private val counter = new AtomicLong()

  private lazy val root: Path = {
    val p = Files.createTempDirectory("graft-replay")
    Runtime.getRuntime.addShutdownHook(new Thread(() => deleteTree(p)))
    p
  }

  private def deleteTree(p: Path): Unit = {
    // the root may already be gone (CI workspace wipe, tmpwatch) —
    // walk() itself throws on a missing path, and an uncaught throw
    // from a shutdown hook prints a spurious stack trace at exit, so
    // the whole traversal sits inside the guard, not just the deletes
    try {
      // walk() reports a symlink itself (not its target); reverse
      // order deletes children before parents
      val walk = Files.walk(p)
      try {
        walk.sorted(java.util.Comparator.reverseOrder())
          .forEach(f => try Files.deleteIfExists(f) catch { case _: Exception => () })
      } finally walk.close()
    } catch { case _: Exception => () }
  }

  /** Stage `file` behind a symlink in a fresh subdirectory of the
    * per-JVM staging root; returns the directory path to hand to
    * `readStream.parquet(...)`. */
  def stage(file: String): String = {
    // absolutize BEFORE linking: a relative `file` would be written
    // into the symlink verbatim and resolve against the STAGING dir,
    // not the caller's cwd — a dangling link the stream fails on
    val src = Paths.get(file).toAbsolutePath.normalize
    val dir = Files.createDirectories(
      root.resolve(s"s${counter.getAndIncrement()}"))
    Files.createSymbolicLink(dir.resolve(src.getFileName), src)
    dir.toString
  }
}
