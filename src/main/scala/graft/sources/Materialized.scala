package graft.sources

/** Process-unique materialized-view registry.
  *
  * fcd's collectors write rollup/fan-out tables ONCE and the read
  * services only ever read them (reference: src/collector/dashboard/
  * collectDashboard.ts, src/collector/block/accountTx.ts).  The batch
  * analogue here: the first request for a view materializes it into a
  * fresh temp directory, every later request is a pure read of the
  * same files.
  *
  * Design points (both were round-2 review findings):
  *  - paths come from Files.createTempDirectory — process-unique, so
  *    two concurrent JVMs (e.g. Verify and Bench on the same source
  *    dir) can never race on one dynamic-partition-overwrite target;
  *  - the write runs at most once per (view, source dir) per JVM, so a
  *    registered query that serves from a view is a pure read on every
  *    call after the first — benchmarks time the read path, which is
  *    the path that exists in production.
  */
object Materialized {
  private val paths = scala.collection.mutable.Map.empty[String, String]

  /** Path of `view` materialized from `dir`, building it on first use.
    * `write` receives the target path and must produce the files. */
  def pathFor(view: String, dir: String)(write: String => Unit): String =
    synchronized {
      paths.getOrElseUpdate(s"$view|$dir", {
        val p = java.nio.file.Files
          .createTempDirectory(s"graft-$view-").toString + "/data"
        write(p)
        p
      })
    }
}
