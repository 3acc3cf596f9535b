package graft

import java.nio.file.{Files, Paths}
import java.nio.file.attribute.FileTime

/** The app-scoped stream staging contract (r14 advice): a second Spark app
  * must never wipe a fixture a live app is streaming from, and the
  * once-per-JVM stale sweep must remove only trees that are BOTH foreign
  * (not this app's suffix) and old (>2 h mtime) — a live concurrent app's
  * tree keeps a fresh mtime because its run dirs are wiped/recreated as
  * direct children on every invocation.
  */
class StreamBaseSpec extends SparkSpec {

  test("streamBase is app-scoped; the sweep removes stale foreign trees only") {
    val app = spark.sparkContext.applicationId.replaceAll("\\W", "_")
    val now = System.currentTimeMillis()
    val stale = Paths.get("/tmp/graft_stream_spectag_stale__foreignapp")
    val fresh = Paths.get("/tmp/graft_stream_spectag_fresh__foreignapp")
    val ownOld = Paths.get(s"/tmp/graft_stream_spectag_own__$app")
    Seq(stale, fresh, ownOld).foreach(Files.createDirectories(_))
    try {
      // stale foreign: 3 h old; fresh foreign: now; own tree: 3 h old
      // (an app's OWN trees are never swept, whatever their age — the
      // staging memo owns their lifecycle)
      Files.setLastModifiedTime(stale, FileTime.fromMillis(now - 3L * 3600 * 1000))
      Files.setLastModifiedTime(fresh, FileTime.fromMillis(now))
      Files.setLastModifiedTime(ownOld, FileTime.fromMillis(now - 3L * 3600 * 1000))
      SparkEntry.staleSweepDone.set(false) // the sweep is once-per-JVM
      val base = SparkEntry.streamBase(spark, "spectag", "/tmp/x")
      assert(base === s"/tmp/graft_stream_spectag__tmp_x__$app",
        "base must embed tag, sanitized dir, and the sanitized applicationId")
      assert(!Files.exists(stale), "stale foreign tree must be swept")
      assert(Files.exists(fresh), "fresh foreign tree must be retained " +
        "(it may belong to a live concurrent app)")
      assert(Files.exists(ownOld), "this app's own trees are never swept")
      // second call in the same JVM: sweep does not re-run (flag consumed),
      // and the path is stable
      Files.setLastModifiedTime(fresh, FileTime.fromMillis(now - 3L * 3600 * 1000))
      assert(SparkEntry.streamBase(spark, "spectag", "/tmp/x") === base)
      assert(Files.exists(fresh), "once-per-JVM: no second sweep")
    } finally {
      Seq(stale, fresh, ownOld).foreach(Files.deleteIfExists(_))
    }
  }
}
