package graft

import java.nio.file.{Files, Paths}
import java.nio.file.attribute.FileTime

/** The app-scoped stream staging contract (r14 advice, cutoff revised by
  * r15 advice): a second Spark app must never wipe a fixture a live app is
  * streaming from, and the once-per-JVM stale sweep must remove only trees
  * that are BOTH foreign (not this app's suffix) and old (>24 h mtime —
  * far above any plausible single-run duration, so even a long-running
  * foreign streaming query that staged once and never re-invoked staging
  * is safe). A live app's own base mtime is additionally TOUCHED on every
  * streamBase call, so re-invoking apps stay fresh without relying on run
  * dirs being recreated.
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
      // stale foreign: 25 h old; long-running foreign: 3 h old (the r15
      // advice case — a single >2 h streaming run must NOT be wiped
      // mid-stream); own tree: 25 h old (an app's OWN trees are never
      // swept, whatever their age — the staging memo owns their lifecycle)
      Files.setLastModifiedTime(stale, FileTime.fromMillis(now - 25L * 3600 * 1000))
      Files.setLastModifiedTime(fresh, FileTime.fromMillis(now - 3L * 3600 * 1000))
      Files.setLastModifiedTime(ownOld, FileTime.fromMillis(now - 25L * 3600 * 1000))
      SparkEntry.staleSweepDone.set(false) // the sweep is once-per-JVM
      val base = SparkEntry.streamBase(spark, "spectag", "/tmp/x")
      assert(base === s"/tmp/graft_stream_spectag__tmp_x__$app",
        "base must embed tag, sanitized dir, and the sanitized applicationId")
      assert(!Files.exists(stale), "stale foreign tree must be swept")
      assert(Files.exists(fresh), "a 3 h-old foreign tree must be retained " +
        "(it may belong to a live long-running streaming app)")
      assert(Files.exists(ownOld), "this app's own trees are never swept")
      // second call in the same JVM: sweep does not re-run (flag consumed),
      // and the path is stable
      Files.setLastModifiedTime(fresh, FileTime.fromMillis(now - 25L * 3600 * 1000))
      assert(SparkEntry.streamBase(spark, "spectag", "/tmp/x") === base)
      assert(Files.exists(fresh), "once-per-JVM: no second sweep")
    } finally {
      Seq(stale, fresh, ownOld).foreach(Files.deleteIfExists(_))
    }
  }

  test("streamBase touches its own existing base so other JVMs' sweeps see " +
       "it as live") {
    val app = spark.sparkContext.applicationId.replaceAll("\\W", "_")
    val own = Paths.get(s"/tmp/graft_stream_touchtag__tmp_x__$app")
    Files.createDirectories(own)
    try {
      val old = System.currentTimeMillis() - 25L * 3600 * 1000
      Files.setLastModifiedTime(own, FileTime.fromMillis(old))
      SparkEntry.streamBase(spark, "touchtag", "/tmp/x")
      val mtime = Files.getLastModifiedTime(own).toMillis
      assert(mtime > old + 24L * 3600 * 1000,
        s"own base mtime must be refreshed by streamBase, got $mtime vs $old")
    } finally Files.deleteIfExists(own)
  }

  test("the streaming heartbeat keeps long-running bases fresh: progress " +
       "events re-touch every registered base; vanished trees self-remove") {
    val app = spark.sparkContext.applicationId.replaceAll("\\W", "_")
    val own = Paths.get(s"/tmp/graft_stream_hbtag__tmp_x__$app")
    Files.createDirectories(own)
    try {
      val base = SparkEntry.streamBase(spark, "hbtag", "/tmp/x")
      assert(base === own.toString)
      // streamBase must have registered the base AND a heartbeat listener
      // on the session (the ADVICE r16 case: an app that staged once and
      // then only streams never re-invokes streamBase, so without the
      // listener its tree ages into foreign sweeps' 24 h window)
      assert(SparkEntry.liveStreamBases.contains(base))
      assert(spark.streams.listListeners()
        .exists(_.isInstanceOf[SparkEntry.StreamBaseHeartbeat]),
        "streamBase must install the heartbeat listener once per session")
      // age the tree, then fire the touch the listener delegates to — the
      // mtime must come back to now without any streamBase re-invocation
      val old = System.currentTimeMillis() - 25L * 3600 * 1000
      Files.setLastModifiedTime(own, FileTime.fromMillis(old))
      SparkEntry.touchStreamBases()
      assert(Files.getLastModifiedTime(own).toMillis > old + 24L * 3600 * 1000,
        "heartbeat touch must refresh a registered base's mtime")
      // a momentarily-absent tree (the wipe-then-restage window) must STAY
      // registered — dropping it here would permanently lose sweep
      // protection for the restaged tree — and the touch must resume once
      // the tree reappears
      Files.delete(own)
      SparkEntry.touchStreamBases() // no-op, no throw, no deregistration
      assert(SparkEntry.liveStreamBases.contains(base),
        "an absent tree must stay in the heartbeat registry (wipe/restage window)")
      Files.createDirectories(own)
      Files.setLastModifiedTime(own, FileTime.fromMillis(old))
      SparkEntry.touchStreamBases()
      assert(Files.getLastModifiedTime(own).toMillis > old + 24L * 3600 * 1000,
        "the heartbeat must resume touching a restaged tree")
    } finally {
      SparkEntry.liveStreamBases.remove(own.toString)
      Files.deleteIfExists(own)
    }
  }
}
