package graft

/** The per-(session, corpus dir) store caches behind the paired
  * registrations ([[graft.queries.EmbQueries]]'s streamed-IVF pair,
  * [[graft.queries.DocQueries]]'s gate/readback pair): reuse must be
  * invisible (same rows on every call) and SELF-HEALING — the cache
  * holds a path into scratch space, and the scratch sweeper or an
  * `sbt clean` can delete the store under a live session, so a hit
  * whose directory is gone must rebuild instead of failing the probe.
  */
class StoreReuseSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  /** Find the store dir a fresh run just (re)built: the newest
    * `store-*` under `<scratchRoot>/<sub>` (the root is tmpfs-backed
    * by default since r17 — follow the engine's knob, not a literal
    * `target`). */
  private def newestStore(sub: String): java.nio.file.Path = {
    val root = java.nio.file.Paths.get(graft.store.Store.scratchRoot, sub)
    val s = java.nio.file.Files.list(root)
    try {
      import scala.jdk.CollectionConverters._
      s.iterator().asScala
        .filter(_.getFileName.toString.startsWith("store-"))
        .maxBy(p => java.nio.file.Files.getLastModifiedTime(p).toMillis)
    } finally s.close()
  }

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toString).toSeq

  test("streamed-IVF reuse is invisible, and a deleted store rebuilds " +
    "instead of failing the probe") {
    val q = graft.queries.EmbQueries.ivfStreamed
    val first = rows(q.run(spark, sf))
    assert(first.nonEmpty)
    // cached second run: identical rows
    assert(rows(q.run(spark, sf)) == first, "cached probe diverged")
    // kill the store under the cache: the existence re-check must
    // rebuild, not throw PATH_NOT_FOUND from a stale cached path
    graft.store.Store.deleteRecursively(newestStore("annmv"))
    assert(rows(q.run(spark, sf)) == first, "rebuild after sweep diverged")
  }

  test("gated-ingest reuse is invisible across BOTH consumers, and a " +
    "deleted store re-ingests") {
    val gate = graft.queries.DocQueries.ingestDedupGate
    val mv = graft.queries.DocQueries.minhashPairsMv
    val g1 = rows(gate.run(spark, sf))
    assert(g1.nonEmpty)
    // the readback consumer reads the SAME ingest pass; then the gate
    // again from cache — both stable
    val m1 = rows(mv.run(spark, sf))
    assert(rows(gate.run(spark, sf)) == g1, "cached gate readout diverged")
    graft.store.Store.deleteRecursively(newestStore("gatemv"))
    assert(rows(gate.run(spark, sf)) == g1, "re-ingest after sweep diverged")
    assert(rows(mv.run(spark, sf)) == m1,
      "readback over the re-ingested store diverged")
  }

  test("SessionScopedCache: corpus regenerated in place rebuilds; " +
    "stopped sessions evict (r12 ADVICE)") {
    val corpus = java.nio.file.Files.createTempDirectory("ssc_corpus")
    val table = corpus.resolve("documents.parquet")
    java.nio.file.Files.writeString(table, "v1")
    var builds = 0
    val stopped = new java.util.concurrent.atomic.AtomicBoolean(false)
    val cache = new graft.store.SessionScopedCache[String](_ => stopped.get)
    def get() = cache.getOrBuild(spark, corpus.toString)(_ => true) {
      builds += 1; s"build$builds"
    }
    assert(get() == "build1" && get() == "build1", "plain reuse broke")
    // regenerate the corpus IN PLACE: same path, new bytes → the old
    // existence-only check served the stale store here
    java.nio.file.Files.writeString(table, "v2-regenerated")
    java.nio.file.Files.setLastModifiedTime(table,
      java.nio.file.attribute.FileTime.fromMillis(
        System.currentTimeMillis() + 5000))
    assert(get() == "build2", "regenerated corpus served a stale store")
    assert(cache.size == 1)
    // a stopped session's entry must not pin the session for the JVM
    // lifetime: the next access sweeps it
    stopped.set(true)
    assert(get() == "build3", "stopped-session entry survived")
    java.nio.file.Files.deleteIfExists(table)
    java.nio.file.Files.deleteIfExists(corpus)
  }

  test("SessionScopedCache fingerprint: nested in-place rewrites and " +
    "timestamp-preserving regeneration both drift the stamp (r13 ADVICE)") {
    import java.nio.file.{Files, attribute}
    val corpus = Files.createTempDirectory("ssc_deep")
    // partitioned-table layout: the mutation happens TWO levels down,
    // without changing the table dir's entry set — exactly the case
    // the old direct-children max-mtime stamp could not see
    val part = Files.createDirectories(
      corpus.resolve("events.parquet").resolve("month=202401"))
    val leaf = part.resolve("part-0000.parquet")
    Files.writeString(leaf, "v1")
    val pin = attribute.FileTime.fromMillis(1700000000000L)
    // pin EVERY mtime in the tree so only the content of the stamp
    // (not wall-clock side effects of the writes) drives the test
    def pinAll(): Unit = {
      val w = Files.walk(corpus)
      try w.forEach(p => Files.setLastModifiedTime(p, pin))
      finally w.close()
    }
    pinAll()
    var builds = 0
    val cache = new graft.store.SessionScopedCache[String](_ => false)
    def get() = cache.getOrBuild(spark, corpus.toString)(_ => true) {
      builds += 1; s"build$builds"
    }
    assert(get() == "build1" && get() == "build1", "plain reuse broke")
    // (a) nested rewrite, mtime moved, entry set unchanged
    Files.writeString(leaf, "v2")
    Files.setLastModifiedTime(leaf,
      attribute.FileTime.fromMillis(1700000000001L))
    assert(get() == "build2", "nested in-place rewrite served stale")
    // (b) timestamp-PRESERVING regeneration (cp -p / rsync -t): every
    // mtime pinned back, but the leaf's size moved
    Files.writeString(leaf, "v3-bigger-payload")
    pinAll()
    assert(get() == "build3",
      "timestamp-preserving regeneration served stale")
    // (c) same size + same mtimes + same names ⇒ stamp equal ⇒ hit:
    // the documented residual blind spot is content-only drift, which
    // no stat-based stamp can see
    Files.writeString(leaf, "v4-bigger-payloaX")
    pinAll()
    assert(get() == "build3", "stat-identical rewrite should still hit")
    graft.store.Store.deleteRecursively(corpus)
  }
}
