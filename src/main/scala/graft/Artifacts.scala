package graft

/** Shared resolver for fingerprint-keyed persisted artifacts — the
  * ONE copy of the cache-invalidation logic the IVF index, the
  * set-sim index, and both BPE tokenizers previously hand-rolled
  * (VERDICT r11 #6: three divergent copies is how the round-5
  * staleness bug recurs).
  *
  * Invariants every artifact gets for free:
  *  - the corpus SOURCE FINGERPRINT (per-file path/size/mtime,
  *    Tables.sourceFingerprint) is part of both the in-JVM cache key
  *    and the on-disk digest, so an in-place testdata regen rebuilds
  *    instead of serving stale data;
  *  - `versionedParams` must lead with a schema-version tag
  *    ("ivf2|…", "ssi3|…"), so a code-level layout change invalidates
  *    exactly like a data change (the round-7 ScaleRehearsal lesson);
  *  - cross-JVM reuse via the caller's `ready` probe (an on-disk
  *    _SUCCESS file and/or metastore tableExists) — `build` runs only
  *    when the probe fails;
  *  - the on-disk name is a SHA-256 prefix of the full identity
  *    (String.hashCode collisions would cross-contaminate corpora).
  */
private[graft] object Artifacts {

  private val paths =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  private[graft] def sha8(s: String): String =
    java.security.MessageDigest.getInstance("SHA-256")
      .digest(s.getBytes("UTF-8")).take(8)
      .map(b => f"${b & 0xff}%02x").mkString

  /** Resolve (building at most once per JVM) the artifact directory
    * for `versionedParams` over the corpus at `dir`. `build` receives
    * (path, digest) — the digest doubles as a metastore-table-name
    * suffix for bucketed artifacts. */
  def resolve(root: String, dir: String, fp: String,
      versionedParams: String)(ready: String => Boolean)(
      build: (String, String) => Unit): String =
    paths.computeIfAbsent(s"$root|$dir|$versionedParams|$fp", _ => {
      val digest = sha8(s"$versionedParams|$dir|$fp")
      val p = s"$root/$digest"
      if (!ready(p)) build(p, digest)
      p
    })

  /** Test hook: forget the in-JVM memo for artifacts under `root`, so
    * the next resolve re-runs the `ready` probe — the only way a spec
    * can simulate a FRESH JVM's catalog-loss path (the probe is where
    * the re-attach lives) without forking one. Safe under parallel
    * suites when `root` is test-private. */
  private[graft] def evict(root: String): Unit =
    paths.keySet.removeIf(_.startsWith(s"$root|")): Unit
}
