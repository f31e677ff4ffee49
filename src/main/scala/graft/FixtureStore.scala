package graft

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import scala.collection.concurrent.TrieMap
import scala.jdk.CollectionConverters._

/** Content-stamped cross-session fixture store — the amortization layer
  * under every one-time derived artifact (ANN index tables, ranked top-k
  * frames, graph edge sets, layout copies).
  *
  * Before this store each fixture dir was tagged with the OWNING SESSION's
  * identity hash and deleted at session teardown, so every JVM re-derived
  * every artifact even when the corpus had not changed — at ×100 that was
  * ~90 s of per-session rebuild (graph_edges 40 s, dpp 28 s, ann_rank
  * 22 s) for byte-identical outputs. A production deployment derives these
  * once per CORPUS VERSION and serves them until the data moves; the store
  * encodes exactly that contract:
  *
  *   - The fixture dir name carries a STAMP hashed from (a) the source
  *     tables' file metadata (relative path, size, mtime — pure filesystem
  *     metadata, no Spark job) and (b) the producing class's compiled
  *     .class file metadata. New data or a recompile of the producer ⇒ new
  *     stamp ⇒ rebuild; unchanged corpus + code ⇒ the dir is found and
  *     reused across sessions AND across JVMs in ~ms.
  *   - Builds land in a process-private `.build.<pid>` dir and are
  *     published by ATOMIC rename, so a concurrent reader can never see a
  *     half-written fixture: the published root is immutable from the
  *     instant it exists. A lost rename race (two JVMs building the same
  *     stamp) discards the loser's copy and reuses the winner's.
  *   - Stale siblings (same family + data dir, different stamp) are
  *     reaped at build time — at most one live dir per (family, corpus)
  *     accumulates in tmp. Nothing is deleted at session teardown anymore;
  *     cross-session reuse IS the point. (Safe here because the testdata
  *     dirs are immutable during a run; a stale stamp can only mean a
  *     recompile, and recompiles are session boundaries in this sandbox.)
  *
  * The class-file stamp is deliberately coarse (the producer class, not
  * its transitive closure): helper drift in another file would not flip
  * the stamp. FixtureServeSpec's fixture ≡ rebuilt equality assertions and
  * the DuckDB hash gate on every fixture-served query are the deep
  * staleness guards — a stale fixture cannot pass either.
  */
object FixtureStore {

  /** Per-process memo so repeat obtain() calls skip even the stamp walk.
    * Keyed by (family, dataDir) — NOT by session: the artifact belongs to
    * the corpus version, not to the session that first derived it.
    */
  private val ready = TrieMap.empty[(String, String), String]

  /** Drop the in-process memo entry — test hook simulating a FRESH JVM
    * (the memo is per-process; a new process starts empty and must
    * rediscover the on-disk dir by stamp). Never called from main code.
    */
  private[graft] def dropMemo(family: String, dataDir: String): Unit = {
    ready.remove((family, dataDir)); ()
  }

  /** Has this process already obtained the fixture? Consumers use this to
    * decide serve-from-fixture vs rebuild-inline (first-payer semantics
    * for entry points that never call the write — Verify, specs).
    */
  def peek(family: String, dataDir: String): Option[String] =
    ready.get((family, dataDir))

  /** File-metadata lines for one source table path (file or directory),
    * recursive, sorted — the data half of the stamp. An absent path is
    * stamped as such rather than erroring: some fixtures derive from
    * tables that a minimal test dir may not carry, and "absent" is itself
    * a content state.
    */
  private def fileMeta(p: Path, rel: String): Seq[String] =
    if (!Files.exists(p)) Seq(s"$rel:absent")
    else if (Files.isDirectory(p)) {
      val children = {
        val s = Files.list(p)
        try s.iterator().asScala.toSeq.sortBy(_.getFileName.toString)
        finally s.close()
      }
      children.flatMap(c => fileMeta(c, s"$rel/${c.getFileName}"))
    } else
      Seq(s"$rel:${Files.size(p)}:${Files.getLastModifiedTime(p).toMillis}")

  /** The code half of the stamp. Two classpath shapes exist here:
    *   - directory classpath (tests): stamp the producer's own .class
    *     file by size+mtime — sbt's incremental compiler rewrites exactly
    *     the changed classes, so an unrelated edit does not invalidate.
    *   - jar classpath (`sbt runMain`): sbt's bg-job runner COPIES the
    *     packaged jar to a fresh temp path per invocation, so path and
    *     mtime are meaningless — stamp the jar's CONTENT hash instead
    *     (stable across copies; changes exactly when any project code
    *     was recompiled, since jar entries carry the class mtimes).
    * Memoized per class: hashing the ~1 MB jar happens once per process.
    * Falls back to "unknown" — which still yields a stable stamp — when
    * the class source is unresolvable (e.g. a REPL-defined class).
    */
  private val codeStamps = TrieMap.empty[Class[_], String]

  private def codeStamp(producer: Class[_]): String =
    codeStamps.getOrElseUpdate(producer,
      try {
        val src = producer.getProtectionDomain.getCodeSource
        if (src == null || src.getLocation == null) "code:unknown"
        else {
          val loc = Paths.get(src.getLocation.toURI)
          if (Files.isDirectory(loc)) {
            val cls = loc.resolve(producer.getName.replace('.', '/') + ".class")
            if (Files.exists(cls))
              s"code:${Files.size(cls)}:${Files.getLastModifiedTime(cls).toMillis}"
            else "code:absent"
          } else if (Files.exists(loc))
            "code:jar:" + java.security.MessageDigest.getInstance("SHA-256")
              .digest(Files.readAllBytes(loc))
              .take(8).map("%02x".format(_)).mkString
          else "code:absent"
        }
      } catch { case _: Throwable => "code:unknown" })

  private def sha16(s: String): String =
    java.security.MessageDigest.getInstance("SHA-256")
      .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .take(8).map("%02x".format(_)).mkString

  private def deleteRecursively(f: java.io.File): Unit = {
    val children = f.listFiles()
    if (children != null) children.foreach(deleteRecursively)
    f.delete(); ()
  }

  /** Monotonic per-process attempt counter: together with the pid it
    * makes every build dir unique per ATTEMPT, so two threads of one JVM
    * racing the same obtain can never write into each other's dir (the
    * TrieMap memo does not make the builder exclusive — publication
    * correctness comes from unique dirs + the atomic rename, period).
    */
  private val attempt = new java.util.concurrent.atomic.AtomicLong(0)

  /** Published stale siblings younger than this survive a reap pass: a
    * dir this fresh was likely built by a CONCURRENTLY RUNNING process on
    * a different code version, which may still be reading it (external
    * bucketed tables, lazily-consumed fixture scans). Older ones are the
    * previous corpus/code version's leftovers and go.
    */
  private val ReapGraceMs = 30L * 60 * 1000

  /** Obtain the fixture root for `family` over `tables` under `dataDir`,
    * building via `build(tmpRoot)` only when no stamp-valid dir exists.
    * `build` receives a PRIVATE temp root and must write everything under
    * it; publication is the atomic rename here, never the build itself.
    * Returns the published root (immutable once visible).
    *
    * `extra` carries stamp lines beyond data + producer code — resolved
    * env-knob values for families whose CONTENT depends on them (the LSH
    * geometry behind the ranked-frame fixture): a knob change must flip
    * the stamp exactly like a data or code change, or a fixture built
    * under one geometry would silently serve a session running another.
    */
  def obtain(family: String, dataDir: String, tables: Seq[String],
      producer: Class[_], extra: Seq[String] = Nil)(
      build: String => Unit): String =
    ready.getOrElseUpdate((family, dataDir), {
      val lines = (Seq(s"family:$family", codeStamp(producer)) ++
        extra.sorted ++
        tables.sorted.flatMap { t =>
          fileMeta(Paths.get(dataDir, s"$t.parquet"), s"$t.parquet")
        }).mkString("\n")
      val stamp = sha16(lines)
      val dirTag = dataDir.replaceAll("[^a-zA-Z0-9]", "_") + "_" +
        Integer.toHexString(scala.util.hashing.MurmurHash3.stringHash(dataDir))
      val base = Paths.get(System.getProperty("java.io.tmpdir"), "graft_fx")
      Files.createDirectories(base)
      val rootName = s"${family}_${dirTag}_$stamp"
      val root = base.resolve(rootName)
      val done = root.resolve("_GRAFT_STAMP")
      if (Files.exists(done)) root.toString
      else {
        // reap siblings of this family+corpus. Two kinds:
        //  - published dirs with a different stamp: the previous
        //    corpus/code/knob version — reaped once past the grace
        //    window (a younger one may still feed a live process);
        //  - `.build.` attempt dirs whose owning PID is dead: orphans of
        //    a crashed build (live attempts — including our own threads'
        //    — are left alone).
        val now = System.currentTimeMillis()
        val sibs = {
          val s = Files.list(base)
          try s.iterator().asScala.toSeq finally s.close()
        }
        sibs.foreach { p =>
          val n = p.getFileName.toString
          if (n.startsWith(s"${family}_${dirTag}_") && n != rootName) {
            val bi = n.indexOf(".build.")
            if (bi >= 0) {
              val pid = n.drop(bi + ".build.".length).takeWhile(_.isDigit)
              val dead = pid.nonEmpty &&
                (try ProcessHandle.of(pid.toLong).isEmpty
                 catch { case _: Throwable => false })
              if (dead) deleteRecursively(p.toFile)
            } else if ({
              val age = try now - Files.getLastModifiedTime(p).toMillis
                        catch { case _: Throwable => 0L }
              age > ReapGraceMs
            }) deleteRecursively(p.toFile)
          }
        }
        val tmp = base.resolve(
          s"$rootName.build.${ProcessHandle.current().pid()}.${attempt.incrementAndGet()}")
        Files.createDirectories(tmp)
        build(tmp.toString)
        Files.writeString(tmp.resolve("_GRAFT_STAMP"), lines)
        try Files.move(tmp, root, StandardCopyOption.ATOMIC_MOVE)
        catch {
          case e: java.nio.file.FileSystemException =>
            // rename race: another attempt published the same stamp
            // first — its copy is equivalent (same data, same code, same
            // knobs); drop ours
            if (Files.exists(done)) deleteRecursively(tmp.toFile)
            else throw e
        }
        root.toString
      }
    })
}
