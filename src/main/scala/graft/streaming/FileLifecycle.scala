package graft.streaming

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileStatus, FileSystem, Path}

import java.io.InputStream
import java.security.MessageDigest
import java.util.zip.GZIPInputStream

import scala.util.control.NonFatal

/** Per-file lifecycle utilities (SURVEY.md §2.8 ST7/ST8, §2.1 S4):
  * content-hash-deduplicated backups, timestamped move-to-processed,
  * post-run completeness audit, gzip extraction.
  *
  * The reference does all of this with `shutil`/`os` on a local disk
  * (mypy/xmlonly.py:21-62, dags/Dag3.py:94-132); here it runs over the
  * Hadoop FileSystem API so the same code works on HDFS/S3/local.
  * At scale prefer source-managed archiving (`cleanSource=archive`,
  * ST7) — these utilities exist for the reference's explicit
  * backup/dedup/audit semantics, driven from `foreachBatch` where
  * volumes are bounded by `maxFilesPerTrigger` (SURVEY §7.4 #4).
  */
class FileLifecycle(conf: Configuration) {

  /** FS resolution seam: specs override it to inject rename/IO faults
    * (Hadoop rename reports failure as FALSE, so the degraded branches
    * are unreachable through a healthy local FS). */
  protected def fs(p: Path): FileSystem = p.getFileSystem(conf)

  /** md5 hex of a file's content (streamed — constant memory). */
  def contentMd5(file: Path): String = {
    val in = fs(file).open(file)
    try {
      val md = MessageDigest.getInstance("MD5")
      val buf = new Array[Byte](64 * 1024)
      Iterator.continually(in.read(buf)).takeWhile(_ >= 0)
        .foreach(n => md.update(buf, 0, n))
      md.digest().map(b => f"$b%02x").mkString
    } finally in.close()
  }

  /** Copy `file` into `backupDir` unless a backup with identical content
    * already exists (md5 dedup, reference mypy/xmlonly.py:26-40). The
    * backup name embeds the content md5 — `backup_<md5>_<millis>_<name>`
    * — so the dedup check is ONE name glob, not a re-read of every
    * accumulated backup's bytes (the old all-files contentMd5 sweep was
    * O(total backup bytes) per call: quadratic over the directory's
    * lifetime, inside the foreachBatch hot path). Name collisions get a
    * counter suffix (dags/Dag3.py:119-125). Returns true if copied. */
  def backupDeduped(file: Path, backupDir: Path, nowMillis: Long): Boolean = {
    val bfs = fs(backupDir)
    bfs.mkdirs(backupDir)
    val srcMd5 = contentMd5(file)
    val dup = Option(bfs.globStatus(new Path(backupDir, s"backup_${srcMd5}_*")))
      .getOrElse(Array.empty).nonEmpty
    // Legacy fallback: backups written before the name embedded the md5
    // (`backup_<millis>_<name>`) are invisible to the glob above, so a
    // long-lived backup dir would re-copy one duplicate per upgraded
    // file. Only legacy-NAMED files (same original name, non-md5 first
    // segment) are re-read — the cost decays to zero as md5-named
    // backups take over.
    // listStatus + string filter, NOT a glob: the source filename may
    // contain glob metacharacters ([1], {a}) that would corrupt or
    // crash a glob pattern built from it
    def legacyDup: Boolean = Option(bfs.listStatus(backupDir))
      .getOrElse(Array.empty)
      .filter { st =>
        val n = st.getPath.getName
        n.startsWith("backup_") && n.endsWith("_" + file.getName) &&
          !n.matches("backup_[0-9a-f]{32}_.*")
      }
      .exists(st => contentMd5(st.getPath) == srcMd5)
    if (dup || legacyDup) false
    else {
      var target =
        new Path(backupDir, s"backup_${srcMd5}_${nowMillis}_${file.getName}")
      var i = 1
      while (bfs.exists(target)) {
        target = new Path(backupDir,
          s"backup_${srcMd5}_${nowMillis}_${i}_${file.getName}")
        i += 1
      }
      org.apache.hadoop.fs.FileUtil.copy(
        fs(file), file, bfs, target, false, conf)
    }
  }

  /** Move `file` to `processedDir` with a `processed_<millis>_` prefix
    * (reference mypy/xmlonly.py:51-62). Returns the target path.
    * Hadoop `rename` reports failure as FALSE, not an exception (e.g.
    * cross-FileSystem move, vanished source) — an unchecked result
    * would report success while the file stays in the input dir and
    * gets re-published on the next drain. Fail loudly instead. */
  def moveProcessed(file: Path, processedDir: Path, nowMillis: Long): Path = {
    val pfs = fs(processedDir)
    pfs.mkdirs(processedDir)
    val target = new Path(processedDir, s"processed_${nowMillis}_${file.getName}")
    if (!pfs.rename(file, target))
      throw new java.io.IOException(
        s"rename $file -> $target failed (cross-FS move or missing " +
          "source); file remains unarchived and WOULD be re-processed")
    target
  }

  /** Post-run completeness audit (reference mypy/xmlonly.py:150-153):
    * files still present in `inputDir` matching `glob` that were NOT
    * processed — non-empty means the drain missed input. Full statuses,
    * so callers identify files by (path, modTime): [[graft.flows.Flows.missedOf]]. */
  def auditRemaining(inputDir: Path, glob: String): Seq[FileStatus] = {
    val ifs = fs(inputDir)
    if (!ifs.exists(inputDir)) Seq.empty
    else Option(ifs.globStatus(new Path(inputDir, glob)))
      .getOrElse(Array.empty).toSeq
  }

  /** Decompress every `*.gz` in `srcDir` into `outDir` (reference
    * dags/Dag3.py:94-132); `x.xml.gz`→`x.xml`, `x.gz`→`x.xml`. Moves the
    * archive to `doneDir`. Returns the number extracted.
    *
    * Extraction is STAGED (write `.__extracting`, rename into place on
    * success — `outDir` is typically the LIVE streaming input dir, so
    * a direct write would let a drain pick up a half-written XML), and
    * a corrupt archive is QUARANTINED (`corrupt_` prefix in `doneDir`)
    * instead of aborting: the old behavior left the partial output at
    * its final name AND re-threw on the same bad file every run — a
    * permanently wedged flow from one truncated upload. Corruption is
    * judged by gzip-layer signals only (ZipException/EOFException) AND
    * only while the source stream stayed healthy ([[RawTap]] — HDFS/S3
    * read paths surface transient failures as EOFException too, and
    * those must retry, not quarantine). Any other IOException (source
    * block damage, output create/write/close) likewise leaves the
    * archive in `srcDir`, continues with the remaining archives, and
    * rethrows AFTER the loop — a healthy archive is never quarantined
    * for an FS blip, and one per-FILE extraction failure cannot wedge
    * its siblings. (Post-extraction commit failures —
    * rename-into-place, move-to-processed — still abort mid-loop: they
    * indicate a misconfigured outDir/doneDir that affects every file,
    * not a bad archive.) Delivery into `srcDir` must be ATOMIC
    * (write elsewhere, rename in): a file read mid-upload EOFs at the
    * gzip layer and is quarantined as corrupt.
    *
    * Collision detection is WITHIN-RUN only: `producedBy` is rebuilt per
    * invocation, so `x.gz` and `x.xml.gz` arriving in DIFFERENT runs are
    * indistinguishable from re-delivery and the later run overwrites
    * `x.xml` (the archive survives as `processed_*` — recoverable, but
    * unflagged). Accepted: flagging needs durable per-output provenance,
    * and the reference never mixes the suffixes (dags/Dag3.py:94-132).
    * A DETECTED collision, though, must never degrade into that same
    * silent overwrite: if preserving the archive in `doneDir` fails
    * (rename false, e.g. cross-FS), it is parked under a non-`.gz` name
    * in `srcDir` so the next run cannot pick it up undetected. */
  def gunzipAll(srcDir: Path, outDir: Path, doneDir: Path,
      nowMillis: Long): Int = {
    val sfs = fs(srcDir)
    val ofs = fs(outDir)
    ofs.mkdirs(outDir)
    val gzs = Option(sfs.globStatus(new Path(srcDir, "*.gz")))
      .getOrElse(Array.empty)
    var extracted = 0
    // within-batch output-name collisions (x.gz and x.xml.gz both map
    // to x.xml): extracting the second would silently overwrite the
    // first's payload while both count as extracted — detected below
    // and preserved lossless instead
    val producedBy = scala.collection.mutable.Map.empty[String, String]
    // non-corruption per-file failures (IO or a wrapped client's
    // RuntimeException): extraction continues past them (archive left
    // in srcDir for retry), first cause rethrown after the loop
    val perFileFailures = scala.collection.mutable.ArrayBuffer.empty[(String, Exception)]
    gzs.foreach { st =>
      val name = st.getPath.getName
      val outName =
        if (name.endsWith(".xml.gz")) name.dropRight(3)
        else name.dropRight(3) + ".xml"
      if (producedBy.contains(outName)) {
        val dfs = fs(doneDir)
        dfs.mkdirs(doneDir)
        val conflicted = new Path(doneDir, s"conflict_${nowMillis}_$name")
        if (dfs.rename(st.getPath, conflicted))
          log.error(s"$name collides with ${producedBy(outName)} on " +
            s"output $outName — preserved unextracted as $conflicted; " +
            "recover it manually")
        else {
          // left in srcDir the archive would extract WITHOUT collision
          // detection next run (its sibling is already processed_*) and
          // silently replace the first payload — park it under a
          // non-.gz name in srcDir instead (same-FS rename; the *.gz
          // glob skips it) and only fail the run if even that fails
          val parked = new Path(srcDir, s"conflict_${nowMillis}_$name.hold")
          if (sfs.rename(st.getPath, parked))
            log.error(s"$name collides with ${producedBy(outName)} on " +
              s"output $outName and the rename to $conflicted returned " +
              s"false — parked as $parked; recover it manually")
          else
            throw new java.io.IOException(
              s"$name collides with ${producedBy(outName)} on output " +
              s"$outName and both preservation renames ($conflicted, " +
              s"$parked) returned false — failing loudly rather than " +
              "letting the next run silently overwrite the extraction")
        }
      } else {
        val staged = new Path(outDir, s".${outName}.__extracting")
        var tap: RawTap = null // non-null once the source stream is open
        var corrupt = false    // a gzip-layer read judged the bytes bad
        // Some = extracted?; None = non-corruption failure (recorded above)
        val ok: Option[Boolean] =
          try {
            val raw = sfs.open(st.getPath)
            try {
              tap = new RawTap(raw)
              // corruption evidence is POSITIVE: only a ZipException/
              // EOFException escaping a gzip-layer READ — the EAGER
              // header parse in the constructor (hence raw already under
              // a finally, or its handle leaks per corrupt archive per
              // run) or a body inflate — with healthy source reads
              // judges the bytes; an output/close() EOF must NOT.
              def gzRead[A](body: => A): A =
                try body
                catch { case e @ (_: java.util.zip.ZipException
                                | _: java.io.EOFException)
                    if !tap.failed => corrupt = true; throw e }
              val in: InputStream = gzRead(new GZIPInputStream(tap))
              val out = ofs.create(staged, true)
              try {
                val buf = new Array[Byte](64 * 1024)
                var n = gzRead(in.read(buf))
                while (n >= 0) { out.write(buf, 0, n); n = gzRead(in.read(buf)) }
                Some(true)
              } finally { try in.close() finally out.close() }
            } finally raw.close() // idempotent when in.close() got there
          } catch {
            // quarantining non-corruption failures (source/output FS —
            // open/create/write/close) permanently dropped a HEALTHY
            // archive on a transient blip: only positive gzip evidence
            // quarantines, keyed on the corrupt FLAG, not the escaping
            // type (a cleanup close() RuntimeException can win the
            // finally race); all other NonFatal failures retry —
            // interrupts/fatals abort the run. Cleanup SUPPRESSED.
            case e: Exception if corrupt && NonFatal(e) =>
              log.warn(s"corrupt archive ${st.getPath} (${e.getMessage}) " +
                "— quarantining and continuing")
              try ofs.delete(staged, false)
              catch { case c: Exception if NonFatal(c) => log.warn(
                s"staged cleanup of $staged failed (${c.getMessage}) — " +
                "dotted debris, invisible to drains, overwritten on retry") }
              Some(false)
            case e: Exception if NonFatal(e) =>
              try ofs.delete(staged, false)
              catch { case c: Exception if NonFatal(c) => e.addSuppressed(c) }
              log.error(s"extraction of ${st.getPath} failed on a " +
                s"non-corruption error (${e.getClass.getSimpleName}: " +
                s"${e.getMessage}) — left in srcDir for retry, continuing")
              perFileFailures += ((st.getPath.toString, e))
              // claim the output name anyway: a same-run sibling mapping
              // to it is a genuine collision and must park lossless, not
              // extract now and be silently overwritten on our retry run
              producedBy(outName) = name
              None
          }
        if (ok.contains(true)) {
          val target = new Path(outDir, outName)
          ofs.delete(target, false) // re-extraction overwrites
          if (!ofs.rename(staged, target))
            throw new java.io.IOException(
              s"rename $staged -> $target failed after extraction")
          moveProcessed(st.getPath, doneDir, nowMillis)
          producedBy(outName) = name
          extracted += 1
        } else if (ok.contains(false)) {
          val dfs = fs(doneDir)
          dfs.mkdirs(doneDir)
          val quarantined = new Path(doneDir, s"corrupt_${nowMillis}_$name")
          // rename reports failure as FALSE (e.g. cross-FS doneDir) —
          // the same trap moveProcessed guards against. Quarantine must
          // not throw (it exists so one bad file can't wedge the flow),
          // but a permanently-failing quarantine has to be VISIBLE:
          // otherwise the corrupt .gz silently stays in srcDir and is
          // re-read, re-warned, and re-quarantine-attempted on every
          // run forever.
          if (!dfs.rename(st.getPath, quarantined))
            log.error(s"quarantine rename ${st.getPath} -> $quarantined " +
              "returned false — the corrupt archive remains in the " +
              "source dir and will be re-attempted every run")
        }
      }
    }
    // fail loud AFTER best effort: siblings extracted, failed archives
    // still in srcDir for the next run
    perFileFailures.headOption.foreach { case (p, e) =>
      throw new java.io.IOException(s"${perFileFailures.size} archive(s) hit " +
        s"non-corruption errors (left in srcDir for retry; $extracted " +
        s"extracted); first: $p", e)
    }
    extracted
  }

  /** Source-stream failure tap for [[gunzipAll]]'s corruption verdict:
    * a truncated archive EOFs at the gzip layer AFTER a clean source
    * end-of-data (-1); a transient source-FS failure (HDFS/S3 read
    * aborted) is ANY throwable from the source read/skip itself
    * (wrapped FS clients throw RuntimeException too) — only the former
    * judges the bytes. JDK gzip streams drive the raw stream only
    * through read() today; skip() is tapped against a future JDK. */
  private[graft] final class RawTap(in: InputStream)
      extends java.io.FilterInputStream(in) {
    var failed = false
    private def tapped[A](body: => A): A =
      try body
      catch { case e: Throwable => failed = true; throw e }
    override def read(): Int = tapped(super.read())
    override def read(b: Array[Byte], off: Int, len: Int): Int =
      tapped(super.read(b, off, len))
    override def skip(n: Long): Long = tapped(super.skip(n))
  }

  private lazy val log = org.slf4j.LoggerFactory.getLogger(getClass)
}
