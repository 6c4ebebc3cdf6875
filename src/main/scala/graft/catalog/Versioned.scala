package graft.catalog

import scala.util.Try

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Versioned tables with time travel, O(1) rollback, and optimistic
  * concurrency — the transaction-log design of the public Delta Lake
  * protocol (Armbrust et al., VLDB 2020), reduced to its core: a
  * table is a LOG of immutable commits, and the commit point is the
  * atomic creation of one log entry.
  *
  * Layout:
  * {{{
  *   root/_log/00000000000000000001.commit   // content: data dir name
  *   root/_log/00000000000000000002.commit
  *   root/data-00000000000000000001-ab12cd34/  ... parquet ...
  * }}}
  *
  * Protocol (every step resolvable after a crash):
  *  1. write the new table to a fresh `data-<seq>-<uuid>` dir —
  *     unreferenced, invisible to every reader;
  *  2. CREATE-exclusive `_log/<seq>.commit` naming that dir. Success
  *     IS the commit; failure means another writer took `seq`, so the
  *     orphan data dir is deleted and the attempt retries against the
  *     new latest version (optimistic concurrency, the Delta
  *     mutual-exclusion rule). A crash between 1 and 2 leaves only an
  *     invisible orphan, which [[vacuum]] collects.
  *
  * Readers never block writers and vice versa: [[read]]/[[readAt]]
  * resolve the log once and then scan an immutable dir. [[rollback]]
  * writes a new log entry POINTING at the old version's data dir —
  * no data copy, and history is preserved (a rollback is itself a
  * commit). [[vacuum]] deletes data dirs no surviving log entry
  * references, honoring rollback aliases.
  *
  * 100 TB shape: the log is O(commits) tiny files read only by
  * planners; data dirs are written once and never mutated, so object
  * stores see only atomic-create and bulk-read traffic — no
  * rename-directory semantics are required of the store. (The public
  * Delta protocol's incremental add/remove-file actions are the next
  * refinement; whole-snapshot commits keep this layer honest about
  * what it implements.)
  */
object Versioned {

  final case class Entry(seq: Long, dataDir: String)

  private val LogDirName = "_log"
  private def fmtSeq(seq: Long) = f"$seq%020d"

  private def fs(spark: SparkSession, root: String): (FileSystem, Path) = {
    val p = new Path(root)
    (p.getFileSystem(spark.sparkContext.hadoopConfiguration), p)
  }

  /** All commits, ascending. Malformed log entries are skipped (a
    * torn write never poisons the table — the entry that mattered is
    * the one whose create returned success). An entry is trusted when
    * it carries the completeness terminator (trailing newline) the
    * writer appends after the data-dir name — a crash mid-fill on the
    * no-hardlink fallback path leaves a terminator-less fragment,
    * which must never surface as a commit naming a garbage dir — OR,
    * for entries written by the pre-terminator format (which wrote the
    * bare data-dir name with no newline), when the named data dir
    * actually exists. The dir-exists fallback is sound for torn new
    * entries too: the data dir is fully written BEFORE publish, so a
    * fragment that happens to spell a real dir name is a complete
    * commit in all but the terminator byte; a fragment truncated
    * mid-name names nothing on disk and stays invisible. */
  def history(spark: SparkSession, root: String): Seq[Entry] = {
    val (f, p) = fs(spark, root)
    val log = new Path(p, LogDirName)
    if (!f.exists(log)) return Seq.empty
    f.listStatus(log).toSeq.flatMap { st =>
      val name = st.getPath.getName
      if (!name.endsWith(".commit")) None
      else Try(name.stripSuffix(".commit").toLong).toOption.flatMap { seq =>
        val in = f.open(st.getPath)
        val raw =
          try scala.io.Source.fromInputStream(in, "UTF-8").mkString
          finally in.close()
        val content = raw.trim
        if (content.isEmpty) None
        else if (raw.endsWith("\n")) Some(Entry(seq, content))
        else if (f.exists(new Path(p, content))) Some(Entry(seq, content))
        else None
      }
    }.sortBy(_.seq)
  }

  def currentEntry(spark: SparkSession, root: String): Option[Entry] =
    history(spark, root).lastOption

  /** Highest sequence number any `.commit` file claims — INCLUDING
    * torn/empty ones [[history]] skips. Writers allocate past these,
    * or a crash that tore an entry mid-write would livelock every
    * later commit on its permanently-taken sequence number. */
  private def maxSeqOnDisk(f: FileSystem, root: Path): Long = {
    val log = new Path(root, LogDirName)
    if (!f.exists(log)) return 0L
    f.listStatus(log).toSeq.flatMap { st =>
      val name = st.getPath.getName
      if (name.endsWith(".commit"))
        Try(name.stripSuffix(".commit").toLong).toOption
      else None
    }.foldLeft(0L)(math.max)
  }

  /** Commit `df` as the next version; returns its sequence number.
    * Content does not depend on the current version, so a lost race
    * only costs a re-write against the next sequence number. */
  def put(spark: SparkSession, df: DataFrame, root: String): Long = {
    val (f, p) = fs(spark, root)
    var attempts = 0
    while (attempts < 20) {
      val seq = maxSeqOnDisk(f, p) + 1
      val dataName = s"data-${fmtSeq(seq)}-" +
        java.util.UUID.randomUUID().toString.take(8)
      df.write.parquet(new Path(p, dataName).toString)
      if (tryCreateLogEntry(f, p, seq, dataName)) return seq
      f.delete(new Path(p, dataName), true) // lost the race; retry
      attempts += 1
    }
    throw new java.io.IOException(
      s"versioned commit on $root lost ${attempts} races — giving up")
  }

  /** Optimistic read-modify-write: `transform` runs against the
    * LATEST version and the result commits only if that version is
    * still latest; otherwise the whole attempt re-runs (the Delta
    * concurrency rule — a stale transform never overwrites a
    * concurrent commit). */
  def commit(spark: SparkSession, root: String)(
      transform: DataFrame => DataFrame): Long = {
    val (f, p) = fs(spark, root)
    var attempts = 0
    while (attempts < 20) {
      val base = currentEntry(spark, root).getOrElse(
        throw new IllegalStateException(s"no versions at $root — put() first"))
      val seq = math.max(base.seq, maxSeqOnDisk(f, p)) + 1
      val dataName = s"data-${fmtSeq(seq)}-" +
        java.util.UUID.randomUUID().toString.take(8)
      transform(spark.read.parquet(new Path(p, base.dataDir).toString))
        .write.parquet(new Path(p, dataName).toString)
      if (tryCreateLogEntry(f, p, seq, dataName)) return seq
      f.delete(new Path(p, dataName), true)
      attempts += 1
    }
    throw new java.io.IOException(
      s"versioned commit on $root lost ${attempts} races — giving up")
  }

  /** The commit point. The entry's CONTENT is written to a hidden
    * temp file first and the visible `.commit` name appears only
    * fully-formed — so a reader can never observe a half-written
    * entry (which would read as torn and let a concurrent commit()
    * base on the version BEFORE it: a lost update).
    *
    * The publish primitive must be CREATE-EXCLUSIVE: first writer of
    * a sequence wins, the loser learns it lost. On a plain local FS
    * `rename(2)` silently REPLACES an existing destination, so
    * exists()+rename() would let two racing writers both "win" seq N
    * — one commit overwritten while its writer believes it succeeded
    * (lost update + an orphaned data dir the vacuum rules treat as
    * committed). For `file:` the entry is therefore published with
    * `link(2)` (`Files.createLink`), which atomically fails with
    * EEXIST when the name is taken — the classic local-FS lock-file
    * primitive. On HDFS rename itself is atomic and refuses an
    * existing destination; object stores substitute PUT-if-absent. */
  private[graft] def tryCreateLogEntry(f: FileSystem, root: Path, seq: Long,
                                       dataName: String): Boolean = {
    val log = new Path(root, LogDirName)
    if (!f.exists(log)) f.mkdirs(log)
    val entry = new Path(log, s"${fmtSeq(seq)}.commit")
    val tmp = new Path(log,
      s".tmp-${fmtSeq(seq)}-${java.util.UUID.randomUUID().toString.take(8)}")
    try {
      // the trailing newline is a COMPLETENESS TERMINATOR: history()
      // only trusts entries that end with it, so a torn fill (the
      // create-exclusive fallback crashing mid-write) can never
      // surface as a valid commit naming a garbage data dir
      val out = f.create(tmp, /* overwrite = */ true)
      try out.write((dataName + "\n")
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      finally out.close()
      val won =
        if ("file" == f.getUri.getScheme) publishLocalExclusive(f, tmp, entry)
        else !f.exists(entry) && f.rename(tmp, entry) // HDFS: atomic no-overwrite
      if (!won) try f.delete(tmp, false) catch { case _: Exception => }
      else if ("file" == f.getUri.getScheme)
        try f.delete(tmp, false) catch { case _: Exception => } // linked, drop alias
      won
    } catch { case _: java.io.IOException =>
      try f.delete(tmp, false) catch { case _: Exception => }
      false
    }
  }

  /** Atomic local publish: hard-link tmp to the final name. `link(2)`
    * fails with EEXIST if the destination exists — true one-winner
    * semantics with the content already complete at link time. Falls
    * back to O_CREAT|O_EXCL claim-then-fill on filesystems without
    * hard links — those surface as FileSystemException (EPERM/ENOTSUP
    * from VFAT/some NFS/SMB), NOT UnsupportedOperationException, so
    * the catch must cover both or the fallback is unreachable and
    * every commit on such a mount "loses 20 races". A fill that fails
    * deletes the claimed name; a crash mid-fill leaves an entry
    * without the completeness terminator, which history() skips (and
    * maxSeqOnDisk still counts the claimed sequence, so no later
    * writer reuses it). */
  private def publishLocalExclusive(f: FileSystem, tmp: Path,
                                    entry: Path): Boolean = {
    val tmpLocal = java.nio.file.Paths.get(f.makeQualified(tmp).toUri)
    val entryLocal = java.nio.file.Paths.get(f.makeQualified(entry).toUri)
    try { java.nio.file.Files.createLink(entryLocal, tmpLocal); true }
    catch {
      case _: java.nio.file.FileAlreadyExistsException => false
      case _: UnsupportedOperationException | _: java.nio.file.FileSystemException =>
        try {
          val ch = java.nio.file.Files.newByteChannel(entryLocal,
            java.nio.file.StandardOpenOption.WRITE,
            java.nio.file.StandardOpenOption.CREATE_NEW)
          try ch.write(java.nio.ByteBuffer.wrap(
            java.nio.file.Files.readAllBytes(tmpLocal)))
          catch { case e: Throwable =>
            // never leave a claimed-but-torn entry behind if we can
            // help it; if this delete also fails, the missing
            // terminator keeps the entry invisible to history()
            try java.nio.file.Files.deleteIfExists(entryLocal)
            catch { case _: Exception => }
            throw e
          }
          finally ch.close()
          true
        } catch {
          case _: java.nio.file.FileAlreadyExistsException => false
          case _: java.io.IOException => false
        }
    }
  }

  def read(spark: SparkSession, root: String): DataFrame =
    readEntry(spark, root, currentEntry(spark, root).getOrElse(
      throw new IllegalStateException(s"no versions at $root")))

  /** Time travel: the table as of commit `seq`. */
  def readAt(spark: SparkSession, root: String, seq: Long): DataFrame = {
    val e = history(spark, root).find(_.seq == seq).getOrElse(
      throw new IllegalArgumentException(s"no version $seq at $root"))
    readEntry(spark, root, e)
  }

  private def readEntry(spark: SparkSession, root: String, e: Entry): DataFrame =
    spark.read.parquet(new Path(new Path(root), e.dataDir).toString)

  /** O(1) rollback: a NEW commit whose entry points at version
    * `toSeq`'s data dir. History is preserved; no data moves. */
  def rollback(spark: SparkSession, root: String, toSeq: Long): Long = {
    val (f, p) = fs(spark, root)
    val target = history(spark, root).find(_.seq == toSeq).getOrElse(
      throw new IllegalArgumentException(s"no version $toSeq at $root"))
    var attempts = 0
    while (attempts < 20) {
      val seq = maxSeqOnDisk(f, p) + 1
      if (tryCreateLogEntry(f, p, seq, target.dataDir)) return seq
      attempts += 1
    }
    throw new java.io.IOException(s"rollback on $root lost $attempts races")
  }

  /** Delete data dirs not referenced by any of the last `keepLast`
    * commits (rollback aliases counted by REFERENCE, so a dir shared
    * by several entries survives while any survivor names it).
    *
    * In-flight protection is two guards, both required: the dir's
    * embedded sequence must be ≤ the current max (a writer building
    * the NEXT version is never touched), AND the dir must be older
    * than `retentionMs` (a writer whose allocated sequence was
    * concurrently taken by another commit is still mid-write when its
    * seq ≤ max — the age floor is what protects it, the Delta
    * tombstone-retention rule). Returns the deleted dir names. */
  def vacuum(spark: SparkSession, root: String, keepLast: Int,
             retentionMs: Long = 60L * 60 * 1000): Seq[String] = {
    val (f, p) = fs(spark, root)
    val h = history(spark, root)
    if (h.isEmpty) return Seq.empty
    val maxSeq = h.last.seq
    val cutoff = System.currentTimeMillis() - retentionMs
    val referenced = h.takeRight(math.max(1, keepLast)).map(_.dataDir).toSet
    val deletable = f.listStatus(p).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("data-") &&
        st.getModificationTime <= cutoff)
      .map(_.getPath.getName)
      .filterNot(referenced)
      .filter { name =>
        Try(name.stripPrefix("data-").take(20).toLong).toOption
          .exists(_ <= maxSeq)
      }
    deletable.foreach(n => f.delete(new Path(p, n), true))
    deletable
  }
}
