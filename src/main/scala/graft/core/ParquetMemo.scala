package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Build-once parquet memoization for derived datasets that are a pure
  * function of a source table — synthetic media corpora, standing
  * indexes, pre-bucketed adjacency. The parquet writer's own `_SUCCESS`
  * marker is the build receipt, so a memoized build survives (and is
  * shared) across sessions/JVMs pointed at the same data dir; the cache
  * path embeds a fingerprint of the source parquet (name + length +
  * mtime of every part file) plus a caller version string, so a
  * regenerated fixture or a changed generator gets a FRESH build
  * instead of silently serving a stale one. Cross-JVM safety follows
  * the `Similarity.ensureIvfIndex` discipline: the build lands in a
  * per-process staging dir and is RENAMED into place (atomic on one
  * filesystem); the loser of a concurrent race deletes its staging copy
  * and uses the winner's. Superseded fingerprints of the same
  * (source, tag) are swept so /tmp holds at most one build per corpus.
  */
object ParquetMemo {

  private def sanitize(s: String): String = s.replaceAll("[^A-Za-z0-9._-]", "_")

  /** Deterministic cache location for (source file/dir, tag, version).
    * MD5 (not 32-bit hashCode) of the part-file listing: a fingerprint
    * collision after a corpus change would silently serve a stale
    * build as current. */
  def cachePath(srcFile: String, tag: String, version: String): String = {
    val src = new java.io.File(srcFile)
    val parts: Seq[java.io.File] =
      if (src.isDirectory)
        Option(src.listFiles()).getOrElse(Array.empty[java.io.File])
          .filter(f => f.getName.endsWith(".parquet") || f.getName == "_SUCCESS")
          .sortBy(_.getName).toSeq
      else Seq(src)
    val fpInput = parts.map(f => s"${f.getName}:${f.length}:${f.lastModified}")
      .mkString("|") + "|" + version
    val fp = java.security.MessageDigest.getInstance("MD5")
      .digest(fpInput.getBytes("UTF-8")).map(b => f"$b%02x").mkString.take(16)
    memoRoot +
      "/graft_memo_" + sanitize(srcFile) + "_" + sanitize(tag) + "_" + fp
  }

  /** Root directory for EVERY standing on-disk artifact (memo tables,
    * text/IVF indexes): the dedicated `graft.memo.root` property wins
    * (tests plant cold environments through it without mutating the
    * global java.io.tmpdir, which other JVM machinery reads), else
    * tmpdir. */
  def memoRoot: String =
    sys.props.getOrElse("graft.memo.root",
      sys.props.getOrElse("java.io.tmpdir", "/tmp"))

  /** Return the cache dir for `build`'s output, building at most once
    * per (source snapshot, tag, version). `build` is only evaluated on
    * a cache miss. */
  def ensure(srcFile: String, tag: String, version: String)
            (build: => DataFrame): String =
    ensureCore(srcFile, tag, version)(staging =>
      build.write.mode("overwrite").parquet(staging))

  /** Like [[ensure]] but DIRECTORY-PARTITIONED on `partitionCols` — the
    * layout for standing indexes probed by literal low-cardinality
    * filters (quantizer cells): the probe's `IN (...)` becomes a
    * PartitionFilter and unprobed directories are never opened.
    * The partition layout is folded into the fingerprint: the same
    * (srcFile, tag, version) used with [[ensure]], or with different
    * `partitionCols`, must never serve a cached build whose directory
    * layout doesn't match what this caller will read. */
  def ensurePartitioned(srcFile: String, tag: String, version: String,
      partitionCols: Seq[String])(build: => DataFrame): String =
    ensureCore(srcFile, tag,
        version + "|part=" + partitionCols.mkString(","))(staging =>
      build.write.mode("overwrite").partitionBy(partitionCols: _*)
        .parquet(staging))

  private def ensureCore(srcFile: String, tag: String, version: String)
      (writeTo: String => Unit): String = synchronized {
    val path = cachePath(srcFile, tag, version)
    val target = new java.io.File(path)
    if (!new java.io.File(target, "_SUCCESS").exists()) {
      // sweep stale fingerprints of this (source, tag) before building
      val prefix =
        "graft_memo_" + sanitize(srcFile) + "_" + sanitize(tag) + "_"
      // never sweep ".build." staging dirs: the object-level synchronized
      // only serializes within THIS JVM, and a concurrent cross-process
      // builder's in-flight staging dir matches the prefix too — deleting
      // it under that builder yields transient publish failures
      Option(target.getParentFile.listFiles()).getOrElse(Array.empty)
        .filter(f => f.getName.startsWith(prefix) &&
          f.getName != target.getName && !f.getName.contains(".build."))
        .foreach(deleteRecursively)
      val staging = new java.io.File(
        path + ".build." + java.lang.ProcessHandle.current().pid())
      try {
        writeTo(staging.getAbsolutePath)
        if (!staging.renameTo(target)) {
          // rename refused: a concurrent builder won (use theirs) or
          // something is genuinely wrong; never hand back an empty path
          deleteRecursively(staging)
          require(new java.io.File(target, "_SUCCESS").exists(),
            s"memoized build could not be published at $path")
        }
      } catch { case e: Throwable => deleteRecursively(staging); throw e }
    }
    path
  }

  /** Memoized read: ensure the build exists, then scan it. */
  def ensureRead(spark: SparkSession, srcFile: String, tag: String,
      version: String)(build: => DataFrame): DataFrame =
    spark.read.parquet(ensure(srcFile, tag, version)(build))

  private def deleteRecursively(f: java.io.File): Unit = {
    if (f.isDirectory)
      Option(f.listFiles()).getOrElse(Array.empty).foreach(deleteRecursively)
    f.delete(): Unit
  }
}
