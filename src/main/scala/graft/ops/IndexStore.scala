package graft.ops

/** Persisted-index lifecycle shared by every `*_probe` regime (IVF, radix
  * LSH, equal-mass LSH, text MinHash-LSH): a deterministic recipe writes
  * its index ONCE per (scale-factor dir, source-data fingerprint) under
  * the JVM temp root, and probes only ever read a COMPLETE index.
  *
  * Two invariants carry the whole design:
  *   - The directory NAME embeds a fingerprint of the exact source bytes
  *     (name + size + mtime of every data file), so regenerating testdata
  *     in place can never serve a stale index — the new fingerprint
  *     simply misses and the next probe rebuilds.
  *   - Builds stage into `dir.tmp.<pid>` and ATOMIC-rename into place, so
  *     a concurrent JVM building the same (fingerprinted, hence identical
  *     — recipes are deterministic) index either wins the rename or finds
  *     the winner's complete directory and discards its own staging copy.
  *     No reader ever sees a half-written index.
  */
object IndexStore {

  /** Fingerprint of the source data under `root` (a parquet file or
    * directory of parts): name + length + mtime of every non-hidden file,
    * in sorted order, murmur3-hashed to hex.
    */
  def sourceFingerprint(root: String): String = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles().toSeq.sortBy(_.getName).flatMap(walk) else Seq(f)
    val sig = walk(new java.io.File(root))
      .filterNot(_.getName.startsWith("_"))
      .map(p => s"${p.getName}:${p.length}:${p.lastModified}")
      .mkString("|")
    java.lang.Integer.toHexString(scala.util.hashing.MurmurHash3.stringHash(sig))
  }

  /** Canonical index directory for `family` (a versioned name like
    * "graft_ivf_v5" — bump the version when the index FORMAT or recipe
    * changes), keyed by scale-factor tag + source fingerprint.
    */
  def indexDir(family: String, sf: String, sourcePath: String): String = {
    val tag = sf.replaceAll("[^A-Za-z0-9.]+", "_")
    s"${sys.props("java.io.tmpdir")}/$family/${tag}_${sourceFingerprint(sourcePath)}"
  }

  /** Build-if-absent: if `dir/marker` exists the index is complete and is
    * returned as-is (the dir name embeds the source fingerprint, so an
    * existing index IS the one this build would produce); otherwise
    * `write` populates a staging dir which is then atomically committed.
    */
  def buildOnce(dir: String, marker: String)(write: String => Unit): String = {
    if (new java.io.File(s"$dir/$marker").exists()) return dir
    val staging = java.nio.file.Paths.get(
      s"$dir.tmp.${java.lang.ProcessHandle.current().pid()}")
    write(staging.toString)
    commitAtomically(staging, dir, marker)
    dir
  }

  /** Atomic-rename `staging` into place as `dir`. Linux rename(2) onto an
    * existing non-empty dir surfaces as a GENERIC FileSystemException
    * (ENOTEMPTY), not the typed DirectoryNotEmptyException — catch the
    * superclass, then verify the winner's `marker` file really exists
    * before discarding our staging copy.
    */
  def commitAtomically(
      staging: java.nio.file.Path, dir: String, marker: String): Unit = {
    try
      java.nio.file.Files.move(staging, java.nio.file.Paths.get(dir),
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    catch {
      case e: java.nio.file.FileSystemException =>
        if (!new java.io.File(s"$dir/$marker").exists()) throw e
        val walk = java.nio.file.Files.walk(staging)
        try
          walk.sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
            .forEach(p => java.nio.file.Files.delete(p))
        finally walk.close()
    }
  }
}
