package graft.core

import org.apache.hadoop.fs.{FileSystem, Path}

/** The POINTER half of the crash-atomic APPEND protocol — the append-side
  * twin of the ivm state folds' `_commits` pointer mode
  * ([[IngestionRunner]]): on object stores without atomic directory
  * rename, a batch's data lands under a deterministically-named
  * `batch-p-<key>` directory (a crashed attempt is simply overwritten in
  * place by the rerun — nothing dangles), and the batch becomes visible
  * through ONE create-no-overwrite `_commits/<key>` file (conditional-PUT
  * semantics). Readers include a `batch-p-*` directory only when its
  * commit file exists, so a torn write is never read; rename-published
  * `batch-<key>` units (the POSIX default) are their own commit and read
  * unconditionally. Appends are single-writer per store; a failed
  * conditional create means another writer published this batch key
  * concurrently — surfaced as an error (the pointer's job is detection,
  * exactly the ivm stance), never silently merged.
  */
object AppendCommits {

  val PointerPrefix = "batch-p-"

  private def commitsDir(root: Path) = new Path(root, "_commits")

  def isCommitted(fs: FileSystem, root: Path, key: String): Boolean =
    fs.exists(new Path(commitsDir(root), key))

  def committedKeys(fs: FileSystem, root: Path): Set[String] = {
    val dir = commitsDir(root)
    if (!fs.exists(dir)) Set.empty
    else fs.listStatus(dir).map(_.getPath.getName).toSet
  }

  /** Publish batch `key`: create `_commits/<key>` with overwrite=false.
    * The create FAILS if another writer committed this key first — a
    * lost race is surfaced, not retried (the data directory is shared by
    * key, so a concurrent writer may have interleaved with ours).
    *
    * Atomicity caveat: `create(overwrite=false)` is a true conditional
    * create on HDFS and local filesystems; on plain S3A (without
    * conditional-create / If-None-Match support enabled) it degrades to
    * check-then-act, so the lost-race DETECTION is best-effort there.
    * The actual safety boundary is the single-writer-per-store contract
    * this protocol assumes — the marker's job is to catch violations of
    * it, not to serialize concurrent writers. */
  def commit(fs: FileSystem, root: Path, key: String): Unit = {
    fs.mkdirs(commitsDir(root))
    val marker = new Path(commitsDir(root), key)
    try {
      val out = fs.create(marker, false)
      try out.write(Array.emptyByteArray) finally out.close()
    } catch {
      case e: java.io.IOException if fs.exists(marker) =>
        throw new IllegalStateException(
          s"pointer append lost a commit race at $marker — another " +
            "writer published this batch key concurrently; appends are " +
            "single-writer per store", e)
    }
  }

  /** The readable data paths under `table`: root-level files (plain
    * appends), rename-published `batch-*` directories, and `batch-p-*`
    * directories whose key is in `commits`. Hidden (`.`/`_`) entries are
    * skipped; a crashed rename's `.tmp-*` or an uncommitted pointer dir
    * is never read. */
  def readablePaths(fs: FileSystem, table: Path,
                    commits: Set[String]): Seq[Path] = {
    if (!fs.exists(table)) return Seq.empty
    fs.listStatus(table).toSeq.flatMap { st =>
      val n = st.getPath.getName
      if (n.startsWith(".") || n.startsWith("_")) None
      else if (!st.isDirectory) Some(st.getPath)
      else if (n.startsWith(PointerPrefix))
        if (commits.contains(n.stripPrefix(PointerPrefix))) Some(st.getPath)
        else None
      else Some(st.getPath)
    }
  }
}
