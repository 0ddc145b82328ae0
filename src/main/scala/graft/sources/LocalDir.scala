package graft.sources

import java.io.File

/** Local-filesystem lifecycle helpers shared by the on-disk index and
  * run-log directories (Similarity's IVF/PQ indexes, kv.KVLog). On a
  * cluster these layouts live on HDFS/object storage and lifecycle is
  * the catalog's job; locally the builders clean up after themselves.
  */
object LocalDir {

  /** Recursive delete; tolerant of concurrent removal (null
    * `listFiles`) — best-effort, like the index rebuilds that use it. */
  def deleteRecursively(f: File): Unit = {
    if (f.isDirectory)
      Option(f.listFiles()).getOrElse(Array.empty[File]).foreach(deleteRecursively)
    f.delete(): Unit
  }

  /** Drop sibling directories of `keep` that share `prefix` — stale
    * mtime-versions of a rebuilt index. `pqFamily` selects between
    * the `_pq` PQ-index generation family and everything else, so
    * each index family cleans only its own generations. */
  def dropStaleSiblings(keep: File, prefix: String, pqFamily: Boolean): Unit =
    Option(keep.getParentFile.listFiles()).getOrElse(Array.empty[File])
      .filter(f => f.getName.startsWith(prefix) &&
        f.getPath != keep.getPath &&
        f.getName.endsWith("_pq") == pqFamily)
      .foreach(deleteRecursively)
}
