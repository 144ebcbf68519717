package graft.ops

/** Shared lake-directory listing — the ONE place that knows which
  * entries count as data (bookkeeping files like `_SUCCESS`,
  * `_checkpoints` and hidden `.`-prefixed entries are not storage).
  * Used by the footprint report and the complete-view root probe so
  * the convention cannot drift between them. Driver-side filesystem
  * METADATA: cost is O(files) name ops, never O(bytes). */
object LakeFiles {

  private def isData(name: String): Boolean =
    !name.startsWith("_") && !name.startsWith(".")

  /** All data files under `dir`, recursive: (file name, length).
    * Empty if the path does not exist. */
  def dataFiles(conf: org.apache.hadoop.conf.Configuration,
                dir: String): Seq[(String, Long)] = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(conf)
    if (!fs.exists(p)) Seq.empty
    else {
      val it = fs.listFiles(p, true)
      val buf = scala.collection.mutable.ArrayBuffer.empty[(String, Long)]
      while (it.hasNext) {
        val st = it.next()
        if (st.isFile && isData(st.getPath.getName))
          buf += ((st.getPath.getName, st.getLen))
      }
      buf.toSeq
    }
  }

  /** Does `dir` hold any data file at all? (Early-exits the listing.) */
  def hasData(conf: org.apache.hadoop.conf.Configuration, dir: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(conf)
    fs.exists(p) && {
      val it = fs.listFiles(p, true)
      var found = false
      while (!found && it.hasNext) {
        val st = it.next()
        found = st.isFile && isData(st.getPath.getName)
      }
      found
    }
  }
}
