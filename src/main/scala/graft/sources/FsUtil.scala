package graft.sources

import org.apache.hadoop.fs.Path

import org.apache.spark.sql.SparkSession

/** Storage-listing utilities (dags/scritps/transform.py:12-25): the
  * reference lists blobs under a prefix, sorts by update time and takes
  * the newest — the argmax over modification time. */
object FsUtil {

  /** Newest file under `dir` whose name starts with `prefix`; None if
    * the directory is empty/absent. */
  def latestFile(spark: SparkSession, dir: String,
      prefix: String = ""): Option[String] = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) return None
    fs.listStatus(p).toSeq
      .filter(s => s.isFile && s.getPath.getName.startsWith(prefix))
      .sortBy(-_.getModificationTime)
      .headOption
      .map(_.getPath.toString)
  }
}
