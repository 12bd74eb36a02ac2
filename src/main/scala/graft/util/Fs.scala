package graft.util

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** Storage-agnostic filesystem probes via Hadoop's FileSystem API.
  *
  * The engine's destination paths are HDFS/S3/GCS at cluster scale; any
  * `java.nio.file` check silently returns false there (the path is not a
  * local file), which in Exact mode would drop the boundary-partition carry
  * rows on dynamic overwrite — data loss. Everything path-existence-shaped
  * must go through here.
  */
object Fs {

  private def fs(spark: SparkSession, path: String): (FileSystem, Path) = {
    val p = new Path(path)
    (p.getFileSystem(spark.sessionState.newHadoopConf()), p)
  }

  def exists(spark: SparkSession, path: String): Boolean = {
    val (f, p) = fs(spark, path)
    f.exists(p)
  }

  /** Recursive listing of data-file (path, length) pairs under `path`;
    * empty if the path does not exist.
    */
  def listParquetFiles(spark: SparkSession, path: String): Seq[(String, Long)] = {
    val (f, p) = fs(spark, path)
    if (!f.exists(p)) return Seq.empty
    val it = f.listFiles(p, true)
    val out = Seq.newBuilder[(String, Long)]
    while (it.hasNext) {
      val st = it.next()
      if (st.getPath.getName.endsWith(".parquet"))
        out += ((st.getPath.toString, st.getLen))
    }
    out.result()
  }

  /** True if at least one parquet data file exists under `path` (a write of
    * an empty DataFrame leaves a _SUCCESS marker but no data files, and a
    * fileless directory fails schema inference on read-back).
    */
  def hasParquetFiles(spark: SparkSession, path: String): Boolean =
    listParquetFiles(spark, path).nonEmpty
}
