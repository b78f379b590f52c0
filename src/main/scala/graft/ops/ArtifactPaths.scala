package graft.ops

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Path hygiene for the build-once/merge-grow artifact family
  * ([[LmIndex]], [[MinhashIndex]]): a merge that writes where it reads
  * would overwrite-delete its own input before the lazy union plan ever
  * reads it (mode=overwrite clears the target first; Spark plans are
  * lazy, so the "read" happens after the delete). */
object ArtifactPaths {
  /** Fail fast when `outDir` resolves to the same location as `dir`.
    * Paths are made filesystem-qualified (scheme + authority + working
    * directory) so `dir` vs `./dir` vs `file:/.../dir` compare equal. */
  def requireDistinct(spark: SparkSession, dir: String, outDir: String): Unit = {
    val conf = spark.sessionState.newHadoopConf()
    def qualified(p: String): Path = {
      val hp = new Path(p)
      hp.getFileSystem(conf).makeQualified(hp)
    }
    require(qualified(outDir) != qualified(dir),
      s"merge cannot run in place: outDir ($outDir) resolves to the input " +
        s"dir ($dir) — the overwrite would delete the artifact before the " +
        "union plan reads it. Write to a new directory (stage-and-rename " +
        "if the old path must be reused).")
  }
}
