package graft.core

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** Single-sourced Hadoop FileSystem resolution — every connector/operator
  * that touches storage resolves through here, so the engine stays
  * scheme-agnostic (file:, hdfs:, s3a:, the test suite's memfs:) with no
  * `java.io.File` assumptions anywhere. */
object HadoopFs {
  def of(spark: SparkSession, path: String): (FileSystem, Path) = {
    val p = new Path(path)
    (p.getFileSystem(spark.sparkContext.hadoopConfiguration), p)
  }
}
