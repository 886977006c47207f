package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 provider for the weight-tracker TXT format — the
  * `spark.read.format("weighttxt")` ergonomics SURVEY §7.3 lists as the
  * optional upgrade over the flatMap parser (both share
  * [[WeightTxt.parseContent]]).
  *
  * Layout: one InputPartition per file, so a directory of exports fans
  * out across executors; each partition reader parses its file
  * executor-side and emits the fixed 8-column EAV schema. At 100 TB of
  * small files the file list itself would come from a catalog/manifest
  * instead of a driver listing — the partition-per-file read path is the
  * part that scales.
  *
  * Usage: `spark.read.format("weighttxt").load("/path/to/dir")`.
  */
class WeightTxtV2 extends TableProvider {

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    WeightTxtV2.Schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new WeightTxtTable(properties.get("path"))
}

object WeightTxtV2 {
  val Schema: StructType = org.apache.spark.sql.Encoders.product[WeightReading].schema
}

class WeightTxtTable(path: String) extends Table with SupportsRead {
  override def name(): String = s"weighttxt(`$path`)"
  override def schema(): StructType = WeightTxtV2.Schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    () => new Scan {
      override def readSchema(): StructType = WeightTxtV2.Schema
      override def toBatch: Batch = new WeightTxtBatch(path)
    }
}

/** One partition per file. */
case class WeightTxtPartition(filePath: String) extends InputPartition

class WeightTxtBatch(path: String) extends Batch {

  /** File listing through the Hadoop FileSystem API (as FileStoreSync's
    * listing does) so the source works on any supported filesystem —
    * HDFS/object stores, not just local files. Driver-side listing; at
    * 100 TB of small files this would come from a catalog/manifest. */
  override def planInputPartitions(): Array[InputPartition] = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(
      org.apache.spark.sql.SparkSession.active.sparkContext.hadoopConfiguration)
    val files =
      if (fs.getFileStatus(p).isDirectory) {
        val it = fs.listFiles(p, true)
        val buf = scala.collection.mutable.ArrayBuffer.empty[String]
        while (it.hasNext) {
          val st = it.next()
          if (st.isFile && st.getPath.getName.endsWith(".txt"))
            buf += st.getPath.toString
        }
        buf.toArray
      } else Array(p.toString)
    files.sorted.map(f => WeightTxtPartition(f): InputPartition)
  }

  override def createReaderFactory(): PartitionReaderFactory =
    (partition: InputPartition) =>
      new WeightTxtPartitionReader(partition.asInstanceOf[WeightTxtPartition].filePath)
}

class WeightTxtPartitionReader(filePath: String) extends PartitionReader[InternalRow] {

  private lazy val rows: Iterator[WeightReading] = {
    val p = new org.apache.hadoop.fs.Path(filePath)
    // executor-side: hadoopConfiguration isn't reachable; default conf
    // resolves the scheme (file://, hdfs://) carried in the path itself
    val fs = p.getFileSystem(new org.apache.hadoop.conf.Configuration())
    val in = fs.open(p)
    val content =
      try new String(org.apache.hadoop.io.IOUtils.readFullyToByteArray(in), "UTF-8")
      finally in.close()
    val fileId = p.getName
    WeightTxt.parseContent(content, fileId).iterator
  }
  private var current: WeightReading = _

  override def next(): Boolean =
    if (rows.hasNext) { current = rows.next(); true } else false

  override def get(): InternalRow =
    InternalRow.fromSeq(Seq(
      current.day_name, current.date, current.time, current.attribute,
      current.value, current.info_symbol, current.info_txt, current.source_file_id)
      .map(s => UTF8String.fromString(s)))

  override def close(): Unit = ()
}
