package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Format-agnostic read/write surface.
  *
  * The reference's only "connectors" are a Cosmos container and a raw local
  * file (`BigDataLogControl.cs:196,354-361`); the engine generalizes to the
  * lakehouse formats. Parquet is the primary (columnar, pushdown-friendly,
  * the only sane choice at 100 TB); CSV/JSON exist for ingest/egress edges,
  * always with an explicit schema — schema inference reads the data twice
  * and infers wrong under drift, so it is deliberately not exposed.
  */
object Sources {

  def read(spark: SparkSession, path: String, format: String,
           schema: Option[StructType] = None): DataFrame = {
    val r = spark.read.format(format)
    val withSchema = schema.fold(r)(r.schema)
    format match {
      case "csv" => withSchema.option("header", "true").load(path)
      // XML is first-class in Spark 4 (the old spark-xml package moved into
      // spark-sql); rowTag names the repeated element that becomes a row
      case "xml" => withSchema.option("rowTag", "row").load(path)
      case _     => withSchema.load(path)
    }
  }

  def write(df: DataFrame, path: String, format: String,
            partitionBy: Seq[String] = Nil, mode: String = "overwrite"): Unit = {
    val w = df.write.format(format).mode(mode)
    val withPart = if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w
    format match {
      case "csv" => withPart.option("header", "true").save(path)
      case "xml" => withPart.option("rowTag", "row").save(path)
      case _     => withPart.save(path)
    }
  }

  /** Single-file export (driver-side consumers, reports). `coalesce(1)`
    * funnels the final write through one task — only sane for small
    * results, which is what single-file outputs are for.
    */
  def writeSingleFile(df: DataFrame, path: String, format: String = "parquet"): Unit =
    write(df.coalesce(1), path, format)

  /** Directory of raw files → (path, modificationTime, length, content)
    * rows — the multimodal ingest edge: images/audio/video arrive as FILES,
    * and this is the distributed file-to-row scan that feeds the
    * `Multimodal` operators. Each file is read by whichever task owns it
    * (no driver-side listing of contents), and `pathGlobFilter` prunes at
    * the listing, before any bytes are read.
    */
  def readBinaryFiles(spark: SparkSession, path: String,
                      globFilter: Option[String] = None): DataFrame = {
    val r = spark.read.format("binaryFile")
    globFilter.fold(r)(g => r.option("pathGlobFilter", g)).load(path)
  }
}
