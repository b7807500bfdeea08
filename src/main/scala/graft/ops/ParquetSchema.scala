package graft.ops

import org.apache.hadoop.fs.Path
import org.apache.parquet.format.converter.ParquetMetadataConverter
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.{DataType, StructType}

/** Driver-side parquet schema resolution for single files and FLAT
  * part-file directories (the fixture tables and committed model
  * artifacts).
  *
  * Why: `spark.read.parquet(path)` runs schema INFERENCE, which submits a
  * cluster job to read footers (`ParquetUtils.readParquetFootersInParallel`)
  * — measured 111 ms per `DataFrame` build / ~250 ms per read+count at
  * sf0.1 vs 15 ms with an explicit schema (`ReadOverheadLab`, round-18
  * optimization). Every registry query pays it 1–3×, so the inference
  * job alone was ~20–40% of the whole bench. Reading ONE footer on the
  * driver (the exact thing inference does for a flat non-merging read,
  * guide §6 "listing/planning time on the driver") costs ~2 ms and zero
  * jobs, at any scale — model artifacts and fixture tables are single
  * files / single-digit part counts, never large trees.
  *
  * Exactness: mirrors Spark's own inference for the mergeSchema=false
  * single-footer case —
  *   - a Spark-written footer carries the serialized schema under
  *     `org.apache.spark.sql.parquet.row.metadata`; inference uses it
  *     verbatim (`ParquetFileFormat.readSchemaFromFooter`), so we do too;
  *   - otherwise the footer's MessageType is converted with Spark's own
  *     `ParquetToSparkSchemaConverter` under the session's SQLConf (so
  *     `nanosAsLong`, int96/binary flags behave identically);
  *   - file-source relations force nullable columns (`asNullable` in
  *     `DataSource`), mirrored here.
  * Byte-identity with inference is spec-pinned per fixture table and
  * artifact in `ParquetSchemaSpec`. Hive-partitioned trees (the ivfpq /
  * dedup index roots) are NOT handled — `of` returns None and callers
  * fall back to plain inference, which also discovers partition columns.
  */
object ParquetSchema {

  private val SparkMetadataKey = "org.apache.spark.sql.parquet.row.metadata"

  /** The schema `spark.read.parquet(path)` would infer, resolved on the
    * driver from one footer; None when the layout is not a plain file /
    * flat part directory (caller falls back to inference).
    */
  def of(spark: SparkSession, path: String): Option[StructType] =
    try {
      val conf = spark.sessionState.newHadoopConf()
      val p = new Path(path)
      val fs = p.getFileSystem(conf)
      val st = fs.getFileStatus(p)
      val dataFiles: Seq[Path] =
        if (!st.isDirectory) Seq(st.getPath)
        else {
          val entries = fs.listStatus(p)
          // flat part directory only: any subdirectory (hive partitioning)
          // means inference must discover partition columns — bail out.
          // Summary files (_metadata/_common_metadata) also bail: Spark's
          // inference would prefer them, and their presence marks a
          // multi-writer/evolved directory this fast path must not guess
          // about (r18 advice).
          if (entries.exists(_.isDirectory) ||
              entries.exists { e =>
                val n = e.getPath.getName
                n == "_metadata" || n == "_common_metadata"
              }) Seq.empty
          else entries.iterator
            .map(_.getPath)
            .filter { f =>
              val n = f.getName
              n.endsWith(".parquet") && !n.startsWith("_") && !n.startsWith(".")
            }
            .toSeq.sortBy(_.getName)
        }
      // multi-part directories: every footer must resolve to the SAME
      // schema, else inference (which merges/first-picks under its own
      // rules) could legitimately differ — bail to it. Footers are ~2 ms
      // each on the driver; cap the check so a huge flat directory falls
      // back to the cluster job instead of serializing on the driver.
      if (dataFiles.isEmpty || dataFiles.length > 32) None
      else {
        val schemas = dataFiles.map { f =>
          val footer = ParquetFileReader.readFooter(
            conf, f, ParquetMetadataConverter.SKIP_ROW_GROUPS)
          val meta = footer.getFileMetaData
          val fromSparkMeta =
            Option(meta.getKeyValueMetaData.get(SparkMetadataKey))
              .flatMap { json =>
                scala.util.Try(
                  DataType.fromJson(json).asInstanceOf[StructType]).toOption
              }
          val schema = fromSparkMeta.getOrElse {
            new org.apache.spark.sql.execution.datasources.parquet
              .ParquetToSparkSchemaConverter(spark.sessionState.conf)
              .convert(meta.getSchema)
          }
          asNullable(schema) // file-source relations are always nullable
        }
        if (schemas.distinct.length == 1) Some(schemas.head) else None
      }
    } catch { case scala.util.control.NonFatal(_) => None }

  /** `StructType.asNullable` is `private[spark]` — same recursion: file
    * sources expose every column (and nested field/element) as nullable.
    */
  private def asNullable(s: StructType): StructType =
    nullableType(s).asInstanceOf[StructType]

  private def nullableType(dt: DataType): DataType = dt match {
    case s: StructType => StructType(s.fields.map(f =>
      f.copy(dataType = nullableType(f.dataType), nullable = true)))
    case a: org.apache.spark.sql.types.ArrayType =>
      a.copy(elementType = nullableType(a.elementType), containsNull = true)
    case m: org.apache.spark.sql.types.MapType =>
      m.copy(keyType = nullableType(m.keyType),
        valueType = nullableType(m.valueType), valueContainsNull = true)
    case other => other
  }

  /** `spark.read.parquet(path)` with the inference job skipped when the
    * schema resolves on the driver (identical rows either way).
    */
  def read(spark: SparkSession, path: String): DataFrame =
    of(spark, path) match {
      case Some(s) => spark.read.schema(s).parquet(path)
      case None => spark.read.parquet(path)
    }
}
