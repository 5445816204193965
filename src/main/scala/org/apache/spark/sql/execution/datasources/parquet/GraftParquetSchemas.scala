package org.apache.spark.sql.execution.datasources.parquet

import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.{Footer, ParquetFileReader}
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types.{IntegerType, StructField, StructType}

/** Driver-side stand-in for the one-task Spark JOB that
  * `spark.read.parquet(dir).schema` dispatches to resolve a directory's
  * schema (r15, guide §1.2 — the last removable job class in the catalog
  * lifecycles after the r14 cuts).
  *
  * Parity by construction, not by reimplementation: the footer is run
  * through the SAME machinery the inference job's task runs —
  * [[ParquetFileFormat.readSchemaFromFooter]] first deserializes the
  * Catalyst schema Spark itself serialized into the footer at write time
  * (every graft version/sidecar dir is Spark-written, so this is the exact
  * logical schema of the write), falling back to Spark's parquet→Catalyst
  * converter for foreign files; file relations then surface every field
  * nullable, which is the `asNullable` step below (pinned empirically
  * against real inference, dir by dir, in ParquetSchemaParitySpec). With
  * `mergeSchema=false` (graft never sets it) the inference job reads ONE
  * footer too, so this is the identical read minus the task dispatch.
  *
  * Lives in Spark's parquet package because `readSchemaFromFooter`,
  * `ParquetToSparkSchemaConverter` and `DataType.asNullable` are
  * private[parquet]/private[spark]. */
object GraftParquetSchemas {

  /** Schema of the parquet directory, resolved from the first data file's
    * footer on the driver — zero Spark jobs. Handles the ONE partitioned
    * layout graft ever writes (a single `__cell=<int>` level under IVF full
    * snapshots — GraftCatalog.CellCol), appending the partition column
    * exactly as discovery does (IntegerType, at the end; pinned against
    * real inference by ParquetSchemaParitySpec). Throws (like inference)
    * when the dir has no readable data file, and deliberately throws on any
    * OTHER directory shape; callers fall back to the inference job on any
    * failure, so this path can only ever remove the job, not change the
    * schema. */
  def fromFooter(spark: SparkSession, dir: String): StructType = {
    val p = new Path(dir)
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = p.getFileSystem(conf)
    val children = fs.listStatus(p).filterNot { st =>
      val n = st.getPath.getName
      // Spark's listing filter: `_`/`.`-prefixed entries are metadata,
      // EXCEPT partition directories (`name=value` — e.g. `__cell=0`)
      (n.startsWith("_") || n.startsWith(".")) && !n.contains("=")
    }
    val data = children.filter(st => st.isFile && st.getLen > 0)
    val (leafDir, cellPartitioned) =
      if (data.nonEmpty) (p, false)
      else {
        // no direct data files: accept exactly graft's IVF cell layout —
        // every child a `__cell=<int>` directory — and read one leaf;
        // anything else is not a layout this helper knows, so refuse and
        // let the caller's inference fallback resolve it
        val cellDirs = children.filter(st => st.isDirectory &&
          st.getPath.getName.matches("__cell=\\d+"))
        require(cellDirs.nonEmpty && cellDirs.length == children.length,
          s"no data files and not an IVF cell layout under $dir")
        (cellDirs.minBy(_.getPath.getName).getPath, true)
      }
    val leafData =
      if (data.nonEmpty) data
      else fs.listStatus(leafDir).filter { st =>
        val n = st.getPath.getName
        st.isFile && !n.startsWith("_") && !n.startsWith(".") && st.getLen > 0
      }
    require(leafData.nonEmpty, s"no data files under $leafDir")
    // any data file works: a graft version/sidecar dir is one Spark write,
    // one schema — the same assumption the non-merging inference job makes
    val st = leafData.minBy(_.getPath.getName)
    val in = ParquetFileReader.open(HadoopInputFile.fromStatus(st, conf))
    val meta = try in.getFooter finally in.close()
    val footer = new Footer(st.getPath, meta)
    val converter = new ParquetToSparkSchemaConverter(spark.sessionState.conf)
    val fileSchema = ParquetFileFormat.readSchemaFromFooter(footer, converter)
      .asNullable.asInstanceOf[StructType]
    if (!cellPartitioned) fileSchema
    // partition discovery appends partition columns after the data columns;
    // integral `__cell` values infer as IntegerType, nullable like every
    // discovered partition column
    else fileSchema.add(StructField("__cell", IntegerType, nullable = true))
  }
}
