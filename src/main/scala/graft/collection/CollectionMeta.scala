package graft.collection

import org.apache.spark.sql.types._
import org.json4s.{DefaultFormats, Formats}
import org.json4s.jackson.Serialization

/** Declared metadata column of a collection — the engine's `Index` descriptor
  * (/root/reference/idl/proto/v4/edge.proto:44-49): name, type, nullability,
  * primary-key flag. `fieldType` ∈ {string, integer, float, boolean}
  * (edge v4's four value types, SURVEY.md §1.2-1.3). */
case class IndexField(
    name: String,
    fieldType: String,
    enableNull: Boolean = false,
    primaryKey: Boolean = false) {
  require(IndexField.types.contains(fieldType), s"unknown field type: $fieldType")

  def dataType: DataType = fieldType match {
    case "string"  => StringType
    case "integer" => LongType
    case "float"   => DoubleType
    case "boolean" => BooleanType
  }

  /** Typed default for nullable columns (edge_analyzer.go:86-99). */
  def defaultValue: Any = fieldType match {
    case "string"  => ""
    case "integer" => 0L
    case "float"   => 0.0
    case "boolean" => false
  }
}

object IndexField {
  val types = Set("string", "integer", "float", "boolean")
}

/** Collection configuration — mirrors the reference's collection `Metadata`
  * {dim, distance, quantization, index schema, versioning}
  * (/root/reference/edge/edge_metadata.go:22-35, proto v4 edge.proto:29-36).
  * Persisted as a JSON sidecar next to the parquet snapshot (§1.4 mapping of
  * the MinIO `<col>.meta.json` object). */
case class CollectionMeta(
    name: String,
    dim: Int,
    distance: String = "cosine",
    quantization: String = "none",
    fields: Seq[IndexField] = Seq.empty,
    versioning: Boolean = false,
    currentVersion: Int = 0) {
  require(dim > 0, "dim must be positive")
  require(Set("cosine", "euclidean", "manhattan", "dot").contains(distance), s"unknown distance: $distance")
  require(Set("none", "f16", "bf16", "f8").contains(quantization), s"unknown quantization: $quantization")
  require(fields.count(_.primaryKey) <= 1, "at most one primary key")
  fields.find(f => f.primaryKey && f.fieldType != "string").foreach { f =>
    // pk must be a string (edge_analyzer.go:46-52)
    throw new IllegalArgumentException(s"primary key ${f.name} must be of type string")
  }

  def primaryKey: Option[IndexField] = fields.find(_.primaryKey)

  /** The full storage schema: metadata columns + the vector column (float32
    * when unquantized; short-array/binary when quantized — §1.4). */
  def structType: StructType = {
    val metaFields = fields.map(f => StructField(f.name, f.dataType, nullable = f.enableNull))
    val vecType: DataType = quantization match {
      case "none"         => ArrayType(FloatType, containsNull = false)
      case "f16" | "bf16" => ArrayType(ShortType, containsNull = false)
      case "f8"           => BinaryType
    }
    StructType(metaFields :+ StructField(CollectionMeta.VectorCol, vecType, nullable = false))
  }

  def toJson: String = {
    implicit val fmts: Formats = DefaultFormats
    Serialization.write(this)
  }
}

object CollectionMeta {
  /** Internal vector column name in the stored snapshot. */
  val VectorCol = "__vector"

  def fromJson(s: String): CollectionMeta = {
    implicit val fmts: Formats = DefaultFormats
    Serialization.read[CollectionMeta](s)
  }
}
