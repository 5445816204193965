package graft.collection

import org.apache.spark.sql.types._
import org.json4s.{DefaultFormats, Formats}
import org.json4s.jackson.Serialization

/** Declared metadata column of a collection — the engine's `Index` descriptor
  * (/root/reference/idl/proto/v4/edge.proto:44-49): name, type, nullability,
  * primary-key flag. `fieldType` ∈ {string, integer, float, boolean} (edge
  * v4's four value types, SURVEY.md §1.2-1.3) plus `vector` — the
  * experimental engine's Vector index type
  * (/root/reference/idl/proto/v3/experimental.proto:52-58, records at
  * experimental/constants.go:28-31): a named float32 vector column, several
  * of which make a multi-vector (CFLAT) collection. `dim` overrides the
  * collection dim for that field (None → collection dim). */
case class IndexField(
    name: String,
    fieldType: String,
    enableNull: Boolean = false,
    primaryKey: Boolean = false,
    dim: Option[Int] = None) {
  require(IndexField.types.contains(fieldType), s"unknown field type: $fieldType")
  require(fieldType == "vector" || dim.isEmpty, "dim is only valid on vector fields")
  if (fieldType == "vector") {
    require(!enableNull, s"vector field $name cannot be nullable")
    require(!primaryKey, s"vector field $name cannot be the primary key")
  }

  def isVector: Boolean = fieldType == "vector"

  def dataType: DataType = fieldType match {
    case "string"  => StringType
    case "integer" => LongType
    case "float"   => DoubleType
    case "boolean" => BooleanType
    case "vector"  => ArrayType(FloatType, containsNull = false)
  }

  /** Typed default for nullable columns (edge_analyzer.go:86-99). */
  def defaultValue: Any = fieldType match {
    case "string"  => ""
    case "integer" => 0L
    case "float"   => 0.0
    case "boolean" => false
    case "vector"  => throw new IllegalStateException("vector fields have no default")
  }
}

object IndexField {
  val types = Set("string", "integer", "float", "boolean", "vector")
}

/** Collection configuration — mirrors the reference's collection `Metadata`
  * {dim, distance, quantization, index schema, versioning}
  * (/root/reference/edge/edge_metadata.go:22-35, proto v4 edge.proto:29-36).
  * Persisted as a JSON sidecar next to the parquet snapshot (§1.4 mapping of
  * the MinIO `<col>.meta.json` object).
  *
  * Two shapes:
  *  - single-vector (edge v4): no `vector`-typed fields; the vector lives in
  *    the implicit internal `__vector` column.
  *  - multi-vector (experimental CFLAT): one or more `vector`-typed fields,
  *    each a named vector column; searched via weighted multi-vector queries.
  */
case class CollectionMeta(
    name: String,
    dim: Int,
    distance: String = "cosine",
    quantization: String = "none",
    fields: Seq[IndexField] = Seq.empty,
    versioning: Boolean = false,
    currentVersion: Int = 0,
    ivfCells: Option[Int] = None,
    schemaless: Option[Boolean] = None,
    ivfTrainIterations: Option[Int] = None,
    pqSubspaces: Option[Int] = None,
    pqCodewords: Option[Int] = None,
    pqTrainIterations: Option[Int] = None,
    ivfTrainSampleMod: Option[Long] = None,
    pqTrainSampleMod: Option[Long] = None,
    binaryIndex: Option[Boolean] = None,
    routingField: Option[String] = None) {
  require(dim > 0, "dim must be positive")
  require(ivfCells.forall(_ > 0), "ivfCells must be positive")
  require(ivfTrainIterations.forall(_ >= 0), "ivfTrainIterations must be >= 0")
  require(ivfTrainIterations.isEmpty || ivfCells.isDefined,
    "ivfTrainIterations requires ivfCells")
  require(pqSubspaces.isDefined == pqCodewords.isDefined,
    "pqSubspaces and pqCodewords must be set together")
  require(pqSubspaces.forall(m => m > 0 && dim % m == 0),
    s"pqSubspaces must divide dim=$dim")
  require(pqCodewords.forall(k => k > 0 && k <= 256),
    "pqCodewords must be in 1..256 (codes are bytes)")
  require(pqTrainIterations.forall(_ >= 0), "pqTrainIterations must be >= 0")
  require(pqTrainIterations.isEmpty || pqSubspaces.isDefined,
    "pqTrainIterations requires pqSubspaces/pqCodewords")
  // The 100 TB training knob: flush trains IVF centroids / the PQ codebook
  // on the deterministic 1/mod id-hash subsample instead of the full corpus
  // (Lloyd needs a uniform sample, not every row — Ann.trainCentroids /
  // Pq.train `sampleMod`). mod >= 2; the final full-corpus cell ASSIGNMENT
  // and encode stay exact either way.
  require(ivfTrainSampleMod.forall(_ >= 2), "ivfTrainSampleMod must be >= 2")
  require(ivfTrainSampleMod.isEmpty || ivfCells.isDefined,
    "ivfTrainSampleMod requires ivfCells")
  require(pqTrainSampleMod.forall(_ >= 2), "pqTrainSampleMod must be >= 2")
  require(pqTrainSampleMod.isEmpty || pqSubspaces.isDefined,
    "pqTrainSampleMod requires pqSubspaces/pqCodewords")
  require(pqSubspaces.isEmpty || Set("cosine", "euclidean").contains(distance),
    "PQ ADC ranks by euclidean sub-distances: valid for euclidean, and for " +
      "cosine via normalized storage — not for dot/manhattan collections")
  require(pqSubspaces.isEmpty || !fields.exists(_.isVector),
    "PQ layout is not supported on multi-vector collections")
  require(!binaryIndex.contains(true) || !fields.exists(_.isVector),
    "binaryIndex is not supported on multi-vector collections")
  require(!isSchemaless || fields.isEmpty,
    "schemaless (core v3) collections declare no fields — metadata is the string-coerced map")
  require(Set("cosine", "euclidean", "manhattan", "dot").contains(distance), s"unknown distance: $distance")
  require(Set("none", "f16", "bf16", "f8").contains(quantization), s"unknown quantization: $quantization")
  require(fields.count(_.primaryKey) <= 1, "at most one primary key")
  // Multi-vector IVF routes on ONE designated vector field (`routingField`,
  // default: the first declared vector field): flush trains centroids on it
  // and partitions the snapshot by its cell, so probed multi-vector searches
  // prune partition directories exactly like the single-vector rung. The
  // other fields ride along unindexed — they score only within probed cells.
  require(routingField.isEmpty || ivfCells.isDefined,
    "routingField requires ivfCells (it designates the IVF routing vector)")
  require(routingField.isEmpty || fields.exists(_.isVector),
    "routingField is only valid on multi-vector collections")
  require(routingField.forall(r => fields.exists(f => f.isVector && f.name == r)),
    s"routingField ${routingField.getOrElse("")} must name a declared vector field")
  fields.find(f => f.primaryKey && f.fieldType != "string").foreach { f =>
    // pk must be a string (edge_analyzer.go:46-52)
    throw new IllegalArgumentException(s"primary key ${f.name} must be of type string")
  }

  def primaryKey: Option[IndexField] = fields.find(_.primaryKey)

  /** Whether flush writes the packed 1-bit/dim sign-code column + midrange
    * threshold sidecar for [[GraftCatalog.searchBinary]]'s Hamming-prefilter
    * two-pass path. Option-typed for sidecar-JSON backward compatibility. */
  def hasBinaryIndex: Boolean = binaryIndex.contains(true)

  /** (m, ksub) when the collection keeps a PQ code layout. */
  def pqConfig: Option[(Int, Int)] =
    for (m <- pqSubspaces; k <- pqCodewords) yield (m, k)

  /** Core-v3 mode (SURVEY.md §1.2): no declared schema; metadata is an
    * arbitrary string-coerced map and the user id travels as `_id`
    * (core/core.go:506, pkg/index/bitmap_index.go:48-63). Option-typed for
    * sidecar-JSON backward compatibility. */
  def isSchemaless: Boolean = schemaless.contains(true)

  /** The id column: declared pk for typed collections, `_id` for core-mode. */
  def idColumn: String =
    primaryKey.map(_.name).getOrElse {
      require(isSchemaless, s"collection $name requires a primary key field")
      graft.core.CoreMeta.IdKey
    }

  /** Declared named vector columns (empty → single-vector collection). */
  def vectorFields: Seq[IndexField] = fields.filter(_.isVector)

  def isMultiVector: Boolean = vectorFields.nonEmpty

  /** Per-field dimension (field override, else collection dim). */
  def dimOf(f: IndexField): Int = f.dim.getOrElse(dim)

  /** The vector field the IVF layout routes on, for a multi-vector
    * collection with `ivfCells`: the declared `routingField`, defaulting to
    * the FIRST declared vector field. None on single-vector collections
    * (their routing vector is the implicit `__vector` column) and on
    * multi-vector collections without an IVF layout. */
  def routingVector: Option[IndexField] =
    if (isMultiVector && ivfCells.isDefined)
      routingField.flatMap(r => vectorFields.find(_.name == r))
        .orElse(vectorFields.headOption)
    else None

  /** Storage type of one (possibly quantized) vector column (§1.4). */
  def vectorStorageType: DataType = quantization match {
    case "none"         => ArrayType(FloatType, containsNull = false)
    case "f16" | "bf16" => ArrayType(ShortType, containsNull = false)
    case "f8"           => BinaryType
  }

  /** The full storage schema: declared columns in order; single-vector
    * collections append the implicit `__vector` column. Core-mode:
    * `(_id string, meta map<string,string>, __vector)`. */
  def structType: StructType = {
    if (isSchemaless)
      return StructType(Seq(
        StructField(graft.core.CoreMeta.IdKey, StringType, nullable = false),
        StructField(CollectionMeta.MetaCol, MapType(StringType, StringType), nullable = false),
        StructField(CollectionMeta.VectorCol, vectorStorageType, nullable = false)))
    val declared = fields.map { f =>
      if (f.isVector) StructField(f.name, vectorStorageType, nullable = false)
      else StructField(f.name, f.dataType, nullable = f.enableNull)
    }
    if (isMultiVector) StructType(declared)
    else StructType(declared :+ StructField(CollectionMeta.VectorCol, vectorStorageType, nullable = false))
  }

  def toJson: String = {
    implicit val fmts: Formats = DefaultFormats
    Serialization.write(this)
  }
}

object CollectionMeta {
  /** Internal vector column name in the stored snapshot. */
  val VectorCol = "__vector"

  /** String-coerced metadata map column in core-mode snapshots. */
  val MetaCol = "meta"

  def fromJson(s: String): CollectionMeta = {
    implicit val fmts: Formats = DefaultFormats
    Serialization.read[CollectionMeta](s)
  }
}
