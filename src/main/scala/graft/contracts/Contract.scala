package graft.contracts

/** ODCS-lite data-contract model.
  *
  * Captures exactly the slice of the Open Data Contract Standard that the
  * reference engine reads when validating data (see dc43
  * `data_quality/backend/engine.py:48-163`): schema objects with typed
  * properties, per-property quality rules, and object-level SQL query rules.
  * Everything else in ODCS is governance metadata that never reaches the
  * execution engine.
  */
final case class QualityRule(
    /** Rule discriminator: "enum" | "regex" | "unique" | "query" | "" for
      * pure threshold rules expressed via the mustBe* fields. */
    rule: Option[String] = None,
    mustBeGreaterThan: Option[BigDecimal] = None,
    mustBeGreaterOrEqualTo: Option[BigDecimal] = None,
    mustBeLessThan: Option[BigDecimal] = None,
    mustBeLessOrEqualTo: Option[BigDecimal] = None,
    /** Enum membership values (rule == "enum"). */
    values: Seq[String] = Nil,
    /** Whether enum values are numeric literals rather than strings. */
    valuesAreNumeric: Boolean = false,
    /** Regex pattern (rule == "regex"); Spark RLIKE semantics (find-anywhere). */
    pattern: Option[String] = None,
    /** Custom SQL metric (object-level rule == "query"). */
    query: Option[String] = None,
    engine: Option[String] = None,
    name: Option[String] = None
)

final case class FieldDef(
    name: String,
    physicalType: Option[String] = None,
    logicalType: Option[String] = None,
    required: Boolean = false,
    unique: Boolean = false,
    quality: Seq[QualityRule] = Nil,
    /** Nested struct members (physicalType == "object"). */
    fields: Seq[FieldDef] = Nil,
    /** Array element type (physicalType == "array"). */
    items: Option[FieldDef] = None
) {
  /** Declared ODCS primitive type, physical taking precedence. */
  def odcsType: String =
    OdcsTypes.canonical(physicalType.orElse(logicalType).getOrElse("string"))
}

final case class SchemaObjectDef(
    name: String,
    properties: Seq[FieldDef] = Nil,
    quality: Seq[QualityRule] = Nil
)

/** One ODCS `servers` entry — where a contract's data physically lives.
  * The slice the reference reads: catalog/schema/dataset compose a
  * governed-catalog table identifier (dc43
  * `governance/unity_catalog.py:183-212`), `schema` falling back to the
  * legacy `database` spelling on decode; path/format/host describe
  * file-backed servers. */
final case class ServerDef(
    server: Option[String] = None,
    /** ODCS `type` (e.g. "local", "s3", "databricks"). */
    serverType: Option[String] = None,
    host: Option[String] = None,
    path: Option[String] = None,
    format: Option[String] = None,
    catalog: Option[String] = None,
    /** ODCS `schema` (legacy `database`). */
    schemaName: Option[String] = None,
    dataset: Option[String] = None
)

final case class Contract(
    id: String,
    version: String,
    name: Option[String] = None,
    description: Option[String] = None,
    status: Option[String] = None,
    kind: String = "DataContract",
    apiVersion: String = "v3.0.2",
    schema: Seq[SchemaObjectDef] = Nil,
    servers: Seq[ServerDef] = Nil,
    customProperties: Map[String, String] = Map.empty
) {
  /** All properties across schema objects, first occurrence wins on name
    * clashes (mirrors dc43 `list_properties`). */
  def properties: Seq[FieldDef] = {
    val seen = scala.collection.mutable.LinkedHashMap.empty[String, FieldDef]
    for (obj <- schema; f <- obj.properties if f.name.nonEmpty)
      if (!seen.contains(f.name)) seen(f.name) = f
    seen.values.toSeq
  }
}

/** Canonical ODCS primitive names + Spark synonyms.
  * Mirrors dc43 `spark/data_quality.py:20-49`.
  */
object OdcsTypes {
  val canonicalTypes: Map[String, String] = Map(
    "string" -> "string", "varchar" -> "string",
    "bigint" -> "bigint", "long" -> "bigint",
    "int" -> "int", "integer" -> "int",
    "smallint" -> "smallint", "short" -> "smallint",
    "tinyint" -> "tinyint", "byte" -> "tinyint",
    "float" -> "float", "real" -> "float",
    "double" -> "double",
    "decimal" -> "decimal", "numeric" -> "decimal",
    "boolean" -> "boolean", "bool" -> "boolean",
    "date" -> "date",
    "timestamp" -> "timestamp", "timestamp_ntz" -> "timestamp",
    "binary" -> "binary"
  )

  def canonical(name: String): String = {
    val lower = Option(name).getOrElse("").toLowerCase
    if (lower.startsWith("decimal")) "decimal"
    else canonicalTypes.getOrElse(lower, lower)
  }

  /** Spark SQL type name for an ODCS primitive (identity for canonical
    * names; ODCS aliases resolved first). */
  def sparkTypeName(odcs: String): String = canonical(odcs)

  /** Whether `observed` can be losslessly widened to `expected` (an
    * explicit whitelist). Deliberate deviation from the reference's
    * `expected in observed_backend` substring quirk, which silently
    * accepts e.g. expected `int` vs observed `bigint` — a narrowing. */
  def losslesslyWidensTo(observed: String, expected: String): Boolean =
    widening.get(observed).exists(_.contains(expected))

  private val widening: Map[String, Set[String]] = Map(
    "tinyint"  -> Set("smallint", "int", "bigint"),
    "smallint" -> Set("int", "bigint"),
    "int"      -> Set("bigint"),
    "float"    -> Set("double"))
}
