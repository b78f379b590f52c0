package graft.quality

import graft.contracts.{Contract, OdcsTypes}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types._
import scala.collection.immutable.ListMap

/** Simplified field observation: engine type, canonical ODCS type, nullability.
  * Mirrors dc43 `spark/data_quality.py:78-91`. */
final case class FieldSnapshot(backendType: String, odcsType: String, nullable: Boolean)

object SchemaSnapshot {
  /** Canonical ODCS primitive name for a Spark type. */
  def odcsTypeName(dt: DataType): String = dt match {
    case _: StringType    => "string"
    case LongType         => "bigint"
    case IntegerType      => "int"
    case ShortType        => "smallint"
    case ByteType         => "tinyint"
    case FloatType        => "float"
    case DoubleType       => "double"
    case _: DecimalType   => "decimal"
    case BooleanType      => "boolean"
    case DateType         => "date"
    case _: TimestampType => "timestamp"
    // Spark 4 surfaces parquet timestamps without zone as TIMESTAMP_NTZ;
    // ODCS has one timestamp primitive, so both canonicalise together
    case TimestampNTZType => "timestamp"
    case BinaryType       => "binary"
    case other            => other.typeName
  }

  def of(df: DataFrame): ListMap[String, FieldSnapshot] =
    ListMap(df.schema.fields.map { f =>
      f.name -> FieldSnapshot(f.dataType.sql.toLowerCase, odcsTypeName(f.dataType), f.nullable)
    }: _*)
}

/** Outcome of evaluating observations against a contract.
  * Mirrors dc43 `ValidationResult` (dc43-service-clients
  * `data_quality/models.py:24-90`): the reference carries an explicit
  * four-value status (`ok | warn | block | unknown`) alongside the
  * error/warning lists because EXTERNAL engines (Great Expectations /
  * Soda adapters) emit a verdict directly instead of deriving it —
  * `statusOverride` is that channel, `None` for the native engine whose
  * status derives from the lists exactly as before. `reason` is the
  * reference's free-text verdict explanation (models.py `reason`),
  * populated by the metrics-driven engines. */
final case class ValidationResult(
    ok: Boolean,
    errors: Seq[String],
    warnings: Seq[String],
    metrics: Map[String, Any],
    schema: Map[String, FieldSnapshot],
    statusOverride: Option[String] = None,
    reason: Option[String] = None
) {
  /** The reference's record-status vocabulary (`governance/backend/
    * local.py:68`): errors block, warnings warn, clean is ok — unless an
    * external engine pronounced its own verdict (models.py clamps
    * unknown spellings to `unknown`; the adapters only construct known
    * ones). THE canonical mapping — governance records and telemetry
    * spans both delegate here so the vocabularies cannot drift. */
  def recordStatus: String =
    statusOverride.filter(ValidationResult.KnownStatuses.contains).getOrElse(
      if (errors.nonEmpty) "block"
      else if (warnings.nonEmpty) "warn"
      else "ok")
}

object ValidationResult {
  /** models.py `_KNOWN_STATUSES`. */
  val KnownStatuses: Set[String] = Set("ok", "warn", "block", "unknown")
}

/** Contract evaluation over collected observations — the engine-independent
  * verdict logic of dc43 `data_quality/backend/engine.py:192-307`. */
object Evaluator {

  sealed trait Severity
  case object ErrorSeverity extends Severity
  case object WarningSeverity extends Severity
  case object IgnoreSeverity extends Severity

  def violationMessage(spec: ExpectationSpec, count: Long): String = {
    val column = spec.column.getOrElse("field")
    spec.rule match {
      case "not_null" | "required" =>
        s"column $column contains $count null value(s) but is required in the contract"
      case "unique" => s"column $column has $count duplicate value(s)"
      case "enum"   => s"column $column contains $count value(s) outside enum [${spec.values.mkString(", ")}]"
      case "regex"  => s"column $column contains $count value(s) not matching regex ${spec.pattern.getOrElse("")}"
      case "gt"     => s"column $column contains $count value(s) not greater than ${spec.threshold.getOrElse("")}"
      case "ge"     => s"column $column contains $count value(s) below ${spec.threshold.getOrElse("")}"
      case "lt"     => s"column $column contains $count value(s) not less than ${spec.threshold.getOrElse("")}"
      case "le"     => s"column $column contains $count value(s) above ${spec.threshold.getOrElse("")}"
      case _        => s"expectation ${spec.key} failed $count time(s)"
    }
  }

  def evaluate(
      contract: Contract,
      schema: Map[String, FieldSnapshot],
      metrics: Map[String, Any],
      strictTypes: Boolean = true,
      allowExtraColumns: Boolean = true,
      expectationSeverity: Severity = ErrorSeverity
  ): ValidationResult = {
    val errors = Seq.newBuilder[String]
    val warnings = Seq.newBuilder[String]

    val fields = contract.properties
    val fieldMap = fields.map(f => f.name -> f).toMap

    for (f <- fields) {
      schema.get(f.name) match {
        case None =>
          if (f.required) errors += s"missing required column: ${f.name}"
          else warnings += s"missing optional column: ${f.name}"
        case Some(info) =>
          val expected = OdcsTypes.canonical(f.physicalType.orElse(f.logicalType).getOrElse(""))
          val observed = OdcsTypes.canonical(info.odcsType)
          if (strictTypes && expected.nonEmpty && observed != expected &&
              !OdcsTypes.losslesslyWidensTo(observed, expected))
            errors += s"type mismatch for ${f.name}: expected $expected, observed $observed"
          if (f.required && info.nullable &&
              !metrics.contains(s"violations.not_null_${f.name}") &&
              !metrics.contains(s"violations.required_${f.name}"))
            warnings += s"column ${f.name} reported nullable by runtime but violation counts were not provided"
      }
    }

    if (!allowExtraColumns) {
      val extras = schema.keys.filterNot(fieldMap.contains).toSeq
      if (extras.nonEmpty) warnings += s"extra columns present: ${extras.mkString("[", ", ", "]")}"
    }

    for (spec <- Expectations.fromContract(contract) if spec.rule != "query") {
      metrics.get(s"violations.${spec.key}") match {
        case None =>
          if (!spec.optional) warnings += s"missing metric for expectation ${spec.key}"
        case Some(v: Number) if v.longValue > 0 =>
          val msg = violationMessage(spec, v.longValue)
          // nullability and uniqueness violations are always hard errors
          val sev =
            if (Set("not_null", "required", "unique").contains(spec.rule)) ErrorSeverity
            else expectationSeverity
          sev match {
            case ErrorSeverity   => errors += msg
            case WarningSeverity => warnings += msg
            case IgnoreSeverity  =>
          }
        case Some(_: Number) => // zero violations
        case Some(other) =>
          warnings += s"unexpected metric type for ${spec.key}: ${other.getClass.getSimpleName}"
      }
    }

    val errs = errors.result()
    ValidationResult(errs.isEmpty, errs, warnings.result(), metrics, schema)
  }

  /** End-to-end: collect observations from `df` in one pass and evaluate.
    * `observeEnums = true` additionally collects the out-of-set values of
    * violated enum rules (`observed.enum_<field>` metrics, same single
    * pass) so `Drafter.fromValidation` can EXTEND those enums the way the
    * reference's drafting layer does, instead of keeping them blind. */
  def validate(
      df: DataFrame,
      contract: Contract,
      strictTypes: Boolean = true,
      allowExtraColumns: Boolean = true,
      expectationSeverity: Severity = ErrorSeverity,
      observeEnums: Boolean = false
  ): ValidationResult = {
    val specs = Expectations.fromContract(contract)
    val metrics: Map[String, Any] =
      if (observeEnums) Metrics.computeWithObservations(df, specs)
      else Metrics.compute(df, specs)
    evaluate(contract, SchemaSnapshot.of(df), metrics, strictTypes, allowExtraColumns, expectationSeverity)
  }
}
