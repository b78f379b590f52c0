package graft.quality

import graft.contracts.Contract

/** Pluggable data-quality execution engines — the last reference-parity
  * surface (r14 verdict "What's missing" #1): the reference resolves a
  * DQ engine PER CONTRACT and can interpret verdicts emitted by
  * EXTERNAL tools instead of recomputing them natively
  * (dc43-service-backends `data_quality/backend/engines.py:27-220`,
  * `manager.py:21-130`). Users embedding graft next to an existing
  * Great Expectations / Soda estate ship those tools' run summaries
  * inside the observation payload's metrics; the contract names which
  * engine interprets them.
  *
  * The seam is deliberately NOT a Spark surface: engines interpret an
  * [[ObservationPayload]] — a schema snapshot plus a metrics map — so
  * the same verdict logic serves the Spark batch path
  * ([[Evaluator.validate]] collects the payload in one corpus pass),
  * the streaming observe path, and the remote `/data-quality/evaluate`
  * route, without any engine touching a DataFrame.
  */

/** The engine-independent evaluation input (dc43-service-clients
  * `data_quality/models.py:15-21` `ObservationPayload`): metrics keyed
  * by expectation (or by an external tool's summary key) plus the
  * observed schema snapshot. */
final case class ObservationPayload(
    metrics: Map[String, Any] = Map.empty,
    schema: Map[String, FieldSnapshot] = Map.empty)

/** Execution contract implemented by concrete engines
  * (engines.py:27-41 `DataQualityExecutionEngine`). */
trait DataQualityEngine {

  /** Verdict for `contract` over `payload`. */
  def evaluate(contract: Contract, payload: ObservationPayload): ValidationResult

  /** The expectations this engine will enforce, as descriptor maps (the
    * `/data-quality/expectations` rendering): external engines return
    * their loaded suite when one is configured, else everyone describes
    * the contract's own plan (engines.py:135-142). */
  def describeExpectations(contract: Contract): Seq[Map[String, Any]] =
    DataQualityEngines.contractPlan(contract)
}

object DataQualityEngines {

  /** The contract's expectation plan as descriptor maps — the
    * reference's `expectation_plan` rows (key, rule, column, optional,
    * SQL predicate). */
  def contractPlan(contract: Contract): Seq[Map[String, Any]] =
    Expectations.fromContract(contract).map { sp =>
      Map[String, Any](
        "key" -> sp.key, "rule" -> sp.rule,
        "column" -> sp.column.orNull,
        "optional" -> sp.optional,
        "predicate" -> Expectations.sqlPredicate(sp).orNull)
    }
}

/** Adapter around the built-in evaluation engine (engines.py:44-86
  * `NativeDataQualityEngine`): [[Evaluator.evaluate]] with the
  * constructor-pinned strictness knobs. */
final class NativeDataQualityEngine(
    strictTypes: Boolean = true,
    allowExtraColumns: Boolean = true,
    expectationSeverity: Evaluator.Severity = Evaluator.ErrorSeverity)
    extends DataQualityEngine {

  override def evaluate(contract: Contract,
                        payload: ObservationPayload): ValidationResult =
    Evaluator.evaluate(contract, payload.schema, payload.metrics,
      strictTypes, allowExtraColumns, expectationSeverity)
}

/** Base for engines that interpret metrics emitted by external tools
  * (engines.py:121-142 `MetricsDrivenEngine`): the tool's run summary
  * travels INSIDE the payload metrics under `metricsKey` as a nested
  * map; a configured suite file (JSON — the reference additionally
  * reads YAML when that optional dependency is present; this port keeps
  * the JSON/`.ge` half) overrides the contract plan in
  * [[describeExpectations]]. */
abstract class MetricsDrivenEngine(metricsKey: String,
                                   suitePath: Option[String] = None)
    extends DataQualityEngine {

  /** Engine slug for the missing-summary verdict details. */
  protected def engineName: String

  /** Map the summary to the verdict. Called only when the summary key
    * is present and is a map. */
  protected def interpret(summary: Map[String, Any],
                          payload: ObservationPayload): ValidationResult

  final override def evaluate(contract: Contract,
                              payload: ObservationPayload): ValidationResult =
    summaryOf(payload) match {
      case Some(summary) => interpret(summary, payload)
      case None =>
        // the reference returns status=unknown with ok left TRUE
        // (models.py: unknown + no errors keeps ok) — "we cannot judge"
        // is not "blocked", and governance surfaces the unknown status
        ValidationResult(ok = true, Nil, Nil, payload.metrics, payload.schema,
          statusOverride = Some("unknown"),
          reason = Some(s"missing-$engineName-summary"))
    }

  private def summaryOf(payload: ObservationPayload): Option[Map[String, Any]] =
    payload.metrics.get(metricsKey).collect {
      case m: Map[_, _] =>
        m.collect { case (k: String, v) => k -> (v: Any) }
    }

  final override def describeExpectations(contract: Contract): Seq[Map[String, Any]] = {
    val suite = MetricsDrivenEngine.loadSuite(suitePath)
    if (suite.nonEmpty) suite else super.describeExpectations(contract)
  }
}

object MetricsDrivenEngine {

  /** engines.py:89-118 `_SuiteLoader`: best-effort — a missing,
    * unreadable, or malformed suite yields the empty list (the engine
    * falls back to the contract plan), never an error. `.json` / `.ge`
    * files only, matching the reference's always-available half. */
  private[quality] def loadSuite(path: Option[String]): Seq[Map[String, Any]] =
    path.filter(p => {
      val lower = p.toLowerCase
      lower.endsWith(".json") || lower.endsWith(".ge")
    }).flatMap { p =>
      scala.util.Try {
        val text = new String(
          java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(p)), "UTF-8")
        org.json4s.jackson.JsonMethods.parse(text)
      }.toOption
    }.map(jsonDescriptors).getOrElse(Nil)

  private def jsonDescriptors(v: org.json4s.JValue): Seq[Map[String, Any]] = {
    import org.json4s._
    def plain(j: JValue): Any = j match {
      case JString(s) => s
      case JBool(b) => b
      case JInt(i) => i.longValue
      case JLong(l) => l
      case JDouble(d) => d
      case JDecimal(d) => d.toDouble
      case JArray(xs) => xs.map(plain)
      case JObject(fs) => fs.map { case (k, x) => k -> plain(x) }.toMap
      case _ => null
    }
    v match {
      case o: JObject => Seq(plain(o).asInstanceOf[Map[String, Any]])
      case JArray(xs) => xs.collect { case o: JObject =>
        plain(o).asInstanceOf[Map[String, Any]] }
      case _ => Nil
    }
  }
}

/** Great Expectations run-summary adapter (engines.py:145-178): the
  * summary's `status` wins when it is a known status, else `success`
  * maps true→ok / false→block; the reason comes from `exception_info`
  * (a map's `exception_message` or the raw string) falling back to
  * `reason`. */
final class GreatExpectationsEngine(
    metricsKey: String = "great_expectations",
    suitePath: Option[String] = None)
    extends MetricsDrivenEngine(metricsKey, suitePath) {

  override protected def engineName: String = "great-expectations"

  override protected def interpret(summary: Map[String, Any],
                                   payload: ObservationPayload): ValidationResult = {
    val success = summary.get("success").contains(true)
    val raw = summary.get("status").collect { case s: String => s }
      .getOrElse(if (success) "ok" else "block")
    val status =
      if (ValidationResult.KnownStatuses.contains(raw)) raw
      else if (success) "ok" else "block"
    val reason = (summary.get("exception_info") match {
      case Some(m: Map[_, _]) => m.collect {
        case (k: String, v: String) if k == "exception_message" => v }.headOption
      case Some(s: String) => Some(s)
      case _ => None
    }).orElse(summary.get("reason").collect { case s: String => s })
    ValidationResult(ok = status != "block", Nil, Nil,
      payload.metrics, payload.schema,
      statusOverride = Some(status), reason = reason)
  }
}

/** Soda scan-outcome adapter (engines.py:181-212): `status` else
  * `outcome` else warn; an out-of-vocabulary spelling maps
  * passed/pass→ok (case-folded), anything else→block; reason from
  * `reason` else `error`.
  *
  * Deliberate deviation from the reference: its fallback re-reads the
  * `status` KEY (engines.py:206), so a pass verdict delivered under
  * Soda's own `outcome` key — the spelling the line exists to accept —
  * maps to block. The fallback here tests the RESOLVED value,
  * whichever key carried it. */
final class SodaEngine(
    metricsKey: String = "soda",
    checksPath: Option[String] = None)
    extends MetricsDrivenEngine(metricsKey, checksPath) {

  override protected def engineName: String = "soda"

  override protected def interpret(summary: Map[String, Any],
                                   payload: ObservationPayload): ValidationResult = {
    val raw = summary.get("status").collect { case s: String => s }
      .orElse(summary.get("outcome").collect { case s: String => s })
      .getOrElse("warn")
    val status =
      if (ValidationResult.KnownStatuses.contains(raw)) raw
      else if (Set("passed", "pass").contains(raw.toLowerCase)) "ok"
      else "block"
    val reason = summary.get("reason").collect { case s: String => s }
      .orElse(summary.get("error").collect { case s: String => s })
    ValidationResult(ok = status != "block", Nil, Nil,
      payload.metrics, payload.schema,
      statusOverride = Some(status), reason = reason)
  }
}

/** Per-contract engine resolution and dispatch (manager.py:21-127
  * `DataQualityManager`): the registry ships native (under both its
  * names), Great Expectations and Soda, callers may register more; the
  * contract names its engine through a custom property
  * (`quality_engine` and the reference's alternate spellings) or any
  * quality rule's `engine` attribute, falling back to the manager
  * default. Unknown names fail loudly (manager.py:77-81) — a typo'd
  * engine must not silently evaluate under different semantics.
  *
  * Not re-expressed: manager.py:111-117 rewrites an unknown status to
  * the ENGINE NAME when the verdict carries no reason and self-names
  * the engine in its details — unreachable for every shipped engine
  * (their unknown verdicts always carry a reason) and an out-of-
  * vocabulary status besides. */
final class DataQualityManager(
    defaultEngine: String = "native",
    engines: Map[String, DataQualityEngine] = Map.empty,
    strictTypes: Boolean = true,
    allowExtraColumns: Boolean = true,
    expectationSeverity: Evaluator.Severity = Evaluator.ErrorSeverity) {

  private val registry: Map[String, DataQualityEngine] = {
    val native = new NativeDataQualityEngine(
      strictTypes, allowExtraColumns, expectationSeverity)
    Map[String, DataQualityEngine](
      "native" -> native, "builtin" -> native,
      "great_expectations" -> new GreatExpectationsEngine(),
      "soda" -> new SodaEngine()) ++
      engines.map { case (k, v) => k.toLowerCase -> v }
  }

  private val fallback =
    Option(defaultEngine).map(_.trim.toLowerCase).filter(_.nonEmpty)
      .getOrElse("native")

  /** manager.py:49-75: custom-property spellings first, then the first
    * quality rule carrying an `engine` attribute (object-level rules
    * before their object's field rules, contract order), else the
    * default. */
  def resolveEngineName(contract: Contract): String = {
    val fromProps = Seq("quality_engine", "qualityEngine", "dq_engine", "dqEngine")
      .flatMap(contract.customProperties.get)
      .map(_.trim).find(_.nonEmpty)
    val fromRules = contract.schema.iterator.flatMap(obj =>
      obj.quality.iterator ++ obj.properties.iterator.flatMap(_.quality))
      .flatMap(_.engine).map(_.trim).find(_.nonEmpty)
    fromProps.orElse(fromRules).map(_.toLowerCase).getOrElse(fallback)
  }

  /** The resolved engine, loud on unregistered names. */
  def engineFor(contract: Contract): (String, DataQualityEngine) = {
    val name = resolveEngineName(contract)
    registry.get(name) match {
      case Some(e) => name -> e
      case None => throw new IllegalArgumentException(
        s"No data-quality engine registered for '$name'")
    }
  }

  def evaluate(contract: Contract, payload: ObservationPayload): ValidationResult =
    engineFor(contract)._2.evaluate(contract, payload)

  def describeExpectations(contract: Contract): Seq[Map[String, Any]] =
    engineFor(contract)._2.describeExpectations(contract)
}
