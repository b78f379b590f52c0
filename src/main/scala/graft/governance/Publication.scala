package graft.governance

import graft.obs.{LineageObservationSink, LogObservationSink, ObservationSink,
  TelemetryObservationSink}

/** How governance interactions publish pipeline activity — the
  * configuration-resolved switch between the structured-log default, the
  * OpenLineage event stream, and the OpenTelemetry span stream. Mirrors
  * the reference's publication-mode helper
  * (`dc43-service-clients/src/dc43_service_clients/governance/publication.py:10-107`):
  * the same three modes, the same normalisation (trim, lowercase, dashes
  * fold to underscores), the same resolution order (explicit caller
  * override — which FAILS on an unknown value — then the environment
  * variable, then the config keys in declared order, each candidate
  * SKIPPED when unknown, then the default), so an operator can flip
  * telemetry on for a deployed pipeline from config alone, with no code
  * change.
  *
  * The sinks themselves predate this switch ([[graft.obs.LineageEvents]],
  * [[graft.obs.TelemetrySpans]]); this is the wiring that makes them a
  * deployment decision: [[PublicationMode.sink]] builds the
  * [[ObservationSink]] a mode implies, and [[graft.service.ServiceBootstrap]]
  * exposes the same resolution from its TOML `[governance]` section. */
sealed abstract class PublicationMode(val value: String) {

  /** The [[ObservationSink]] this mode publishes through. `emit` receives
    * one serialized event per observation (an OpenLineage RunEvent JSON
    * line or an OTel span JSON — whatever transport the deployment
    * attaches: an HTTP poster, a Kafka producer, a file appender);
    * unused by the legacy mode, which logs structured lines via log4j.
    * `contractId`/`contractVersion` decorate the emitted facets exactly
    * as the underlying sinks document. */
  def sink(emit: String => Unit,
           operation: String = "write",
           contractId: Option[String] = None,
           contractVersion: Option[String] = None): ObservationSink =
    this match {
      case PublicationMode.Legacy => LogObservationSink
      case PublicationMode.OpenDataLineage =>
        new LineageObservationSink(emit, operation = operation,
          contractId = contractId, contractVersion = contractVersion)
      case PublicationMode.OpenTelemetry =>
        new TelemetryObservationSink(emit, operation = operation,
          contractId = contractId, contractVersion = contractVersion)
    }
}

object PublicationMode {

  /** Structured one-line log per observation (the default). */
  case object Legacy extends PublicationMode("legacy")

  /** One OpenLineage RunEvent per observation. */
  case object OpenDataLineage extends PublicationMode("open_data_lineage")

  /** One OpenTelemetry span per observation. */
  case object OpenTelemetry extends PublicationMode("open_telemetry")

  val All: Seq[PublicationMode] = Seq(Legacy, OpenDataLineage, OpenTelemetry)

  /** Environment variable consulted first (reference:
    * `DC43_GOVERNANCE_PUBLICATION_MODE`). */
  val EnvKey = "GRAFT_GOVERNANCE_PUBLICATION_MODE"

  /** Config keys consulted in order after the environment (reference
    * `_CONFIG_KEYS` — camelCase, snake_case, and the generic dotted
    * form). */
  val ConfigKeys: Seq[String] = Seq(
    "graft.governance.publicationMode",
    "graft.governance.publication_mode",
    "governance.publication.mode")

  /** Normalise a raw value into a mode: trim, lowercase, dashes fold to
    * underscores (`"Open-Data-Lineage"` resolves like
    * `"open_data_lineage"`). ONLY null yields `default`; any non-null
    * value that normalises to nothing known — including whitespace-only
    * strings — FAILS LOUDLY, the reference's exact `from_value`
    * contract (`publication.py`: None → default, every other
    * unmatched string → ValueError). The distinction matters in
    * [[resolve]]: a whitespace env candidate must be SKIPPED (throw →
    * try the config keys), not resolve to the default and mask a valid
    * config value. */
  def fromValue(value: String,
                default: PublicationMode = Legacy): PublicationMode = {
    if (value == null) return default
    val candidate = value.trim.toLowerCase.replace('-', '_')
    All.find(_.value == candidate).getOrElse(
      throw new IllegalArgumentException(
        s"Unknown governance publication mode: $value " +
          s"(supported: ${All.map(_.value).mkString(", ")})"))
  }

  /** Resolve the configured mode. `explicit` (a caller override) wins
    * and is STRICT — an unknown explicit value throws. Otherwise the
    * candidates are the environment value (when non-empty) and the
    * FIRST present config key's value in [[ConfigKeys]] order (the
    * reference's `_lookup_configuration` takes exactly one config
    * candidate — later keys do NOT rescue a typo'd earlier one); a
    * candidate that fails normalisation — unknown mode OR
    * whitespace-only — is SKIPPED (the reference's try/continue loop:
    * a stale env var set by another tool must not break, or mask the
    * config for, every pipeline that merely has it in scope), and
    * `default` covers the no-hint case. */
  def resolve(explicit: Option[String] = None,
              config: Map[String, String] = Map.empty,
              env: Map[String, String] = sys.env,
              default: PublicationMode = Legacy): PublicationMode =
    explicit.map(fromValue(_, default)).getOrElse {
      val candidates =
        env.get(EnvKey).filter(_.nonEmpty).toSeq ++
          ConfigKeys.flatMap(k => config.get(k).filter(_.nonEmpty)).headOption
      candidates.iterator
        .flatMap(v => try Some(fromValue(v, default))
                      catch { case _: IllegalArgumentException => None })
        .nextOption()
        .getOrElse(default)
    }
}
