package graft.governance

import graft.SparkSpec
import graft.obs.{LineageObservationSink, LogObservationSink,
  TelemetryObservationSink}
import graft.service.ServiceBootstrap
import org.scalatest.funsuite.AnyFunSuite

/** The publication-mode resolver, mirroring the reference's normalisation
  * and resolution battery (`governance/publication.py`): value
  * normalisation (case, whitespace, dash folding), strict explicit
  * overrides, env-beats-config ordering with skip-on-invalid, and the
  * TOML / sink wiring. */
class PublicationSpec extends AnyFunSuite {

  test("fromValue normalises case, whitespace, and dashes") {
    assert(PublicationMode.fromValue("legacy") == PublicationMode.Legacy)
    assert(PublicationMode.fromValue("  Open-Data-Lineage  ") ==
      PublicationMode.OpenDataLineage)
    assert(PublicationMode.fromValue("OPEN_TELEMETRY") ==
      PublicationMode.OpenTelemetry)
    assert(PublicationMode.fromValue("open-telemetry") ==
      PublicationMode.OpenTelemetry)
  }

  test("fromValue: ONLY null yields the default; empty and unknown fail loudly") {
    assert(PublicationMode.fromValue(null) == PublicationMode.Legacy)
    // the reference's from_value: None -> default, but "" and "  " hit
    // the ValueError path (no mode matches the empty candidate) — the
    // distinction is what lets resolve() SKIP a whitespace env var
    // instead of resolving to the default and masking a valid config
    intercept[IllegalArgumentException](PublicationMode.fromValue(""))
    intercept[IllegalArgumentException](PublicationMode.fromValue("   "))
    val e = intercept[IllegalArgumentException](
      PublicationMode.fromValue("carrier_pigeon"))
    assert(e.getMessage.contains("carrier_pigeon"))
  }

  test("resolve: explicit override wins and is strict") {
    assert(PublicationMode.resolve(explicit = Some("open_data_lineage"),
      env = Map(PublicationMode.EnvKey -> "open_telemetry")) ==
      PublicationMode.OpenDataLineage)
    // an unknown EXPLICIT value throws (never a silent fallback)
    intercept[IllegalArgumentException](
      PublicationMode.resolve(explicit = Some("nope"), env = Map.empty))
  }

  test("resolve: env beats config; invalid candidates are skipped") {
    val cfg = Map(PublicationMode.ConfigKeys.head -> "open_data_lineage")
    assert(PublicationMode.resolve(config = cfg,
      env = Map(PublicationMode.EnvKey -> "open_telemetry")) ==
      PublicationMode.OpenTelemetry)
    // a stale/garbage env var is SKIPPED, not fatal — config still wins
    assert(PublicationMode.resolve(config = cfg,
      env = Map(PublicationMode.EnvKey -> "garbage")) ==
      PublicationMode.OpenDataLineage)
    // invalid everywhere -> default
    assert(PublicationMode.resolve(
      config = Map(PublicationMode.ConfigKeys.head -> "garbage"),
      env = Map(PublicationMode.EnvKey -> "garbage")) ==
      PublicationMode.Legacy)
    // a WHITESPACE env var is skipped like any invalid candidate — the
    // config value must still win, not be masked by the default
    assert(PublicationMode.resolve(config = cfg,
      env = Map(PublicationMode.EnvKey -> "   ")) ==
      PublicationMode.OpenDataLineage)
    // no hints at all -> default
    assert(PublicationMode.resolve(env = Map.empty) == PublicationMode.Legacy)
  }

  test("resolve: config keys are consulted in declared order") {
    val both = Map(
      PublicationMode.ConfigKeys.head -> "open_telemetry",
      PublicationMode.ConfigKeys.last -> "open_data_lineage")
    assert(PublicationMode.resolve(config = both, env = Map.empty) ==
      PublicationMode.OpenTelemetry)
    // only the generic dotted key present — still found
    assert(PublicationMode.resolve(
      config = Map(PublicationMode.ConfigKeys.last -> "open_data_lineage"),
      env = Map.empty) == PublicationMode.OpenDataLineage)
  }

  test("each mode builds its sink; the event kinds are distinguishable") {
    val buf = scala.collection.mutable.ArrayBuffer.empty[String]
    assert(PublicationMode.Legacy.sink(buf += _) eq LogObservationSink)
    val v = graft.quality.ValidationResult(ok = true, Nil, Nil,
      Map("row_count" -> 7L), Map.empty)
    val lineage = PublicationMode.OpenDataLineage.sink(buf += _,
      contractId = Some("c"), contractVersion = Some("1.0.0"))
    assert(lineage.isInstanceOf[LineageObservationSink])
    lineage.record("ds1", Some(3L), Map("row_count" -> 7L), v)
    val otel = PublicationMode.OpenTelemetry.sink(buf += _)
    assert(otel.isInstanceOf[TelemetryObservationSink])
    otel.record("ds1", None, Map("row_count" -> 7L), v)
    assert(buf.size == 2)
    assert(buf(0).contains("\"eventType\"") || buf(0).contains("eventTime"),
      s"lineage sink must emit an OpenLineage RunEvent, got: ${buf(0).take(80)}")
    assert(buf(1).contains("span") || buf(1).contains("attributes"),
      s"otel sink must emit a span, got: ${buf(1).take(80)}")
  }

  test("ServiceBootstrap resolves [governance] publication_mode from TOML") {
    val cfg = ServiceBootstrap.parseToml(
      """[remote]
        |base_url = "http://facade:8081"
        |
        |[governance]
        |publication_mode = "open-telemetry"
        |""".stripMargin)
    assert(ServiceBootstrap.publicationMode(cfg, env = Map.empty) ==
      PublicationMode.OpenTelemetry)
    // env still wins over the file
    assert(ServiceBootstrap.publicationMode(cfg,
      env = Map(PublicationMode.EnvKey -> "open_data_lineage")) ==
      PublicationMode.OpenDataLineage)
    // [governance] may accompany [remote] (orthogonal to transport) —
    // the client bootstrap must accept the combination
    val clients = ServiceBootstrap.clientsFromToml(
      """[remote]
        |base_url = "http://facade:8081"
        |
        |[governance]
        |publication_mode = "legacy"
        |""".stripMargin)
    assert(clients.contracts != null)
    // a typo'd key inside [governance] still fails loudly in local mode
    intercept[IllegalArgumentException](ServiceBootstrap.clientsFromToml(
      """[contract_store]
        |root = "/tmp/x"
        |
        |[governance_store]
        |root = "/tmp/y"
        |
        |[governance]
        |publicaton_mode = "legacy"
        |""".stripMargin))
    // no [governance] section at all -> the default
    assert(ServiceBootstrap.publicationMode(Map.empty, env = Map.empty) ==
      PublicationMode.Legacy)
  }
}

/** The GovernedIO publication seam: a governed batch write records its
  * observation through the configured sink exactly once, with the
  * validation verdict and metric set the streaming path publishes. */
class GovernedIOPublicationSpec extends SparkSpec {
  import graft.DemoContracts
  import graft.contracts.FsContractStore
  import graft.io._

  test("a governed write publishes one observation through the mode-built sink") {
    val root = tmpDir("graft_pub")
    val store = new FsContractStore(s"$root/contracts")
    store.put(DemoContracts.lineitemAlign)
    val events = scala.collection.mutable.ArrayBuffer.empty[String]
    val gov = GovernedIO(store, ContractVersionLocator(spark, s"$root/lake"),
      sink = PublicationMode.OpenDataLineage.sink(events += _,
        contractId = Some(DemoContracts.lineitemAlign.id)))
    val li = graft.T.load(spark, "/root/testdata/sf0.001", "lineitem")
    gov.write(li, "sales.lineitem_slim")
    assert(events.size == 1, "exactly one RunEvent per governed write")
    assert(events.head.contains("sales.lineitem_slim"))
    // the default sink (legacy structured log) stays the zero-config path
    val quiet = GovernedIO(store, ContractVersionLocator(spark, s"$root/lake"))
    assert(quiet.sink eq graft.obs.LogObservationSink)
  }
}
