package graft.service

import org.scalatest.funsuite.AnyFunSuite

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.file.Files

/** Setup-bundle export (reference `setup_bundle`): the provider registry
  * answers per-runtime starters and None for unknown keys, wizard hints
  * land in the README, the generated service config boots verbatim
  * through ServiceBootstrap, and the executable bit survives `write`. */
class SetupBundleSpec extends AnyFunSuite {

  private def tmp() = Files.createTempDirectory("graft_bundle").toString

  test("the provider registry answers spark/streaming and None for unknown keys") {
    assert(SetupBundle.pipeline("spark").isDefined)
    assert(SetupBundle.pipeline("streaming").isDefined)
    assert(SetupBundle.pipeline("unknown").isEmpty)
  }

  test("spark starter carries wizard hints, real API calls, and a runnable launcher") {
    val bundle = SetupBundle.spark(Map(
      "spark_runtime" -> "standalone cluster",
      "spark_master" -> "spark://head:7077",
      "spark_workspace_url" -> "https://spark.example.net"))
    val readme = bundle.file("README.md").get.content
    assert(readme.contains("standalone cluster"))
    assert(readme.contains("https://spark.example.net"))

    // the starter uses the REAL library call shapes (SkewSpec runs the
    // same sequence compiled, so these tokens pin starter<->API sync)
    val main = bundle.file("Main.scala").get.content
    assert(main.contains("GovernedIO(contracts, ContractVersionLocator(spark, LakeRoot)"))
    assert(main.contains("io.readPort(spark, DataProductId, InputPort)"))
    assert(main.contains("io.writePort(result, DataProductId, OutputPort, OutputDatasetId)"))

    val run = bundle.file("run.sh").get
    assert(run.executable)
    assert(run.content.contains("spark-submit"))
    assert(run.content.contains("--master \"spark://head:7077\""))
    // ONE --conf per property, every open in the same quoted value —
    // spark-submit keeps only the LAST duplicate --conf key, so per-flag
    // --conf lines would silently drop all but one
    val driverConfs = run.content.linesIterator
      .filter(_.contains("spark.driver.extraJavaOptions")).toSeq
    assert(driverConfs.size == 1)
    assert(driverConfs.head.contains("--add-opens=java.base/java.lang=ALL-UNNAMED"))
    assert(driverConfs.head.contains("--add-opens=java.base/sun.nio.ch=ALL-UNNAMED"))
  }

  test("a hostile spark_master hint cannot reach the executable launcher") {
    val run = SetupBundle.spark(Map(
      "spark_master" -> "spark://h:7077 --deploy-mode cluster; rm -rf /")).file("run.sh").get
    assert(!run.content.contains("rm -rf"))
    assert(run.content.contains("--master \"local[*]\""), "falls back to local[*]")
    // the raw hint still reaches the (non-executable) README, escaped by
    // markdown context only — it is documentation there
    assert(SetupBundle.spark(Map("spark_master" -> "spark://ok:7077"))
      .file("run.sh").get.content.contains("--master \"spark://ok:7077\""))
  }

  test("hint-free export says so instead of rendering an empty hint block") {
    val readme = SetupBundle.spark().file("README.md").get.content
    assert(readme.contains("(no runtime-specific hints were recorded)"))
  }

  test("streaming starter binds ContractStream with a checkpoint") {
    val main = SetupBundle.streaming().file("StreamMain.scala").get.content
    assert(main.contains("ContractStream.read(spark, SourcePath, contract)"))
    assert(main.contains("checkpointLocation = CheckpointRoot"))
  }

  test("write honours the executable bit") {
    val root = tmp()
    SetupBundle.spark().write(root)
    val base = java.nio.file.Paths.get(root, "spark_pipeline")
    assert(Files.isExecutable(base.resolve("run.sh")))
    assert(!Files.isExecutable(base.resolve("README.md")))
  }

  test("the generated service config boots verbatim through ServiceBootstrap") {
    val root = tmp()
    val bundle = SetupBundle.service(s"$root/data", token = Some("s3cret"))
    bundle.write(root)
    val configPath = s"$root/governance_service/config.toml"
    assert(Files.exists(java.nio.file.Paths.get(configPath)))
    assert(bundle.file("run-service.sh").get.content.contains("graft.service.ServiceMain"))

    val server = ServiceBootstrap.fromFile(configPath)
    val port = server.start()
    try {
      val client = HttpClient.newHttpClient()
      def get(path: String, token: Option[String]): Int = {
        val b = HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$port$path"))
        token.foreach(t => b.header("Authorization", s"Bearer $t"))
        client.send(b.GET().build(), HttpResponse.BodyHandlers.ofString()).statusCode()
      }
      assert(get("/health", None) == 200)           // liveness stays open
      assert(get("/contracts", None) == 401)        // [auth] section took
      assert(get("/contracts", Some("s3cret")) == 200)
      assert(get("/products", Some("s3cret")) == 200) // [data_product] took
    } finally server.stop()
  }

  test("module-aware pipeline example: selected modules in, unselected out, loud typos") {
    val all = SetupBundle.pipelineExample("spark", SetupBundle.ExampleModules)
    val main = all.file("ExampleMain.scala").get.content
    // every selected module contributes its helper AND its call, with
    // the real graft call shapes
    assert(main.contains("def reviewContractVersions") &&
      main.contains("reviewContractVersions(clients.contracts)"))
    assert(main.contains("def syncDataProductCatalog") &&
      main.contains("syncDataProductCatalog(pb)"))
    assert(main.contains("def runQualityChecks") &&
      main.contains("Expectations.fromContract"))
    assert(main.contains("def publishGovernanceUpdates") &&
      main.contains("linkDatasetContract(OutputDatasetId, ContractId, ContractVersion)"))
    // bootstrap is the SAME config schema the service bundle exports
    assert(main.contains("ServiceBootstrap.clientsFromFile"))
    // spark integration block
    assert(main.contains("SparkSession.builder()"))
    // an unselected module leaves no trace (the reference's flag gating)
    val some = SetupBundle.pipelineExample("spark", Seq("contracts", "governance"))
      .file("ExampleMain.scala").get.content
    assert(some.contains("reviewContractVersions") &&
      some.contains("publishGovernanceUpdates"))
    assert(!some.contains("syncDataProductCatalog") &&
      !some.contains("runQualityChecks"))
    // module order is canonical regardless of the selection order
    val reordered = SetupBundle.pipelineExample("spark",
      Seq("governance", "contracts")).file("ExampleMain.scala").get.content
    assert(reordered == some)
    // a typo'd module fails loudly, never silently drops the section
    val e = intercept[IllegalArgumentException] {
      SetupBundle.pipelineExample("spark", Seq("contracts", "qualty"))
    }
    assert(e.getMessage.contains("qualty"))
  }

  test("pipeline example integrations: dlt stub, documented fallback for unknown keys") {
    val dlt = SetupBundle.pipelineExample("dlt", Seq("data_quality"),
      hints = Map("dlt_pipeline_name" -> "nightly_curation"))
    assert(dlt.file("ExampleMain.scala").get.content.contains("DltExpectations"))
    assert(dlt.file("README.md").get.content.contains("nightly_curation"))
    val other = SetupBundle.pipelineExample("flink", Seq("contracts"))
      .file("ExampleMain.scala").get.content
    assert(other.contains("no dedicated stub for integration 'flink'"))
    assert(other.contains("reviewContractVersions"), "backends still wire on fallback")
    // a hostile integration key cannot close the generated comment block
    val hostile = SetupBundle.pipelineExample("*/ evil", Seq("contracts"))
      .file("ExampleMain.scala").get.content
    assert(!hostile.contains("*/ evil"))
  }

  test("a host binding flows bundle -> config -> bootstrap -> bound server") {
    val root = tmp()
    SetupBundle.service(s"$root/data", host = Some("127.0.0.1"), port = Some(0))
      .write(root)
    val config = java.nio.file.Files.readString(
      java.nio.file.Paths.get(s"$root/governance_service/config.toml"))
    assert(config.contains("host = \"127.0.0.1\""))
    val server = ServiceBootstrap.fromToml(config)
    val port = server.start()
    try {
      val r = HttpClient.newHttpClient().send(
        HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$port/health")).GET().build(),
        HttpResponse.BodyHandlers.ofString())
      assert(r.statusCode() == 200)
    } finally server.stop()
  }
}
