package graft.service

import java.nio.file.{Files, Path, Paths}
import java.nio.file.attribute.PosixFilePermissions

/** One generated file of a setup bundle — the reference's `PipelineFile`
  * (`dc43-integrations/src/dc43_integrations/setup_bundle/__init__.py:22-28`:
  * path, content, executable bit). */
final case class BundleFile(path: String, content: String, executable: Boolean = false)

/** A miniature deployable project — the reference's `PipelineProject`
  * (`setup_bundle/__init__.py:31-37`). `write` materialises it under a
  * root directory, honouring the executable bit (POSIX 755 vs 644). */
final case class Bundle(root: String, entrypoint: String, files: Seq[BundleFile]) {

  def file(path: String): Option[BundleFile] = files.find(_.path == path)

  def write(targetDir: String): Seq[Path] = {
    val base = Paths.get(targetDir, root)
    Files.createDirectories(base)
    files.map { f =>
      val p = base.resolve(f.path)
      Option(p.getParent).foreach(Files.createDirectories(_))
      Files.writeString(p, f.content)
      try Files.setPosixFilePermissions(p, PosixFilePermissions.fromString(
        if (f.executable) "rwxr-xr-x" else "rw-r--r--"))
      catch { case _: UnsupportedOperationException => () } // non-POSIX fs
      p
    }
  }
}

/** Deployment-bundle generator — the Spark-first twin of the reference's
  * setup-wizard export (`dc43-integrations/.../setup_bundle/spark/
  * pipeline_stub.py`: a starter project with a README carrying the
  * wizard's runtime hints, an entrypoint with placeholder constants for
  * the governed ports, and launch scaffolding). The reference registers
  * per-runtime stub providers under string keys ("spark", "dlt") and
  * answers `None` for unknown keys (`setup_bundle/__init__.py:62-73`);
  * [[pipeline]] mirrors that registry contract with graft's runtimes:
  *
  *  - `"spark"`     — batch pipeline: governed read port → transform →
  *    governed write port, launched by `spark-submit`
  *  - `"streaming"` — Structured Streaming twin over `ContractStream`
  *
  * [[service]] generates the facade deployment (the reference deploys
  * its service backends from a TOML config + process supervisor): a
  * `config.toml` that [[ServiceBootstrap]] can boot verbatim and a
  * launcher for [[ServiceMain]].
  *
  * Everything generated is plain text the operator is expected to edit —
  * hint values are interpolated into comments and docs only, never into
  * code identifiers, so no hint value can make a bundle fail to compile. */
object SetupBundle {

  private def hint(hints: Map[String, String], key: String): String =
    hints.getOrElse(key, "").trim

  /** Wizard-hint block for the README — the reference records whichever
    * hints were captured and says so when none were
    * (`spark/pipeline_stub.py:25-36`). */
  private def hintLines(hints: Map[String, String], keys: Seq[(String, String)]): String = {
    val captured = keys.flatMap { case (k, label) =>
      Option(hint(hints, k)).filter(_.nonEmpty).map(v => s"- $label: $v")
    }
    ("Wizard hints captured during export:" +:
      (if (captured.isEmpty) Seq("- (no runtime-specific hints were recorded)")
       else captured)).mkString("\n")
  }

  /** The JDK17 module flags a Spark 4 driver needs — the same set the
    * build forks tests with; a generated launcher that omits them dies
    * on `InaccessibleObjectException` before `main`. ONE `--conf` per
    * property with the flags space-joined in a quoted value:
    * spark-submit keeps the LAST duplicate `--conf` key, so emitting
    * one `--conf` per flag would silently drop all but the final one. */
  private val JvmFlags: String = {
    val opens = Seq(
      "--add-opens=java.base/java.lang=ALL-UNNAMED",
      "--add-opens=java.base/java.lang.invoke=ALL-UNNAMED",
      "--add-opens=java.base/java.nio=ALL-UNNAMED",
      "--add-opens=java.base/java.util=ALL-UNNAMED",
      "--add-opens=java.base/sun.nio.ch=ALL-UNNAMED",
      "--add-opens=java.base/sun.util.calendar=ALL-UNNAMED").mkString(" ")
    s"""  --conf "spark.driver.extraJavaOptions=$opens" \\
       |  --conf "spark.executor.extraJavaOptions=$opens" \\""".stripMargin
  }

  /** Shell-safe master URL: wizard hints are untrusted text, and
    * `--master` is the one place a hint reaches an EXECUTABLE file, so
    * anything outside the master-URL alphabet (local[*], spark://h:p,
    * yarn, k8s://https://…) falls back to local[*] — the raw hint still
    * appears, escaped, in the README. The launcher also quotes it. */
  private def safeMaster(hints: Map[String, String]): String = {
    val m = hint(hints, "spark_master")
    if (m.nonEmpty && m.matches("[A-Za-z0-9\\[\\]*.:/_-]+")) m else "local[*]"
  }

  // ------------------------------------------------------------------
  // pipeline bundles (the reference's per-runtime stub registry)
  // ------------------------------------------------------------------

  /** Provider registry — `None` for an unknown runtime key, like the
    * reference's `get_pipeline_stub`. */
  def pipeline(key: String, hints: Map[String, String] = Map.empty): Option[Bundle] =
    key match {
      case "spark"     => Some(spark(hints))
      case "streaming" => Some(streaming(hints))
      case _           => None
    }

  def spark(hints: Map[String, String] = Map.empty): Bundle = {
    val readme =
      s"""# Spark pipeline starter
         |
         |A governed batch pipeline over the graft library. `Main.scala`
         |shows the full loop:
         |
         |- bind the service backends (local stores here; swap in
         |  `HttpContractStore` against a deployed facade)
         |- read the data product's input port with contract alignment and
         |  validation (`GovernedIO.readPort`)
         |- apply a transformation (replace the placeholder)
         |- publish through the output port (`GovernedIO.writePort`) so the
         |  verdict and activity land in governance
         |
         |Replace the placeholder constants in `Main.scala`, build your
         |assembly jar, then `./run.sh`.
         |
         |${hintLines(hints, Seq(
             "spark_runtime" -> "Runtime",
             "spark_master" -> "Master",
             "spark_workspace_url" -> "Workspace URL",
             "spark_cluster" -> "Cluster reference"))}
         |""".stripMargin
    val master = safeMaster(hints)
    val mainScala =
      """package pipeline
        |
        |import graft.contracts.FsContractStore
        |import graft.governance.GovernanceBackend
        |import graft.io.{ContractVersionLocator, GovernedIO}
        |import graft.products.DataProductBackend
        |import org.apache.spark.sql.{DataFrame, SparkSession}
        |
        |object Main {
        |
        |  // -- replace these before running -------------------------------
        |  val DataProductId   = "replace-with-data-product-id"
        |  val InputPort       = "replace-with-input-port"
        |  val OutputPort      = "replace-with-output-port"
        |  val OutputDatasetId = "replace-with-output-dataset-id"
        |  val ServiceRoot     = "replace-with-service-root" // store directories
        |  val LakeRoot        = "replace-with-lake-root"    // dataset files
        |  // ---------------------------------------------------------------
        |
        |  /** Replace the demo transformation with your business logic. */
        |  def transform(df: DataFrame): DataFrame = df
        |
        |  def main(args: Array[String]): Unit = {
        |    val spark = SparkSession.builder()
        |      .appName("graft-governed-pipeline")
        |      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_SHUFFLE_PARTITIONS", "200"))
        |      .getOrCreate()
        |
        |    val contracts = new FsContractStore(s"$ServiceRoot/contracts")
        |    val products = new DataProductBackend(s"$ServiceRoot/products")
        |    val governance = new GovernanceBackend(s"$ServiceRoot/governance", Some(contracts))
        |    val io = GovernedIO(contracts, ContractVersionLocator(spark, LakeRoot),
        |      Some(products), Some(governance))
        |
        |    // aligned + validated read through the product's input binding
        |    val input = io.readPort(spark, DataProductId, InputPort)
        |    val result = transform(input.df)
        |    // governed write: registers the output binding, records the verdict
        |    io.writePort(result, DataProductId, OutputPort, OutputDatasetId)
        |
        |    spark.stop()
        |  }
        |}
        |""".stripMargin
    val runSh =
      s"""#!/usr/bin/env bash
         |# Launch the governed pipeline. Edit APP_JAR to your assembly.
         |set -euo pipefail
         |APP_JAR="replace-with-your-assembly.jar"
         |spark-submit \\
         |  --class pipeline.Main \\
         |  --master "$master" \\
         |$JvmFlags
         |  "$$APP_JAR" "$$@"
         |""".stripMargin
    Bundle("spark_pipeline", "Main.scala", Seq(
      BundleFile("README.md", readme),
      BundleFile("Main.scala", mainScala),
      BundleFile("run.sh", runSh, executable = true)))
  }

  def streaming(hints: Map[String, String] = Map.empty): Bundle = {
    val readme =
      s"""# Streaming pipeline starter
         |
         |The Structured Streaming twin: `ContractStream.read` aligns and
         |validates each micro-batch against the contract, the transform
         |runs on the streaming frame, `ContractStream.write` records
         |per-batch verdicts through the same governance backend. Replace
         |the placeholder constants in `StreamMain.scala`, then `./run.sh`.
         |
         |${hintLines(hints, Seq(
             "spark_runtime" -> "Runtime",
             "spark_master" -> "Master",
             "checkpoint_root" -> "Checkpoint root"))}
         |""".stripMargin
    val mainScala =
      """package pipeline
        |
        |import graft.contracts.FsContractStore
        |import graft.stream.ContractStream
        |import org.apache.spark.sql.{DataFrame, SparkSession}
        |
        |object StreamMain {
        |
        |  // -- replace these before running -------------------------------
        |  val ContractId     = "replace-with-contract-id"
        |  val SourcePath     = "replace-with-input-path"
        |  val SinkPath       = "replace-with-output-path"
        |  val CheckpointRoot = "replace-with-checkpoint-root"
        |  val ServiceRoot    = "replace-with-service-root"
        |  // ---------------------------------------------------------------
        |
        |  def transform(df: DataFrame): DataFrame = df
        |
        |  def main(args: Array[String]): Unit = {
        |    val spark = SparkSession.builder()
        |      .appName("graft-governed-stream")
        |      .getOrCreate()
        |
        |    val contracts = new FsContractStore(s"$ServiceRoot/contracts")
        |    val contract = contracts.latest(ContractId).getOrElse(
        |      sys.error(s"no contract stored under id $ContractId"))
        |
        |    // each micro-batch is aligned + validated against the contract;
        |    // per-batch verdicts go to the observation sink
        |    val in = ContractStream.read(spark, SourcePath, contract)
        |    val query = ContractStream.write(transform(in), SinkPath, contract,
        |      checkpointLocation = CheckpointRoot)
        |    query.awaitTermination()
        |  }
        |}
        |""".stripMargin
    val master = safeMaster(hints)
    val runSh =
      s"""#!/usr/bin/env bash
         |set -euo pipefail
         |APP_JAR="replace-with-your-assembly.jar"
         |spark-submit \\
         |  --class pipeline.StreamMain \\
         |  --master "$master" \\
         |$JvmFlags
         |  "$$APP_JAR" "$$@"
         |""".stripMargin
    Bundle("streaming_pipeline", "StreamMain.scala", Seq(
      BundleFile("README.md", readme),
      BundleFile("StreamMain.scala", mainScala),
      BundleFile("run.sh", runSh, executable = true)))
  }

  // ------------------------------------------------------------------
  // facade deployment bundle
  // ------------------------------------------------------------------

  /** Generate the service deployment: a `config.toml` that
    * [[ServiceBootstrap.fromFile]] boots verbatim (round-tripped by the
    * spec) and a [[ServiceMain]] launcher. Paths land under `dataRoot`;
    * `token`/`port` are optional exactly as in the config schema. */
  def service(dataRoot: String, token: Option[String] = None,
              port: Option[Int] = None, products: Boolean = true,
              /** Bind address for remote pipelines (`[server] host`);
                * None keeps the loopback default. */
              host: Option[String] = None): Bundle = {
    val config = new StringBuilder
    config ++=
      s"""# graft governance service — boots via graft.service.ServiceBootstrap
         |[contract_store]
         |type = "filesystem"
         |root = "$dataRoot/contracts"
         |
         |[governance_store]
         |type = "filesystem"
         |root = "$dataRoot/governance"
         |""".stripMargin
    if (products) config ++=
      s"""
         |[data_product]
         |root = "$dataRoot/products"
         |""".stripMargin
    token.foreach(t => config ++=
      s"""
         |[auth]
         |token = "$t"
         |""".stripMargin)
    if (port.isDefined || host.isDefined) {
      config ++= "\n[server]\n"
      port.foreach(p => config ++= s"port = $p\n")
      host.foreach(h => config ++= s"""host = "$h"\n""")
    }
    val runSh =
      """#!/usr/bin/env bash
        |# Run the governance facade in the foreground (supervise with
        |# systemd / your scheduler). GRAFT_CP must hold the graft jar and
        |# its Spark-provided dependencies.
        |set -euo pipefail
        |HERE="$(cd "$(dirname "$0")" && pwd)"
        |exec java -cp "${GRAFT_CP:?set GRAFT_CP to the graft classpath}" \
        |  graft.service.ServiceMain "$HERE/config.toml"
        |""".stripMargin
    val readme =
      s"""# graft governance service deployment
         |
         |- `config.toml` — store bindings (filesystem under `$dataRoot`;
         |  switch `type = "jdbc"` + `dsn = ...` for shared deployments)
         |- `run-service.sh` — foreground launcher for
         |  `graft.service.ServiceMain`
         |
         |The server answers the JSON service routes and the read-only
         |`/ui` browse pages${token.fold("")(_ => ", bearer-token protected")}.
         |""".stripMargin
    Bundle("governance_service", "run-service.sh", Seq(
      BundleFile("README.md", readme),
      BundleFile("config.toml", config.result()),
      BundleFile("run-service.sh", runSh, executable = true)))
  }

  // ------------------------------------------------------------------
  // module-aware pipeline example (the reference's render_pipeline_stub,
  // `dc43-contracts-app/setup_bundle/pipeline_stub.py:386-669`): the
  // setup wizard's selected SERVICE MODULES each contribute one helper
  // to a single runnable scaffold, and the selected pipeline INTEGRATION
  // contributes its bootstrap block — spark and dlt have dedicated
  // stubs, any other key gets the documented fallback (the backends
  // still work; only the integration-specific bootstrap is generic)
  // ------------------------------------------------------------------

  /** Module keys the example knows — the reference's `_integration_flags`
    * set. Unknown keys are rejected loudly (a typo'd module silently
    * dropping its section would export a scaffold missing the code the
    * operator selected). */
  val ExampleModules: Seq[String] =
    Seq("contracts", "data_products", "data_quality", "governance")

  /** One runnable module-aware example: `ExampleMain.scala` bootstraps
    * the service clients from the bundle's `config.toml`
    * ([[ServiceBootstrap.clientsFromFile]] — local stores or a deployed
    * facade, same code), runs one helper per SELECTED module (real graft
    * call shapes, placeholder ids), and prints the integration hints the
    * wizard captured. `integration` picks the bootstrap block: `spark`
    * (session init), `dlt` (expectation export + local harness shapes),
    * anything else falls back with a note. */
  /** Sanitize an id headed into generated SOURCE text: ids are
    * untrusted wizard/browser input, and a quote or backslash could
    * escape the string literal the stub embeds it in. The kept
    * alphabet covers every id shape the stores mint (`team.dataset`,
    * `dp.analytics-gold`, semvers). */
  private def safeId(v: String): String =
    v.replaceAll("[^A-Za-z0-9._:-]", "")

  /** A bundle set as one ZIP archive — the reference wizard's export
    * payload (`GET /setup/export` streams a zip of the generated
    * project). Entries are `root/path`, bundle order preserved, with a
    * FIXED epoch timestamp so the same selections export byte-identical
    * archives (testable, cache-friendly).
    *
    * EXECUTABLE-BIT caveat: `Bundle.write` sets POSIX 755 on
    * executables, but `java.util.zip` cannot record unix modes (they
    * live in central-directory external attributes the JDK API does
    * not expose), so unzipped scripts land 644. Rather than silently
    * shipping a launcher that answers "Permission denied", the archive
    * carries a generated `UNPACK.txt` whose `chmod +x` line restores
    * every executable — one paste for the operator, and the gap is
    * DOCUMENTED in the artifact itself. */
  def zipOf(bundles: Seq[Bundle]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val zip = new java.util.zip.ZipOutputStream(bos)
    def put(name: String, content: String): Unit = {
      val e = new java.util.zip.ZipEntry(name)
      e.setTime(0L)
      zip.putNextEntry(e)
      zip.write(content.getBytes("UTF-8"))
      zip.closeEntry()
    }
    val executables = bundles.flatMap(b =>
      b.files.filter(_.executable).map(f => s"${b.root}/${f.path}"))
    try {
      if (executables.nonEmpty)
        put("UNPACK.txt",
          "Zip archives cannot carry the POSIX executable bit.\n" +
            "After unpacking, restore it with:\n\n" +
            s"  chmod +x ${executables.mkString(" ")}\n")
      bundles.foreach(b =>
        b.files.foreach(f => put(s"${b.root}/${f.path}", f.content)))
    } finally zip.close()
    bos.toByteArray
  }

  /** `ids` (all optional) pre-fill the stub's placeholder constants —
    * the integration-helper flow (reference
    * `POST /api/integration-helper/stub`: pick a contract/product in
    * the browser, get the stub with ids inline): keys `contract_id`,
    * `contract_version`, `data_product_id`, `output_dataset_id`;
    * values are [[safeId]]-sanitized before entering source text. */
  def pipelineExample(integration: String,
                      modules: Seq[String],
                      hints: Map[String, String] = Map.empty,
                      ids: Map[String, String] = Map.empty): Bundle = {
    val unknown = modules.filterNot(ExampleModules.contains)
    require(unknown.isEmpty,
      s"unknown module(s): ${unknown.mkString(", ")} " +
        s"(supported: ${ExampleModules.mkString(", ")})")
    val selected = ExampleModules.filter(modules.contains) // canonical order

    val integrationBlock = integration match {
      case "spark" =>
        """    // integration: spark — a session for governed reads/writes
          |    val spark = org.apache.spark.sql.SparkSession.builder()
          |      .appName("graft-pipeline-example").getOrCreate()
          |    println(s"[spark] session started: ${spark.version}")""".stripMargin
      case "dlt" =>
        """    // integration: dlt — export the contract's expectations to
          |    // DLT decorators, or dry-run them locally first:
          |    //   val specs = graft.quality.Expectations.fromContract(contract)
          |    //   val dlt = graft.quality.DltExpectations.exportAll(specs)
          |    //   val harness = new graft.quality.LocalDltHarness(spark)
          |    println("[dlt] wire DltExpectations into your pipeline notebook")""".stripMargin
      case other =>
        // the key is untrusted wizard text headed into generated SOURCE:
        // strip anything that could escape a comment or a string literal
        val safe = other.replaceAll("[^A-Za-z0-9._-]", "")
        s"""    // integration: '$safe' has no dedicated
           |    // bootstrap stub — the service clients below work unchanged;
           |    // add your runtime's session/bootstrap code here
           |    println("[bundle] no dedicated stub for integration '$safe'")""".stripMargin
    }

    val helperDefs = selected.map {
      case "contracts" =>
        """  /** Outline: load contract revisions before running tasks. */
          |  def reviewContractVersions(contracts: graft.contracts.ContractStore): Unit = {
          |    println(s"[contracts] store: ${contracts.getClass.getSimpleName}")
          |    val contractId = ContractId
          |    contracts.listVersions(contractId) match {
          |      case Seq() => println(s"[contracts] no versions of $contractId yet")
          |      case vs => println(s"[contracts] $contractId versions: ${vs.mkString(", ")}; " +
          |        s"latest resolves ${contracts.latest(contractId).map(_.version)}")
          |    }
          |  }""".stripMargin
      case "data_products" =>
        """  /** Outline: register ports in the configured backend. */
          |  def syncDataProductCatalog(products: graft.products.DataProductService): Unit = {
          |    println(s"[data_products] backend: ${products.getClass.getSimpleName}")
          |    // products.registerOutputPort(DataProductId,
          |    //   graft.products.OutputPort("gold", ContractVersion, ContractId))
          |    println(s"[data_products] latest $DataProductId: " +
          |      products.latest(DataProductId).flatMap(_.version))
          |  }""".stripMargin
      case "data_quality" =>
        """  /** Outline: evaluate observations against a stored contract. */
          |  def runQualityChecks(contracts: graft.contracts.ContractStore): Unit = {
          |    contracts.get(ContractId, ContractVersion) match {
          |      case None => println(s"[data_quality] store $ContractId:$ContractVersion first")
          |      case Some(contract) =>
          |        val specs = graft.quality.Expectations.fromContract(contract)
          |        println(s"[data_quality] ${specs.size} expectations ready")
          |        // one-pass metrics + verdict:
          |        // val metrics = graft.quality.Metrics.compute(df, specs)
          |        // val res = graft.quality.Evaluator.validate(contract, df)
          |    }
          |  }""".stripMargin
      case "governance" =>
        """  /** Outline: persist validation status + pipeline activity. */
          |  def publishGovernanceUpdates(gov: graft.governance.GovernanceService): Unit = {
          |    println(s"[governance] service: ${gov.getClass.getSimpleName}")
          |    gov.linkDatasetContract(OutputDatasetId, ContractId, ContractVersion)
          |    println(s"[governance] datasets under governance: ${gov.listDatasets().size}")
          |  }""".stripMargin
    }

    val helperCalls = selected.map {
      case "contracts" => "    reviewContractVersions(clients.contracts)"
      case "data_products" =>
        """    clients.products match {
          |      case Some(pb) => syncDataProductCatalog(pb)
          |      case None => println("[data_products] no [data_product] section in config.toml")
          |    }""".stripMargin
      case "data_quality" => "    runQualityChecks(clients.contracts)"
      case "governance" => "    publishGovernanceUpdates(clients.governance)"
    }

    val summaries = selected.map(m => s"//  - $m").mkString("\n")
    val mainScala =
      s"""package pipeline
         |
         |// Generated module-aware pipeline example. Selected modules:
         |$summaries
         |// Integration: ${integration.replaceAll("[^A-Za-z0-9._-]", "")}
         |
         |object ExampleMain {
         |
         |  // -- replace these before running -------------------------------
         |  val ContractId      = "${ids.get("contract_id").map(safeId)
                                      .filter(_.nonEmpty)
                                      .getOrElse("replace-with-contract-id")}"
         |  val ContractVersion = "${ids.get("contract_version").map(safeId)
                                      .filter(_.nonEmpty).getOrElse("1.0.0")}"
         |  val DataProductId   = "${ids.get("data_product_id").map(safeId)
                                      .filter(_.nonEmpty)
                                      .getOrElse("replace-with-data-product-id")}"
         |  val OutputDatasetId = "${ids.get("output_dataset_id").map(safeId)
                                      .filter(_.nonEmpty)
                                      .getOrElse("replace-with-output-dataset-id")}"
         |  // ---------------------------------------------------------------
         |
         |${helperDefs.mkString("\n\n")}
         |
         |  def main(args: Array[String]): Unit = {
         |    // local stores or a deployed facade — the SAME config schema
         |    // ([remote] base_url vs store sections); swap transports with
         |    // zero code change
         |    val clients = graft.service.ServiceBootstrap.clientsFromFile(
         |      args.headOption.getOrElse("config.toml"))
         |$integrationBlock
         |${helperCalls.mkString("\n")}
         |  }
         |}
         |""".stripMargin
    val readme =
      s"""# graft pipeline example (module-aware)
         |
         |Generated for integration `$integration` with modules:
         |${selected.map(m => s"- $m").mkString("\n")}
         |
         |`ExampleMain.scala` bootstraps the service clients from
         |`config.toml` (export one with the service bundle) and runs one
         |helper per selected module — each helper is the real graft call
         |shape with placeholder ids to replace.
         |
         |${hintLines(hints, Seq(
             "spark_runtime" -> "Runtime",
             "spark_workspace_url" -> "Workspace URL",
             "dlt_pipeline_name" -> "DLT pipeline",
             "dlt_target_schema" -> "DLT target schema"))}
         |""".stripMargin
    Bundle("pipeline_example", "ExampleMain.scala", Seq(
      BundleFile("README.md", readme),
      BundleFile("ExampleMain.scala", mainScala)))
  }
}
