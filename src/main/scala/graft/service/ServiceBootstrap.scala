package graft.service

import graft.contracts.{ContractStore, FsContractStore, JdbcContractStore}
import graft.governance.{FsGovernanceStore, GovernanceBackend, GovernanceStore, JdbcGovernanceStore}
import graft.products.DataProductBackend

/** Config-file bootstrap for the HTTP facade — the reference deploys its
  * server from a TOML config that names the store bindings
  * (`dc43-service-backends/src/dc43_service_backends/config.py:125-246` +
  * `bootstrap.py:509` `build_backends`), so an operator brings the
  * service up WITHOUT writing code. Same here: a TOML document with the
  * reference's section names builds a ready-to-`start()`
  * [[GovernanceHttpServer]].
  *
  * Supported sections / keys (everything else is rejected loudly — a
  * typo'd binding must never silently fall back to a default store):
  *
  * {{{
  * [contract_store]              # required
  * type = "filesystem"           # or "jdbc"
  * root = "/srv/contracts"       # filesystem: required
  * dsn  = "jdbc:derby:..."       # jdbc: required
  * table = "contracts"           # jdbc: optional
  *
  * [governance_store]            # required
  * type = "filesystem"           # or "jdbc"
  * root = "/srv/governance"
  * dsn  = "jdbc:..."             # jdbc: required
  * prefix = "governance"         # jdbc: optional table-name prefix
  *
  * [data_product]                # optional — omit to serve no /products
  * root = "/srv/products"
  *
  * [auth]                        # optional — omit for an open server
  * token = "s3cret"              # accepted bearer token
  *
  * [server]                      # optional
  * port = 8081                   # default 0 = ephemeral
  * host = "0.0.0.0"              # bind address, default 127.0.0.1
  * }}}
  *
  * The TOML subset parsed is exactly what the bindings need: `[section]`
  * headers, `key = "string" | integer | true | false`, full-line or
  * trailing `#` comments. Spark-session-backed stores
  * (SparkTable/Delta) are deliberately NOT bootstrappable from a config
  * file — they need a live session, which no file can carry; construct
  * those in code. */
object ServiceBootstrap {

  /** Parse the TOML subset. Unknown syntax fails with the line number. */
  def parseToml(text: String): Map[String, Map[String, String]] = {
    val out = scala.collection.mutable.LinkedHashMap
      .empty[String, scala.collection.mutable.LinkedHashMap[String, String]]
    var section: String = ""
    for ((raw, i) <- text.linesIterator.zipWithIndex) {
      // strip a trailing comment, but never inside a quoted value
      val line = {
        val sb = new StringBuilder
        var inQ = false
        var done = false
        for (c <- raw if !done) {
          if (c == '"') { inQ = !inQ; sb += c }
          else if (c == '#' && !inQ) done = true
          else sb += c
        }
        sb.result().trim
      }
      if (line.nonEmpty) {
        if (line.startsWith("[") && line.endsWith("]")) {
          section = line.substring(1, line.length - 1).trim
          require(section.nonEmpty, s"line ${i + 1}: empty section header")
          out.getOrElseUpdate(section, scala.collection.mutable.LinkedHashMap.empty)
        } else line.split("=", 2) match {
          case Array(k, v) =>
            val key = k.trim
            val value = v.trim match {
              case q if q.length >= 2 && q.startsWith("\"") && q.endsWith("\"") =>
                q.substring(1, q.length - 1)
              case b if b == "true" || b == "false" => b
              case n if n.matches("-?\\d+") => n
              case other => throw new IllegalArgumentException(
                s"line ${i + 1}: unsupported value syntax: $other " +
                  "(quoted string, integer, or boolean)")
            }
            require(key.nonEmpty, s"line ${i + 1}: empty key")
            out.getOrElseUpdate(section,
              scala.collection.mutable.LinkedHashMap.empty).put(key, value)
          case _ => throw new IllegalArgumentException(
            s"line ${i + 1}: expected [section] or key = value, got: $line")
        }
      }
    }
    out.map { case (s, kvs) => s -> kvs.toMap }.toMap
  }

  private def requireKey(sec: Map[String, String], section: String, key: String): String =
    sec.getOrElse(key, throw new IllegalArgumentException(
      s"[$section] requires '$key' for type '${sec.getOrElse("type", "filesystem")}'"))

  private val KnownSections = Set(
    "contract_store", "governance_store", "data_product", "auth", "server",
    "governance")

  /** Keys each section may carry — a typo'd KEY must fail as loudly as a
    * typo'd section, or `prot = 8080` silently binds an ephemeral port
    * and `prefx = "prod_gov"` silently reads the default tables. */
  private val KnownKeys: Map[String, Set[String]] = Map(
    "contract_store" -> Set("type", "root", "dsn", "table"),
    "governance_store" -> Set("type", "root", "dsn", "prefix"),
    "data_product" -> Set("root"),
    "auth" -> Set("token"),
    "server" -> Set("port", "host"),
    "governance" -> Set("publication_mode"))

  private def requireKnownKeys(config: Map[String, Map[String, String]]): Unit =
    for ((section, kvs) <- config; known <- KnownKeys.get(section)) {
      val unknown = kvs.keySet.diff(known)
      require(unknown.isEmpty,
        s"[$section] unknown key(s): ${unknown.toSeq.sorted.mkString(", ")} " +
          s"(supported: ${known.toSeq.sorted.mkString(", ")})")
    }

  private def contractStore(sec: Map[String, String]): ContractStore =
    sec.getOrElse("type", "filesystem") match {
      case "filesystem" => new FsContractStore(requireKey(sec, "contract_store", "root"))
      case "jdbc" => new JdbcContractStore(requireKey(sec, "contract_store", "dsn"),
        table = sec.getOrElse("table", "contracts"))
      case t => throw new IllegalArgumentException(
        s"[contract_store] unknown type '$t' (filesystem | jdbc; " +
          "Spark-table stores need a live session — construct in code)")
    }

  private def governanceStore(sec: Map[String, String]): GovernanceStore =
    sec.getOrElse("type", "filesystem") match {
      case "filesystem" => new FsGovernanceStore(requireKey(sec, "governance_store", "root"))
      case "jdbc" => new JdbcGovernanceStore(requireKey(sec, "governance_store", "dsn"),
        prefix = sec.getOrElse("prefix", "governance"))
      case t => throw new IllegalArgumentException(
        s"[governance_store] unknown type '$t' (filesystem | jdbc; " +
          "Spark-table stores need a live session — construct in code)")
    }

  /** The store-section wiring shared by the server build and local
    * client mode — one copy, so a store type added for the server can
    * never silently lag behind client-mode bootstrap. */
  private def localBackends(config: Map[String, Map[String, String]],
                            orSection: String = "")
      : (ContractStore, GovernanceBackend, Option[DataProductBackend]) = {
    val contracts = contractStore(config.getOrElse("contract_store",
      throw new IllegalArgumentException(
        s"config must have a [contract_store]$orSection section")))
    val gov = new GovernanceBackend(governanceStore(config.getOrElse("governance_store",
      throw new IllegalArgumentException(
        s"config must have a [governance_store]$orSection section"))),
      Some(contracts))
    val products = config.get("data_product").map(sec =>
      new DataProductBackend(requireKey(sec, "data_product", "root")))
    (contracts, gov, products)
  }

  /** Build an unstarted server from a parsed config. */
  def build(config: Map[String, Map[String, String]]): GovernanceHttpServer = {
    val unknown = config.keySet.diff(KnownSections)
    require(unknown.isEmpty,
      s"unknown config section(s): ${unknown.toSeq.sorted.mkString(", ")} " +
        s"(supported: ${KnownSections.toSeq.sorted.mkString(", ")})")
    requireKnownKeys(config)
    val (contracts, gov, products) = localBackends(config)
    val auth = config.get("auth").map(sec =>
      BearerAuth.token(requireKey(sec, "auth", "token")))
    val port = config.get("server").flatMap(_.get("port")).map(_.toInt).getOrElse(0)
    val host = config.get("server").flatMap(_.get("host")).getOrElse("127.0.0.1")
    new GovernanceHttpServer(contracts, gov, port = port,
      products = products, auth = auth, host = host)
  }

  /** Parse + build in one step — the deployment entry point. */
  def fromToml(text: String): GovernanceHttpServer = build(parseToml(text))

  def fromFile(path: String): GovernanceHttpServer =
    fromToml(java.nio.file.Files.readString(java.nio.file.Paths.get(path)))

  // ------------------------------------------------------------------
  // client-side bootstrap (the reference's `load_service_clients`)
  // ------------------------------------------------------------------

  /** The service trio a pipeline binds — all three families behind
    * their transport-agnostic surfaces, so pipeline code is identical
    * in local and remote mode (the reference's `ServiceClientsSuite`,
    * `dc43-service-clients/.../bootstrap.py:28`). */
  final case class ServiceClients(
      contracts: graft.contracts.ContractStore,
      governance: graft.governance.GovernanceService,
      products: Option[graft.products.DataProductService])

  private val ClientKnownSections = Set(
    "remote", "contract_store", "governance_store", "data_product",
    "governance")

  /** Resolve the governance publication mode from a parsed config — the
    * reference's `resolve_publication_mode` over the deployment file:
    * the `[governance] publication_mode` key feeds
    * [[graft.governance.PublicationMode.resolve]] as its config
    * candidate (environment still wins, unknown candidates skip, the
    * default is legacy). Exposed for BOTH bootstrap paths: a pipeline
    * resolves the mode alongside `clientsFromToml` and builds its
    * [[graft.obs.ObservationSink]] via `PublicationMode.sink`, so
    * flipping telemetry on is a config edit, not a code change. */
  def publicationMode(config: Map[String, Map[String, String]],
                      env: Map[String, String] = sys.env)
      : graft.governance.PublicationMode =
    graft.governance.PublicationMode.resolve(
      config = config.get("governance").flatMap(_.get("publication_mode"))
        .map(v => Map(graft.governance.PublicationMode.ConfigKeys.head -> v))
        .getOrElse(Map.empty),
      env = env)

  /** Build the pipeline-side clients from a TOML config — the
    * reference's `load_service_clients` (`bootstrap.py:44`: remote
    * clients when an http binding with a base URL is configured, local
    * backends otherwise). A `[remote]` section routes ALL THREE
    * families at the facade:
    *
    * {{{
    * [remote]
    * base_url = "http://governance:8081"
    * token = "s3cret"            # optional bearer
    * }}}
    *
    * Without `[remote]`, the store sections build local backends
    * exactly as the server bootstrap does (same keys, same loud
    * rejection of typos); `[data_product]` stays optional in both
    * modes. Mixing `[remote]` with store sections is rejected — half
    *-local half-remote wiring is a deployment bug, not a feature. */
  def clientsFromToml(text: String): ServiceClients = {
    val config = parseToml(text)
    val unknown = config.keySet.diff(ClientKnownSections)
    require(unknown.isEmpty,
      s"unknown config section(s): ${unknown.toSeq.sorted.mkString(", ")} " +
        s"(supported: ${ClientKnownSections.toSeq.sorted.mkString(", ")})")
    config.get("remote") match {
      case Some(sec) =>
        // [governance] (publication mode) is orthogonal to transport —
        // it may accompany either mode; only STORE sections conflict
        require((config.keySet - "remote" - "governance").isEmpty,
          "[remote] routes every family at the facade; drop the store sections " +
            s"(found: ${(config.keySet - "remote" - "governance").toSeq.sorted.mkString(", ")})")
        val extraKeys = sec.keySet.diff(Set("base_url", "token"))
        require(extraKeys.isEmpty,
          s"[remote] unknown key(s): ${extraKeys.toSeq.sorted.mkString(", ")} " +
            "(supported: base_url, token)")
        val url = sec.getOrElse("base_url", throw new IllegalArgumentException(
          "[remote] requires 'base_url' (the facade's http address)"))
        val token = sec.get("token")
        ServiceClients(
          new HttpContractStore(url, bearerToken = token),
          new HttpGovernanceClient(url, bearerToken = token),
          Some(new HttpDataProductClient(url, bearerToken = token)))
      case None =>
        requireKnownKeys(config)
        val (contracts, gov, products) =
          localBackends(config, orSection = " or [remote]")
        ServiceClients(contracts, gov, products)
    }
  }

  def clientsFromFile(path: String): ServiceClients =
    clientsFromToml(java.nio.file.Files.readString(java.nio.file.Paths.get(path)))
}

/** Foreground deployment entry point — the reference serves its backends
  * as a long-running process from a config file (`bootstrap.py` +
  * `server.py`); here `java -cp ... graft.service.ServiceMain
  * config.toml` (or the launcher [[SetupBundle]] writes) does the same:
  * build from config, bind, print the port, stay up until the
  * supervisor kills the process. */
object ServiceMain {
  def main(args: Array[String]): Unit = {
    require(args.length == 1, "usage: graft.service.ServiceMain <config.toml>")
    val server = ServiceBootstrap.fromFile(args(0))
    val port = server.start()
    println(s"graft governance service listening on port $port")
    new java.util.concurrent.CountDownLatch(1).await()
  }
}
