package graft.service

import graft.{DemoContracts, SparkSpec}
import graft.contracts.FsContractStore
import graft.governance.GovernanceBackend

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}

/** Bearer-token auth (reference `auth.py:28` bearer_token_dependency →
  * `server.py` wiring) and the config-file bootstrap (reference
  * `config.py` + `bootstrap.py`) — the facade's deployment-mode seams. */
class AuthBootstrapSpec extends SparkSpec {

  private def req(url: String, token: Option[String]): (Int, String) = {
    val b = HttpRequest.newBuilder(URI.create(url)).GET()
    token.foreach(t => b.header("Authorization", s"Bearer $t"))
    val r = HttpClient.newHttpClient().send(b.build(),
      HttpResponse.BodyHandlers.ofString())
    (r.statusCode(), r.body())
  }

  private def withAuthServer[A](auth: Option[BearerAuth])
                               (f: (String, FsContractStore) => A): A = {
    val root = tmpDir("graft_auth")
    val store = new FsContractStore(s"$root/contracts")
    val gov = new GovernanceBackend(s"$root/governance", Some(store))
    val server = new GovernanceHttpServer(store, gov, auth = auth)
    val port = server.start()
    try f(s"http://127.0.0.1:$port", store) finally server.stop()
  }

  test("auth configured: no/wrong token is 401 + challenge, valid token 200, health open") {
    withAuthServer(Some(BearerAuth.token("s3cret"))) { (url, _) =>
      val (noTok, body) = req(s"$url/contracts", None)
      assert(noTok == 401 && body.contains("unauthorized"))
      assert(req(s"$url/contracts", Some("wrong"))._1 == 401)
      // malformed scheme is 401 too, same body (no oracle for the prober)
      val basic = HttpRequest.newBuilder(URI.create(s"$url/contracts"))
        .header("Authorization", "Basic s3cret").GET().build()
      assert(HttpClient.newHttpClient()
        .send(basic, HttpResponse.BodyHandlers.ofString()).statusCode() == 401)
      assert(req(s"$url/contracts", Some("s3cret"))._1 == 200)
      // scheme name is case-insensitive (RFC 7235)
      val lower = HttpRequest.newBuilder(URI.create(s"$url/contracts"))
        .header("Authorization", "bearer s3cret").GET().build()
      assert(HttpClient.newHttpClient()
        .send(lower, HttpResponse.BodyHandlers.ofString()).statusCode() == 200)
      // liveness probe stays open for the load balancer
      assert(req(s"$url/health", None)._1 == 200)
    }
  }

  test("no auth configured: everything stays open (unchanged default)") {
    withAuthServer(None) { (url, _) =>
      assert(req(s"$url/contracts", None)._1 == 200)
      assert(req(s"$url/health", None)._1 == 200)
    }
  }

  test("HttpContractStore sends the token; without one the server refuses") {
    withAuthServer(Some(BearerAuth.token("tok-1"))) { (url, store) =>
      val bare = new HttpContractStore(url)
      val ex = intercept[java.io.IOException] { bare.listContractIds() }
      assert(ex.getMessage.contains("401"))
      val authed = new HttpContractStore(url, bearerToken = Some("tok-1"))
      authed.put(DemoContracts.lineitem)
      assert(store.get(DemoContracts.lineitem.id, DemoContracts.lineitem.version).nonEmpty)
      assert(authed.listContractIds() == Seq(DemoContracts.lineitem.id))
    }
  }

  test("BearerAuth accepts any listed token or a verifier; empty policy rejected") {
    val multi = BearerAuth(tokens = Set("a", "b"))
    assert(multi.accepts("a") && multi.accepts("b") && !multi.accepts("c"))
    val byVerifier = BearerAuth(verifier = Some(_.startsWith("svc-")))
    assert(byVerifier.accepts("svc-x") && !byVerifier.accepts("x"))
    intercept[IllegalArgumentException] { BearerAuth() }
  }

  test("bootstrap: a TOML config brings up the full facade without code") {
    val root = tmpDir("graft_boot")
    val toml =
      s"""# deployment config — the reference's section names
         |[contract_store]
         |type = "filesystem"          # trailing comment
         |root = "$root/contracts"
         |
         |[governance_store]
         |type = "filesystem"
         |root = "$root/gov"
         |
         |[data_product]
         |root = "$root/products"
         |
         |[auth]
         |token = "boot-secret"
         |""".stripMargin
    val server = ServiceBootstrap.fromToml(toml)
    val port = server.start()
    val url = s"http://127.0.0.1:$port"
    try {
      assert(req(s"$url/health", None)._1 == 200)
      assert(req(s"$url/contracts", None)._1 == 401, "auth section must bind")
      assert(req(s"$url/contracts", Some("boot-secret"))._1 == 200)
      // the data_product section attached the /products family
      assert(req(s"$url/products", Some("boot-secret"))._1 == 200)
      // remote client against the booted server, stores really persist
      val remote = new HttpContractStore(url, bearerToken = Some("boot-secret"))
      remote.put(DemoContracts.lineitem)
      assert(new FsContractStore(s"$root/contracts")
        .get(DemoContracts.lineitem.id, DemoContracts.lineitem.version).nonEmpty)
    } finally server.stop()
  }

  test("bootstrap: jdbc bindings, server port and omitted sections") {
    val root = tmpDir("graft_boot_jdbc")
    val toml =
      s"""[contract_store]
         |type = "jdbc"
         |dsn = "jdbc:derby:$root/db;create=true"
         |
         |[governance_store]
         |type = "jdbc"
         |dsn = "jdbc:derby:$root/gov;create=true"
         |prefix = "gov"
         |""".stripMargin
    val server = ServiceBootstrap.fromToml(toml)
    val port = server.start()
    try {
      val url = s"http://127.0.0.1:$port"
      assert(req(s"$url/contracts", None)._1 == 200, "no [auth] = open server")
      assert(req(s"$url/products", None)._1 == 404, "no [data_product] = no routes")
      val remote = new HttpContractStore(url)
      remote.put(DemoContracts.lineitem)
      assert(remote.listContractIds() == Seq(DemoContracts.lineitem.id))
    } finally server.stop()
  }

  test("bootstrap rejects typos and missing bindings loudly") {
    val ok = "[contract_store]\nroot = \"/tmp/x\"\n[governance_store]\nroot = \"/tmp/y\"\n"
    intercept[IllegalArgumentException] {
      ServiceBootstrap.fromToml(ok + "[contract_stoer]\nroot = \"/tmp/z\"\n")
    }
    intercept[IllegalArgumentException] { // missing required section
      ServiceBootstrap.fromToml("[contract_store]\nroot = \"/tmp/x\"\n")
    }
    intercept[IllegalArgumentException] { // jdbc without dsn
      ServiceBootstrap.fromToml(
        "[contract_store]\ntype = \"jdbc\"\n[governance_store]\nroot = \"/tmp/y\"\n")
    }
    intercept[IllegalArgumentException] { // spark-table types need code
      ServiceBootstrap.fromToml(
        "[contract_store]\ntype = \"delta\"\n[governance_store]\nroot = \"/tmp/y\"\n")
    }
    intercept[IllegalArgumentException] { // unsupported value syntax
      ServiceBootstrap.parseToml("[auth]\ntoken = [1, 2]\n")
    }
    intercept[IllegalArgumentException] { // digits-with-embedded-minus typo
      ServiceBootstrap.parseToml("[server]\nport = 8-0\n")
    }
    intercept[IllegalArgumentException] { // bare minus runs are not integers
      ServiceBootstrap.parseToml("[server]\nport = --\n")
    }
    // a leading minus IS a valid integer shape
    assert(ServiceBootstrap.parseToml("[x]\nn = -5\n")("x")("n") == "-5")
    intercept[IllegalArgumentException] { // typo'd KEY inside a known section
      ServiceBootstrap.fromToml(ok + "[server]\nprot = 8080\n")
    }
  }

  test("data-quality family: observation payloads evaluate over the wire") {
    withAuthServer(None) { (url, _) =>
      val contractJson = graft.contracts.ContractJson.toJson(DemoContracts.lineitem)
      def post(path: String, body: String): (Int, String) = {
        val r = HttpClient.newHttpClient().send(
          HttpRequest.newBuilder(URI.create(url + path))
            .header("Content-Type", "application/json")
            .POST(HttpRequest.BodyPublishers.ofString(body)).build(),
          HttpResponse.BodyHandlers.ofString())
        (r.statusCode(), r.body())
      }
      // expectations: every descriptor of the contract, with predicates
      val (ec, eb) = post("/data-quality/expectations",
        s"""{"contract":$contractJson}""")
      assert(ec == 200, eb)
      assert(eb.contains("\"not_null_l_orderkey\"") && eb.contains("predicate"))
      // evaluate: clean observations -> ok; a violation count -> block
      val schema = """{"l_orderkey":{"odcsType":"bigint","nullable":false}}"""
      val clean = post("/data-quality/evaluate",
        s"""{"contract":$contractJson,"schema":$schema,
           |"metrics":{"violations.not_null_l_orderkey":0}}""".stripMargin)
      assert(clean._1 == 200 && clean._2.contains("\"ok\":"), clean._2)
      val bad = post("/data-quality/evaluate",
        s"""{"contract":$contractJson,"schema":$schema,
           |"metrics":{"violations.not_null_l_orderkey":7}}""".stripMargin)
      assert(bad._1 == 200 && bad._2.contains("\"status\":\"block\""), bad._2)
      assert(bad._2.contains("l_orderkey contains 7 null value"),
        s"violation named in errors: ${bad._2}")
      // malformed body is a 400, not a 500
      assert(post("/data-quality/evaluate", "[]")._1 == 400)
      assert(post("/data-quality/expectations", "{}")._1 == 400)
      // r15: a contract naming an external engine has its verdict
      // INTERPRETED from the shipped run summary (manager.py engine
      // resolution + the GE adapter) instead of recomputed natively
      val geJson = graft.contracts.ContractJson.toJson(
        DemoContracts.lineitem.copy(customProperties =
          Map("quality_engine" -> "great_expectations")))
      val geBlock = post("/data-quality/evaluate",
        s"""{"contract":$geJson,"schema":$schema,
           |"metrics":{"great_expectations":{"success":false,
           |"exception_info":{"exception_message":"suite exploded"}}}}""".stripMargin)
      assert(geBlock._1 == 200 && geBlock._2.contains("\"status\":\"block\""),
        geBlock._2)
      assert(geBlock._2.contains("suite exploded"), geBlock._2)
      val geMissing = post("/data-quality/evaluate",
        s"""{"contract":$geJson,"schema":$schema,"metrics":{}}""")
      assert(geMissing._2.contains("\"status\":\"unknown\"") &&
        geMissing._2.contains("missing-great-expectations-summary"), geMissing._2)
      // an unknown engine name is a 400, never a silent native verdict
      val badEngine = graft.contracts.ContractJson.toJson(
        DemoContracts.lineitem.copy(customProperties =
          Map("quality_engine" -> "nonsuch")))
      assert(post("/data-quality/evaluate",
        s"""{"contract":$badEngine,"schema":$schema,"metrics":{}}""")._1 == 400)
      // r15 review fix: object values are accepted ONLY outside the
      // native metric namespace — a violations.* count wrapped in an
      // object is a malformed payload and must 400, not evaluate to a
      // soft warn verdict (the pre-r15 loud-reject contract)
      assert(post("/data-quality/evaluate",
        s"""{"contract":$contractJson,"schema":$schema,
           |"metrics":{"violations.not_null_l_orderkey":{"count":3}}}""".stripMargin)
        ._1 == 400)
    }
  }

  test("governance round trip over the wire: evaluate -> record -> draft -> review") {
    withAuthServer(None) { (url, _) =>
      val contractJson = graft.contracts.ContractJson.toJson(DemoContracts.lineitem)
      def post(path: String, body: String): (Int, String) = {
        val r = HttpClient.newHttpClient().send(
          HttpRequest.newBuilder(URI.create(url + path))
            .header("Content-Type", "application/json")
            .POST(HttpRequest.BodyPublishers.ofString(body)).build(),
          HttpResponse.BodyHandlers.ofString())
        (r.statusCode(), r.body())
      }
      val schema = """{"l_orderkey":{"odcsType":"bigint","nullable":false}}"""
      val (c, b) = post("/governance/evaluate?dataset=lake.lineitem&version=v7",
        s"""{"contract":$contractJson,"schema":$schema,
           |"metrics":{"violations.not_null_l_orderkey":3}}""".stripMargin)
      assert(c == 200, b)
      assert(b.contains("\"status\"") && b.contains("\"block\""), b)
      // the verdict was RECORDED: readable through the status route
      val st = req(s"$url/governance/status?dataset=lake.lineitem&version=v7", None)
      assert(st._1 == 200 && st._2.contains("\"block\""), st._2)
      // feedback proposed a draft; its version came back and lists
      assert(b.contains("draftVersions"), b)
      val drafts = req(s"$url/governance/drafts?contractId=${DemoContracts.lineitem.id}", None)
      assert(drafts._1 == 200 && drafts._2.contains("versions"), drafts._2)
      val version = {
        val vs = "\"versions\":\\[\"([^\"]+)\"".r
        vs.findFirstMatchIn(drafts._2).map(_.group(1))
          .getOrElse(fail(s"no draft version in ${drafts._2}"))
      }
      // review it over the wire -> active
      val rev = post(s"/governance/review-draft?contractId=${DemoContracts.lineitem.id}" +
        s"&version=$version&approve=true", "")
      assert(rev._1 == 200 && rev._2.contains("\"active\""), rev._2)
      // matrix / records / metric history all answer
      val mx = req(s"$url/governance/status-matrix", None)
      assert(mx._1 == 200 && mx._2.contains("lake.lineitem"))
      val dr = req(s"$url/governance/dataset-records?dataset=lake.lineitem", None)
      assert(dr._1 == 200 && dr._2.contains("\"contractVersion\""), dr._2)
      val mh = req(s"$url/governance/metrics?dataset=lake.lineitem", None)
      assert(mh._1 == 200 && mh._2.contains("not_null_l_orderkey"), mh._2)
    }
  }
}
