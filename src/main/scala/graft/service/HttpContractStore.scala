package graft.service

import graft.contracts.{Contract, ContractJson, ContractStore}
import org.json4s._
import org.json4s.jackson.JsonMethods

import java.net.URLEncoder
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets
import java.time.Duration

/** Remote [[ContractStore]] over HTTP — the twin of the reference's
  * remote service clients
  * (`dc43-service-clients/src/dc43_service_clients/governance/client/remote.py:1-653`,
  * `.../governance/transport.py:1-536`): a pipeline links the same store
  * interface, pointed at a [[GovernanceHttpServer]] (or any server
  * speaking its routes) instead of local storage. Built on the JDK's
  * `java.net.http.HttpClient`; ids travel URL-encoded in query
  * parameters, so raw ids containing `/` or `:` round-trip unharmed. */
final class HttpContractStore(baseUrl: String,
                              timeout: Duration = Duration.ofSeconds(30),
                              bearerToken: Option[String] = None)
    extends ContractStore {

  private val base = baseUrl.stripSuffix("/")
  private val client = HttpClient.newBuilder().connectTimeout(timeout).build()

  private def enc(s: String) = URLEncoder.encode(s, "UTF-8")

  /** Every request carries the configured bearer token (the server's
    * [[BearerAuth]] counterpart — reference `auth.py` wires the same
    * header through its remote clients). */
  private def withAuth(b: HttpRequest.Builder): HttpRequest.Builder =
    bearerToken.fold(b)(t => b.header("Authorization", s"Bearer $t"))

  private def send(req: HttpRequest): HttpResponse[String] =
    client.send(req, HttpResponse.BodyHandlers.ofString(StandardCharsets.UTF_8))

  private def get(pathAndQuery: String): HttpResponse[String] =
    send(withAuth(HttpRequest.newBuilder(java.net.URI.create(base + pathAndQuery))
      .timeout(timeout)).GET().build())

  private def expect(r: HttpResponse[String]): HttpResponse[String] = {
    // 404 is a domain answer (absent contract), anything else non-2xx is
    // a transport failure the caller must see, not an empty result
    if (r.statusCode() / 100 != 2 && r.statusCode() != 404)
      throw new java.io.IOException(
        s"contract service ${r.uri()} answered HTTP ${r.statusCode()}: ${r.body()}")
    r
  }

  private def strings(body: String, key: String): Seq[String] =
    JsonMethods.parse(body) match {
      case JObject(fs) => fs.toMap.get(key) match {
        case Some(JArray(vs)) => vs.collect { case JString(v) => v }
        case _ => Nil
      }
      case _ => Nil
    }

  override def put(contract: Contract): Unit = {
    val r = send(withAuth(HttpRequest.newBuilder(java.net.URI.create(s"$base/contracts/put"))
      .timeout(timeout)
      .header("Content-Type", "application/json; charset=utf-8"))
      .POST(HttpRequest.BodyPublishers.ofString(ContractJson.toJson(contract)))
      .build())
    expect(r)
    ()
  }

  override def get(id: String, version: String): Option[Contract] = {
    val r = expect(get(s"/contracts/get?id=${enc(id)}&version=${enc(version)}"))
    if (r.statusCode() == 404) None else Some(ContractJson.fromJson(r.body()))
  }

  override def listVersions(id: String): Seq[String] =
    strings(expect(get(s"/contracts/versions?id=${enc(id)}")).body(), "versions")

  override def listContractIds(): Seq[String] =
    strings(expect(get("/contracts")).body(), "ids")

  /** The server resolves "latest" (released-over-prerelease ordering)
    * so every client agrees with the backend's serving gate. */
  override def latest(id: String): Option[Contract] = {
    val r = expect(get(s"/contracts/latest?id=${enc(id)}"))
    if (r.statusCode() == 404) None else Some(ContractJson.fromJson(r.body()))
  }
}
