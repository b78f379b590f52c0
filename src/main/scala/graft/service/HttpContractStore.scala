package graft.service

import graft.contracts.{Contract, ContractJson, ContractStore}

import java.time.Duration

/** Remote [[ContractStore]] over HTTP — the twin of the reference's
  * remote service clients
  * (`dc43-service-clients/src/dc43_service_clients/governance/client/remote.py:1-653`,
  * `.../governance/transport.py:1-536`): a pipeline links the same store
  * interface, pointed at a [[GovernanceHttpServer]] (or any server
  * speaking its routes) instead of local storage. Transport plumbing
  * (bearer header, loud non-2xx, 404-as-absence on lookups) comes from
  * [[FacadeClient]], shared with the governance and data-product
  * clients; ids travel URL-encoded in query parameters, so raw ids
  * containing `/` or `:` round-trip unharmed. */
final class HttpContractStore(baseUrl: String,
                              timeout: Duration = Duration.ofSeconds(30),
                              bearerToken: Option[String] = None)
    extends FacadeClient(baseUrl, timeout, bearerToken) with ContractStore {

  override def put(contract: Contract): Unit = {
    post("/contracts/put", ContractJson.toJson(contract))
    ()
  }

  override def get(id: String, version: String): Option[Contract] =
    getOpt(s"/contracts/get?id=${enc(id)}&version=${enc(version)}")
      .map(ContractJson.fromJson)

  override def listVersions(id: String): Seq[String] =
    strings(get(s"/contracts/versions?id=${enc(id)}"), "versions")

  override def listContractIds(): Seq[String] =
    strings(get("/contracts"), "ids")

  /** The server resolves "latest" (released-over-prerelease ordering)
    * so every client agrees with the backend's serving gate. */
  override def latest(id: String): Option[Contract] =
    getOpt(s"/contracts/latest?id=${enc(id)}").map(ContractJson.fromJson)
}
