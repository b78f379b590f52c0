package graft.products

import graft.contracts.SemVer
import org.json4s._
import org.json4s.jackson.JsonMethods

/** Open Data Product Standard model — the full field surface the
  * reference's ODPS helper reads and round-trips (dc43
  * `dc43_core/odps.py:28-370`): input/output ports binding dataset roles
  * to contract versions, lifecycle status and versioning, plus the
  * descriptive payload (name, description, tags, SBOM, authoritative
  * definitions) and an `extra` passthrough that preserves unknown
  * attributes verbatim so documents written by newer ODPS revisions
  * survive a round-trip.
  *
  * DEVIATION (documented): the reference keeps `customProperties` as a
  * list of `{property, value}` dicts with arbitrary JSON values; graft's
  * whole governance surface is string-valued maps (last-wins on duplicate
  * keys), so ports and products share that convention. List-shaped
  * fields whose entries are opaque payloads (`sbom`, `inputContracts`,
  * `authoritativeDefinitions`) keep full JSON fidelity via `JValue`. */
final case class InputPort(
    name: String,
    version: String,
    contractId: String,
    customProperties: Map[String, String] = Map.empty,
    authoritativeDefinitions: Seq[JValue] = Nil,
    /** Unknown port attributes, preserved verbatim (reference
      * `_copy_unknown_fields`, `odps.py:120-130`). */
    extra: Map[String, JValue] = Map.empty)

final case class OutputPort(
    name: String,
    version: String,
    contractId: String,
    description: Option[String] = None,
    /** Port type label (e.g. "tables", "files") — reference
      * `DataProductOutputPort.type`. */
    portType: Option[String] = None,
    sbom: Seq[JValue] = Nil,
    inputContracts: Seq[JValue] = Nil,
    customProperties: Map[String, String] = Map.empty,
    authoritativeDefinitions: Seq[JValue] = Nil,
    extra: Map[String, JValue] = Map.empty)

final case class DataProduct(
    id: String,
    status: String = "draft",
    apiVersion: String = DataProduct.OdpsRequired,
    kind: String = "DataProduct",
    version: Option[String] = None,
    name: Option[String] = None,
    /** Arbitrary description mapping (the ODPS `description` object). */
    description: Option[JValue] = None,
    inputPorts: Seq[InputPort] = Nil,
    outputPorts: Seq[OutputPort] = Nil,
    customProperties: Map[String, String] = Map.empty,
    tags: Seq[String] = Nil,
    /** Unknown document attributes, preserved verbatim. */
    extra: Map[String, JValue] = Map.empty) {

  def findOutputPort(portName: String): Option[OutputPort] =
    outputPorts.find(_.name == portName)

  def findInputPort(portName: String): Option[InputPort] =
    inputPorts.find(_.name == portName)

  /** Add/replace an input port; false when a port with an IDENTICAL
    * payload exists (reference `ensure_input_port`, `odps.py:283-294`:
    * full `to_dict()` equality, not just the contract binding — a changed
    * description or property set re-enters review like a changed
    * binding). */
  def ensureInputPort(port: InputPort): (DataProduct, Boolean) =
    findInputPort(port.name) match {
      case Some(p) if p == port => (this, false)
      case Some(_) => (copy(inputPorts = inputPorts.map(c =>
        if (c.name == port.name) port else c)), true)
      case None    => (copy(inputPorts = inputPorts :+ port), true)
    }

  def ensureOutputPort(port: OutputPort): (DataProduct, Boolean) =
    findOutputPort(port.name) match {
      case Some(p) if p == port => (this, false)
      case Some(_) => (copy(outputPorts = outputPorts.map(c =>
        if (c.name == port.name) port else c)), true)
      case None    => (copy(outputPorts = outputPorts :+ port), true)
    }
}

object DataProduct {
  /** Required ODPS api version (reference `ODPS_REQUIRED`,
    * `odps.py:32`; env-overridable there, fixed here). */
  val OdpsRequired = "1.0.0"
}

object DataProductJson {

  private def props(m: Map[String, String]): List[(String, JValue)] =
    if (m.isEmpty) Nil
    else List("customProperties" -> JArray(m.toList.map { case (k, v) =>
      JObject("property" -> JString(k), "value" -> JString(v))
    }))

  private def readProps(fields: Map[String, JValue]): Map[String, String] =
    fields.get("customProperties") match {
      case Some(JArray(items)) => items.flatMap {
        case JObject(kv) =>
          val m = kv.toMap
          for (JString(k) <- m.get("property"); JString(v) <- m.get("value")) yield k -> v
        case _ => None
      }.toMap
      case _ => Map.empty
    }

  private def jarr(key: String, vs: Seq[JValue]): List[(String, JValue)] =
    if (vs.isEmpty) Nil else List(key -> JArray(vs.toList))

  /** Only mapping-shaped entries survive list normalisation (reference
    * `_normalise_custom_properties`, `odps.py:35-45`). */
  private def readObjList(fields: Map[String, JValue], key: String): Seq[JValue] =
    fields.get(key) match {
      case Some(JArray(items)) => items.collect { case o: JObject => o }
      case Some(o: JObject)    => Seq(o)
      case _                   => Nil
    }

  private def extras(fields: Map[String, JValue], known: Set[String]): Map[String, JValue] =
    fields.view.filterKeys(k => !known.contains(k)).toMap

  private val PortKnown = Set("name", "version", "contractId", "customProperties",
    "authoritativeDefinitions")
  private val OutPortKnown = PortKnown ++ Set("description", "type", "sbom", "inputContracts")
  private val ProductKnown = Set("apiVersion", "id", "kind", "name", "description", "status",
    "version", "inputPorts", "outputPorts", "customProperties", "tags")

  def toJson(p: DataProduct): String =
    JsonMethods.pretty(JsonMethods.render(toJValue(p)))

  /** Standalone port documents — the payloads of the HTTP register
    * routes (the reading twins are [[inputPortFromJValue]] /
    * [[outputPortFromJValue]]). */
  def inputPortToJValue(ip: InputPort): JValue = JObject(List[(String, JValue)](
    "name" -> JString(ip.name), "version" -> JString(ip.version),
    "contractId" -> JString(ip.contractId)) ++ props(ip.customProperties) ++
    jarr("authoritativeDefinitions", ip.authoritativeDefinitions) ++
    ip.extra.toList.sortBy(_._1): _*)

  def outputPortToJValue(op: OutputPort): JValue = JObject(List[(String, JValue)](
    "name" -> JString(op.name), "version" -> JString(op.version),
    "contractId" -> JString(op.contractId)) ++
    op.description.map(d => "description" -> (JString(d): JValue)).toList ++
    op.portType.map(t => "type" -> (JString(t): JValue)).toList ++
    jarr("sbom", op.sbom) ++ jarr("inputContracts", op.inputContracts) ++
    props(op.customProperties) ++
    jarr("authoritativeDefinitions", op.authoritativeDefinitions) ++
    op.extra.toList.sortBy(_._1): _*)

  def toJValue(p: DataProduct): JObject = {
    JObject(List[(String, JValue)](
      "apiVersion" -> JString(p.apiVersion),
      "id" -> JString(p.id),
      "kind" -> JString(p.kind),
      "status" -> JString(p.status)) ++
      p.version.map(v => "version" -> (JString(v): JValue)).toList ++
      p.name.map(n => "name" -> (JString(n): JValue)).toList ++
      p.description.map(d => "description" -> d).toList ++
      List("inputPorts" -> (JArray(p.inputPorts.toList.map(inputPortToJValue)): JValue),
           "outputPorts" -> (JArray(p.outputPorts.toList.map(outputPortToJValue)): JValue)) ++
      props(p.customProperties) ++
      (if (p.tags.isEmpty) Nil
       else List("tags" -> (JArray(p.tags.toList.map(JString(_))): JValue))) ++
      p.extra.toList.sortBy(_._1): _*)
  }

  def fromJson(s: String): DataProduct = fromJValue(JsonMethods.parse(s))

  private def strField(k: String, m: Map[String, JValue]): Option[String] =
    m.get(k).collect { case JString(v) => v }

  private def portFields(j: JValue): Map[String, JValue] =
    j match { case JObject(fs) => fs.toMap; case _ => Map.empty }

  /** Parse a standalone input-port document (the payload of the HTTP
    * register-input route) — the same reading [[fromJValue]] applies to
    * each `inputPorts` entry. */
  def inputPortFromJValue(j: JValue): InputPort = {
    val m = portFields(j)
    InputPort(strField("name", m).getOrElse(""), strField("version", m).getOrElse(""),
      strField("contractId", m).getOrElse(""), readProps(m),
      readObjList(m, "authoritativeDefinitions"), extras(m, PortKnown))
  }

  def inputPortFromJson(s: String): InputPort =
    inputPortFromJValue(JsonMethods.parse(s))

  def outputPortFromJValue(j: JValue): OutputPort = {
    val m = portFields(j)
    OutputPort(strField("name", m).getOrElse(""), strField("version", m).getOrElse(""),
      strField("contractId", m).getOrElse(""), strField("description", m), strField("type", m),
      readObjList(m, "sbom"), readObjList(m, "inputContracts"), readProps(m),
      readObjList(m, "authoritativeDefinitions"), extras(m, OutPortKnown))
  }

  def outputPortFromJson(s: String): OutputPort =
    outputPortFromJValue(JsonMethods.parse(s))

  /** Parse an ODPS document. An `apiVersion` other than
    * [[DataProduct.OdpsRequired]] is rejected exactly as the reference
    * does (`odps.py:196-200`); a missing/blank one takes the default. A
    * legacy `v` prefix (graft's own pre-1.0 files wrote `v1.0.0`) is
    * normalised before the check. */
  def fromJValue(parsed: JValue): DataProduct = {
    val fields = parsed match {
      case JObject(fs) => fs.toMap
      case _ => Map.empty[String, JValue]
    }
    def str(k: String, m: Map[String, JValue]): Option[String] =
      m.get(k).collect { case JString(v) => v }
    val apiVersion = str("apiVersion", fields).map(_.trim).filter(_.nonEmpty)
      .map(_.stripPrefix("v")).getOrElse(DataProduct.OdpsRequired)
    if (apiVersion != DataProduct.OdpsRequired)
      throw new IllegalArgumentException(
        s"ODPS apiVersion mismatch. Required ${DataProduct.OdpsRequired}, got $apiVersion")
    val ins = fields.get("inputPorts") match {
      case Some(JArray(ps)) => ps.collect { case j: JObject => inputPortFromJValue(j) }
      case _ => Nil
    }
    val outs = fields.get("outputPorts") match {
      case Some(JArray(ps)) => ps.collect { case j: JObject => outputPortFromJValue(j) }
      case _ => Nil
    }
    val tags = fields.get("tags") match {
      case Some(JArray(ts)) => ts.collect { case JString(t) if t.trim.nonEmpty => t.trim }
      case _ => Nil
    }
    DataProduct(
      id = str("id", fields).getOrElse(""),
      status = str("status", fields).map(_.trim).filter(_.nonEmpty).getOrElse("draft"),
      apiVersion = apiVersion,
      kind = str("kind", fields).getOrElse("DataProduct"),
      version = str("version", fields),
      name = str("name", fields),
      description = fields.get("description").collect { case o: JObject => o: JValue },
      inputPorts = ins, outputPorts = outs,
      customProperties = readProps(fields),
      tags = tags,
      extra = extras(fields, ProductKnown))
  }
}

/** Versioned data-product persistence + port-registration semantics of the
  * reference backend (`data_products/backend/_shared.py:44-155`). */
final case class RegistrationResult(product: DataProduct, changed: Boolean)

/** One page of data-product ids plus the paging echo — the reference's
  * `DataProductListing` (`data_products/backend/interface.py`). */
final case class ProductListing(
    items: Seq[String], total: Int, limit: Option[Int], offset: Int)

/** The full data-product service surface — the reference's
  * `DataProductServiceBackend` protocol
  * (`data_products/backend/interface.py`): persistence primitives plus
  * the registration/review lifecycle. Implemented locally by
  * [[DataProductBackend]] (filesystem) and [[CatalogDataProductBackend]]
  * (external catalog), and remotely by
  * `graft.service.HttpDataProductClient` (the facade's `/products`
  * routes) — pipeline code ([[graft.io.GovernedIO]], [[ProductPolicy]])
  * binds to this trait, so switching a pipeline to service mode is a
  * constructor swap, never a code change (the reference's local/remote
  * client symmetry). */
trait DataProductService {
  def put(p: DataProduct): Unit
  def get(id: String, version: String): Option[DataProduct]
  def latest(id: String): Option[DataProduct]
  def listVersions(id: String): Seq[String]
  def listDataProducts(limit: Option[Int] = None, offset: Int = 0): ProductListing
  def registerInputPort(id: String, port: InputPort, bump: String = "minor",
                        customProperties: Map[String, String] = Map.empty,
                        sourceDataProduct: Option[String] = None,
                        sourceOutputPort: Option[String] = None): RegistrationResult
  def registerOutputPort(id: String, port: OutputPort, bump: String = "minor",
                         customProperties: Map[String, String] = Map.empty): RegistrationResult
  def reviewDraft(id: String, version: String, approve: Boolean): DataProduct
  def resolveOutputContract(id: String, portName: String): Option[(String, String)]
}

/** Port-registration + draft-lifecycle semantics shared by every
  * data-product persistence flavour — the reference's
  * `MutableDataProductBackendMixin`
  * (`data_products/backend/_shared.py:44-155`), which both the local
  * filesystem backend and the external-catalog backend
  * (`data_products/backend/collibra.py:40`) mix in over the same four
  * persistence primitives. (The remote client does NOT mix this in:
  * the SERVER owns the lifecycle; the client calls its routes.) */
trait MutableDataProductOps extends DataProductService {

  /** Status a freshly-minted product starts in (reference
    * `_ensure_product`, `collibra.py:86-91`: the configured default,
    * lowercased). */
  protected def defaultStatus: String = "draft"

  /** The reference's `next_draft_version` (`dc43_core/odps.py:324-350`):
    * bump the CURRENT revision's release core (pre-release tag stripped)
    * — or the bump-level seed (0.1.0 / 1.0.0 / 0.0.1) when the product
    * has no version yet — then tag `-draft`, de-duplicating against
    * existing versions with a `.N` counter (`0.2.0-draft`,
    * `0.2.0-draft.2`, …). Registration on an unchanged base therefore
    * always yields a FRESH draft revision, never an overwrite of one
    * still under review. */
  private[products] def nextDraftVersion(current: Option[String], existing: Seq[String],
                                         bump: String): String = {
    val candidate = current.flatMap(SemVer.tryParse) match {
      case Some(v) => SemVer(v.major, v.minor, v.patch).bump(bump)
      case None => bump match {
        case "major" => SemVer(1, 0, 0)
        case "patch" => SemVer(0, 0, 1)
        case _       => SemVer(0, 1, 0)
      }
    }
    val base = s"$candidate-draft"
    val taken = existing.toSet
    Iterator.from(1).map(i => if (i == 1) base else s"$base.$i").find(!taken(_)).get
  }

  /** Evolve to a fresh draft revision and persist (reference
    * `evolve_to_draft` + `_store_updated`): new `-draft` version from the
    * current one, status forced to `draft` even when the base revision
    * was active — a changed port binding always re-enters review. */
  private def storeUpdated(p: DataProduct, bump: String): DataProduct = {
    val updated = p.copy(
      version = Some(nextDraftVersion(p.version, listVersions(p.id), bump)),
      status = "draft")
    put(updated)
    updated
  }

  private def ensureProduct(id: String): DataProduct =
    latest(id).getOrElse(DataProduct(id = id,
      status = Option(defaultStatus).filter(_.nonEmpty).fold("draft")(_.toLowerCase)))

  /** Register (upsert) an input port — the reference's
    * `register_input_port` (`_shared.py:73-110`): the BARE incoming port
    * is compared against the stored one on its FULL payload; only a
    * payload-identical port is a no-op (no new revision, passed
    * properties untouched). On any difference the port is replaced,
    * `customProperties` plus the `dc43.input.source_data_product` /
    * `dc43.input.source_output_port` provenance pair are merged into it
    * (map semantics: a re-registered property key takes the new value;
    * the reference's list model would keep both entries), and a fresh
    * draft revision is stored. Reference quirk preserved: because the
    * comparison uses the bare port, re-registering an identical binding
    * WITH extra properties re-drafts every time — the stored port
    * carries properties the bare one lacks. */
  def registerInputPort(id: String, port: InputPort, bump: String = "minor",
                        customProperties: Map[String, String] = Map.empty,
                        sourceDataProduct: Option[String] = None,
                        sourceOutputPort: Option[String] = None): RegistrationResult = {
    val (p, changed) = ensureProduct(id).ensureInputPort(port)
    if (!changed) return RegistrationResult(p, changed = false)
    val props = customProperties ++
      sourceDataProduct.map("dc43.input.source_data_product" -> _) ++
      sourceOutputPort.map("dc43.input.source_output_port" -> _)
    val enriched = port.copy(customProperties = port.customProperties ++ props)
    val merged = p.copy(inputPorts = p.inputPorts.map(c =>
      if (c.name == port.name) enriched else c))
    RegistrationResult(storeUpdated(merged, bump), changed = true)
  }

  def registerOutputPort(id: String, port: OutputPort, bump: String = "minor",
                         customProperties: Map[String, String] = Map.empty): RegistrationResult = {
    val (p, changed) = ensureProduct(id).ensureOutputPort(port)
    if (!changed) return RegistrationResult(p, changed = false)
    val enriched = port.copy(customProperties = port.customProperties ++ customProperties)
    val merged = p.copy(outputPorts = p.outputPorts.map(c =>
      if (c.name == port.name) enriched else c))
    RegistrationResult(storeUpdated(merged, bump), changed = true)
  }

  /** Review a draft revision: approve → `active`, reject → `rejected`,
    * version unchanged (the `graft.governance.GovernanceBackend
    * .reviewDraft` twin for products — the status transition the
    * registration lifecycle feeds). Only drafts are reviewable. */
  def reviewDraft(id: String, version: String, approve: Boolean): DataProduct = {
    val draft = get(id, version).getOrElse(
      throw new IllegalArgumentException(s"data product $id:$version not found"))
    if (draft.status.toLowerCase != "draft")
      throw new IllegalArgumentException(
        s"$id:$version has status ${draft.status}, not draft")
    val reviewed = draft.copy(status = if (approve) "active" else "rejected")
    put(reviewed)
    reviewed
  }

  /** (contractId, contractVersion) an output port serves, if bound. */
  def resolveOutputContract(id: String, portName: String): Option[(String, String)] =
    latest(id).flatMap(_.findOutputPort(portName))
      .filter(_.contractId.nonEmpty).map(p => (p.contractId, p.version))
}

class DataProductBackend(rootDir: String) extends MutableDataProductOps {
  import java.nio.file.{Files, Paths}

  private val root = Paths.get(rootDir)
  Files.createDirectories(root)
  private def safe(s: String) = s.replaceAll("[^A-Za-z0-9._-]", "_")
  private def dir(id: String) = root.resolve(safe(id))

  def put(p: DataProduct): Unit = {
    val d = dir(p.id)
    Files.createDirectories(d)
    Files.writeString(d.resolve(safe(p.version.getOrElse("0.0.0")) + ".json"),
      DataProductJson.toJson(p))
  }

  def listVersions(id: String): Seq[String] = {
    val d = dir(id)
    if (!Files.isDirectory(d)) Nil
    else scala.util.Using.resource(Files.list(d)) { s =>
      import scala.jdk.CollectionConverters._
      s.iterator().asScala.map(_.getFileName.toString)
        .filter(_.endsWith(".json")).map(_.stripSuffix(".json")).toSeq.sorted
    }
  }

  def get(id: String, version: String): Option[DataProduct] = {
    val f = dir(id).resolve(safe(version) + ".json")
    if (Files.exists(f)) Some(DataProductJson.fromJson(Files.readString(f))) else None
  }

  def latest(id: String): Option[DataProduct] =
    listVersions(id).flatMap(v => SemVer.tryParse(v).map(_ -> v))
      .sortBy(_._1).lastOption.flatMap { case (_, v) => get(id, v) }

  /** Every known product id, sorted — authoritative ids from the stored
    * payloads (directory names are sanitised). */
  def listDataProductIds(): Seq[String] = {
    if (!Files.isDirectory(root)) return Nil
    val dirs = scala.util.Using.resource(Files.list(root)) { s =>
      import scala.jdk.CollectionConverters._
      s.iterator().asScala.filter(Files.isDirectory(_)).map(_.getFileName.toString).toSeq
    }
    dirs.flatMap { d =>
      listVersions(d).headOption.flatMap(v => get(d, v)).map(_.id)
    }.distinct.sorted
  }

  /** Paged id listing — the reference's `list_data_products`
    * (`data_products/backend/local.py:31-46`): negative offsets clamp to
    * 0, negative limits to an empty page, `total` always the full count. */
  def listDataProducts(limit: Option[Int] = None, offset: Int = 0): ProductListing = {
    val ids = listDataProductIds()
    val start = math.max(offset, 0)
    val end = limit.fold(ids.size)(l => math.min(start + math.max(l, 0), ids.size))
    ProductListing(ids.slice(start, end), ids.size, limit, start)
  }

}
