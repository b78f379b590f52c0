package graft.service

import graft.contracts.{Contract, ContractStore, FieldDef, QualityRule}
import graft.governance.{DatasetStatus, GovernanceBackend}
import graft.products.DataProductService

/** Read-only server-rendered browse pages for the governance facade —
  * the browse slice of the reference's contracts web app
  * (`dc43-contracts-app/src/dc43_contracts_app/server.py:8071-10252`:
  * `/`, `/contracts`, `/contracts/{cid}`, `/contracts/{cid}/{ver}`,
  * `/datasets`, `/datasets/{name}`, `/data-products`,
  * `/data-products/{id}`, rendered from the `templates` directory). The
  * reference app is a full editing UI (~12k LoC of FastAPI + Jinja +
  * setup wizard); this module deliberately covers only the READ side —
  * every list/detail view a reviewer opens — while mutations stay on the
  * JSON API where pipelines already do them. No template engine: each
  * page is a pure `String` function of the backing stores, so the pages
  * are unit-testable without a socket and add zero dependencies.
  *
  * Ids travel as QUERY PARAMETERS (`/ui/contract?id=...`), the facade's
  * wire convention, so ids containing `/` or `:` need no path games. All
  * interpolated data is HTML-escaped — contract descriptions and error
  * strings are arbitrary user text. */
final class WebUi(contracts: ContractStore, gov: GovernanceBackend,
                  products: Option[DataProductService] = None) {

  /** The product backend, kept only when it supports LISTING: a
    * catalog-backed facade ([[graft.products.CatalogAdapter]]'s
    * backend) throws `UnsupportedOperationException` from
    * `listDataProducts`, and the UI must degrade (no counter, no nav
    * link, 404 on `/ui/products`) rather than answer 500 on the
    * landing page. Probed once — backends don't grow listing support
    * at runtime. Per-id pages (`/ui/product?id=`) still work either
    * way. */
  private lazy val listingProducts: Option[DataProductService] =
    products.filter { pb =>
      // one-item page: the probe only asks IF listing works, so it must
      // not pay for a full listing on a backend where listing is slow.
      // NonFatal, not just UnsupportedOperationException: a transient
      // backend fault during the probe must degrade the nav (this lazy
      // val memoizes whatever the probe concludes), never 500 the
      // landing page — and a FAILED lazy val re-evaluates, so letting
      // the exception out would re-run the probe on every render.
      try { pb.listDataProducts(limit = Some(1)); true }
      catch { case scala.util.control.NonFatal(_) => false }
    }

  // ------------------------------------------------------------------
  // rendering primitives
  // ------------------------------------------------------------------

  private def esc(s: String): String = {
    val sb = new StringBuilder(s.length)
    s.foreach {
      case '&' => sb.append("&amp;")
      case '<' => sb.append("&lt;")
      case '>' => sb.append("&gt;")
      case '"' => sb.append("&quot;")
      case '\'' => sb.append("&#39;")
      case c => sb.append(c)
    }
    sb.toString
  }

  private def enc(s: String) =
    java.net.URLEncoder.encode(s, "UTF-8")

  private val style = """
    body{font-family:system-ui,sans-serif;margin:2rem;max-width:70rem;color:#1a1a1a}
    nav a{margin-right:1rem} h1,h2{font-weight:600}
    table{border-collapse:collapse;width:100%;margin:1rem 0}
    th,td{border:1px solid #ccc;padding:.4rem .6rem;text-align:left;vertical-align:top}
    th{background:#f2f2f2} code{background:#f6f6f6;padding:0 .2rem}
    .ok{color:#0a7d33}.warn{color:#a86a00}.block{color:#b00020}
    .muted{color:#777}
  """.stripMargin

  /** Shared chrome — the reference's `base.html` navigation. Built by
    * CONCATENATION, never `stripMargin` over interpolated values: user
    * text (titles, descriptions, error strings) may contain
    * newline-then-`|` sequences that stripMargin would eat. */
  private def page(title: String, body: String): String =
    "<!doctype html><html><head><meta charset=\"utf-8\">\n" +
      s"<title>${esc(title)} — graft governance</title>\n" +
      s"<style>$style</style></head><body>\n" +
      "<nav><a href=\"/ui\">Home</a><a href=\"/ui/contracts\">Contracts</a>\n" +
      "<a href=\"/ui/drafts\">Drafts</a><a href=\"/ui/datasets\">Datasets</a>" +
      (if (listingProducts.isDefined) "<a href=\"/ui/products\">Data products</a>" else "") +
      "<a href=\"/ui/setup\">Setup</a>" +
      "<a href=\"/ui/integration-helper\">Integration helper</a>" +
      "</nav>\n" +
      s"<h1>${esc(title)}</h1>\n" +
      body +
      "\n</body></html>"

  private def table(headers: Seq[String], rows: Seq[Seq[String]]): String =
    if (rows.isEmpty) """<p class="muted">none</p>"""
    else
      s"""<table><tr>${headers.map(h => s"<th>${esc(h)}</th>").mkString}</tr>${
        rows.map(r => s"<tr>${r.map(c => s"<td>$c</td>").mkString}</tr>").mkString
      }</table>"""

  private def statusCell(status: String): String = {
    val cls = status.toLowerCase match {
      case "ok" | "active" => "ok"
      case "warn" | "draft" => "warn"
      case "block" | "rejected" => "block"
      case _ => "muted"
    }
    s"""<span class="$cls">${esc(status)}</span>"""
  }

  private def contractLink(id: String, version: String): String =
    s"""<a href="/ui/contract?id=${enc(id)}&version=${enc(version)}">${esc(id)}:${esc(version)}</a>"""

  // ------------------------------------------------------------------
  // pages
  // ------------------------------------------------------------------

  /** Landing page — the reference's `index.html` dashboard counters. */
  def index(): String = {
    val cids = contracts.listContractIds()
    val datasets = gov.listDatasets()
    val matrix = gov.statusMatrix()
    val blocked = matrix.count(_.status == "block")
    // the probe passed once, but a flaky remote backend can still fail
    // THIS listing — drop the counter row for the render, don't 500
    val productCount = listingProducts.flatMap(pb =>
      scala.util.Try(pb.listDataProducts().total).toOption)
    page("Governance", s"""
      |<table>
      |<tr><th>Contracts</th><td>${cids.size}</td></tr>
      |<tr><th>Datasets under governance</th><td>${datasets.size}</td></tr>
      |<tr><th>Recorded verdicts</th><td>${matrix.size}
      |  (${matrix.count(_.status == "ok")} ok, ${matrix.count(_.status == "warn")} warn,
      |  $blocked blocked)</td></tr>
      |${productCount.fold("")(n => s"<tr><th>Data products</th><td>$n</td></tr>")}
      |</table>""".stripMargin)
  }

  /** Contract listing — reference `contracts.html`: id, latest version,
    * its status, and the version count. */
  def contractsPage(): String = {
    val rows = contracts.listContractIds().map { id =>
      val versions = contracts.listVersions(id)
      val latest = contracts.latest(id)
      Seq(
        s"""<a href="/ui/contract?id=${enc(id)}">${esc(id)}</a>""",
        latest.map(c => esc(c.version)).getOrElse("""<span class="muted">—</span>"""),
        latest.flatMap(_.status).map(statusCell).getOrElse("""<span class="muted">—</span>"""),
        versions.size.toString)
    }
    page("Contracts",
      table(Seq("id", "latest", "status", "versions"), rows) +
        """<p><a href="/ui/new-contract">+ new contract</a></p>""")
  }

  /** One contract's version chain — reference `contract_versions.html` —
    * or, with a version, the full detail (`contract_detail.html`):
    * schema fields with types/flags/rules, servers, linked datasets. */
  def contractPage(id: String, version: Option[String]): Option[String] =
    version match {
      case None =>
        val versions = contracts.listVersions(id)
        if (versions.isEmpty) None
        else Some(page(s"Contract $id", table(
          Seq("version", "status", "name"),
          versions.map { v =>
            val c = contracts.get(id, v)
            Seq(contractLink(id, v),
              c.flatMap(_.status).map(statusCell).getOrElse("""<span class="muted">—</span>"""),
              c.flatMap(_.name).map(esc).getOrElse("""<span class="muted">—</span>"""))
          })))
      case Some(v) => contracts.get(id, v).map(c => contractDetail(c))
    }

  private def ruleText(r: QualityRule): String = {
    val parts = Seq(
      r.rule.filter(_.nonEmpty).map(n => s"rule=$n"),
      r.mustBeGreaterThan.map(x => s"> $x"),
      r.mustBeGreaterOrEqualTo.map(x => s">= $x"),
      r.mustBeLessThan.map(x => s"< $x"),
      r.mustBeLessOrEqualTo.map(x => s"<= $x"),
      if (r.values.nonEmpty) Some(r.values.mkString("in {", ", ", "}")) else None,
      r.pattern.map(p => s"~ /$p/"),
      r.query.map(q => s"query: $q")).flatten
    esc(parts.mkString("; "))
  }

  private def fieldRows(fs: Seq[FieldDef], prefix: String = ""): Seq[Seq[String]] =
    fs.flatMap { f =>
      val row = Seq(
        s"<code>${esc(prefix + f.name)}</code>",
        esc(f.odcsType),
        if (f.required) "yes" else """<span class="muted">no</span>""",
        if (f.unique) "yes" else """<span class="muted">no</span>""",
        f.quality.map(r => ruleText(r)).mkString("<br>"))
      row +: (fieldRows(f.fields, prefix + f.name + ".") ++
        f.items.toSeq.flatMap(i => fieldRows(Seq(i), prefix + f.name + "[].")))
    }

  private def contractDetail(c: Contract): String = {
    val meta = "<table>\n" +
      s"<tr><th>version</th><td>${esc(c.version)}</td></tr>\n" +
      s"<tr><th>status</th><td>${c.status.map(statusCell).getOrElse("—")}</td></tr>\n" +
      c.name.fold("")(n => s"<tr><th>name</th><td>${esc(n)}</td></tr>\n") +
      c.description.fold("")(d => s"<tr><th>description</th><td>${esc(d)}</td></tr>\n") +
      "</table>"
    val schema = c.schema.map { obj =>
      s"<h2>schema: ${esc(obj.name)}</h2>" +
        table(Seq("property", "type", "required", "unique", "quality"),
          fieldRows(obj.properties)) +
        (if (obj.quality.isEmpty) ""
         else s"<p>object rules: ${obj.quality.map(ruleText).mkString("; ")}</p>")
    }.mkString
    val servers =
      if (c.servers.isEmpty) ""
      else "<h2>servers</h2>" + table(Seq("server", "type", "path", "format"),
        c.servers.map(sv => Seq(
          sv.server.map(esc).getOrElse("—"), sv.serverType.map(esc).getOrElse("—"),
          sv.path.map(esc).getOrElse("—"), sv.format.map(esc).getOrElse("—"))))
    // ONE matrix read serves both the verdict table and the validate
    // quick links: statusMatrix parses every recorded status document,
    // so a second call would double the detail page's I/O
    val matrix = gov.statusMatrix()
    val linked = matrix
      .filter(st => st.contractId == c.id && st.contractVersion == c.version)
    val verdicts =
      if (linked.isEmpty) ""
      else "<h2>recorded verdicts</h2>" + statusTable(linked)
    // released revisions edit into a NEW version; drafts edit in place
    // through the review workspace
    val editLink =
      if (c.status.map(_.toLowerCase).contains("draft"))
        s"""<p><a href="/ui/draft-edit?id=${enc(c.id)}&version=${enc(c.version)}">edit / review draft</a></p>"""
      else
        s"""<p><a href="/ui/edit-contract?id=${enc(c.id)}&version=${enc(c.version)}">edit as new version</a></p>"""
    // validate/preview action (reference /contracts/{cid}/{ver}/validate):
    // re-evaluate a dataset's recorded observations against THIS revision
    // — GET, read-only, nothing recorded. Datasets with any recorded
    // observation get one-click links; the form takes arbitrary ids.
    val knownDatasets = matrix
      .map(st => (st.datasetId, st.datasetVersion)).distinct.take(12)
    val quickLinks =
      if (knownDatasets.isEmpty) ""
      else "<p>" + knownDatasets.map { case (ds, dv) =>
        s"""<a href="/ui/validate-contract?id=${enc(c.id)}&version=${enc(c.version)}""" +
          s"""&dataset=${enc(ds)}&datasetVersion=${enc(dv)}">${esc(ds)}:${esc(dv)}</a>"""
      }.mkString(" ") + "</p>"
    val validateForm =
      "<h2>validate a dataset against this revision</h2>" +
        s"""<form method="get" action="/ui/validate-contract">""" +
        s"""<input type="hidden" name="id" value="${esc(c.id)}">""" +
        s"""<input type="hidden" name="version" value="${esc(c.version)}">""" +
        """<label>dataset <input name="dataset"></label> """ +
        """<label>dataset version <input name="datasetVersion"></label> """ +
        """<button type="submit">validate</button></form>""" + quickLinks
    page(s"Contract ${c.id}:${c.version}",
      meta + schema + servers + verdicts + validateForm + editLink)
  }

  /** Validate/preview (reference `/contracts/{cid}/{ver}/validate` +
    * `/api/contracts/{cid}/{ver}/preview`): re-run the SAME evaluation
    * the governance backend runs ([[graft.quality.Evaluator.evaluate]] —
    * transports must not drift) over the dataset version's last recorded
    * observations, against this contract revision — answering "would
    * this dataset, as last observed, pass?" BEFORE an operator approves
    * a draft or moves a link. Renders the verdict, every error/warning
    * row, and the expected-vs-observed schema diff. Read-only: nothing
    * is recorded, no draft is proposed (the governed pipeline owns
    * that); `None` when the contract revision does not exist. */
  def validatePage(id: String, version: String, dataset: String,
                   datasetVersion: String): Option[String] =
    contracts.get(id, version).map { c =>
      val title = s"Validate ${c.id}:${c.version}"
      val subject = s"<p>dataset <code>${esc(dataset)}</code> version " +
        s"<code>${esc(datasetVersion)}</code> vs " +
        contractLink(c.id, c.version) + "</p>"
      gov.observedSnapshot(dataset, datasetVersion) match {
        case None =>
          page(title, subject + "<p>No recorded observations for this " +
            "dataset version — run a governed pipeline against it first.</p>")
        case Some((schema, metrics)) =>
          // records predating schema persistence carry NO snapshot: the
          // schema half must go vacuous (evaluate against the contract's
          // own shape), NOT read as every-column-missing — a false
          // "block" verdict naming phantom missing columns would send an
          // operator chasing a failure that never happened
          val contractProps = c.schema.flatMap(_.properties)
          val effSchema =
            if (schema.nonEmpty) schema
            else contractProps.map(f => f.name ->
              graft.quality.FieldSnapshot(f.odcsType, f.odcsType,
                nullable = !f.required)).toMap
          val res = graft.quality.Evaluator.evaluate(c, effSchema, metrics)
          val verdict = s"<h2>verdict</h2><p>${statusCell(res.recordStatus)}</p>" +
            (if (res.errors.isEmpty) ""
             else "<h3>errors</h3><ul>" +
               res.errors.map(e => s"<li>${esc(e)}</li>").mkString + "</ul>") +
            (if (res.warnings.isEmpty) ""
             else "<h3>warnings</h3><ul>" +
               res.warnings.map(w => s"<li>${esc(w)}</li>").mkString + "</ul>")
          // expected-vs-observed schema diff (the preview half): contract
          // columns joined to the snapshot, plus observed-only extras
          val diffRows = contractProps.map { f =>
            val obs = schema.get(f.name)
            val state = obs match {
              case None => """<span class="block">missing</span>"""
              case Some(s) if s.odcsType != f.odcsType =>
                s"""<span class="warn">type ${esc(s.odcsType)} ≠ ${esc(f.odcsType)}</span>"""
              case Some(s) if f.required && s.nullable =>
                """<span class="warn">nullable but required</span>"""
              case Some(_) => """<span class="ok">ok</span>"""
            }
            Seq(s"<code>${esc(f.name)}</code>", esc(f.odcsType),
              obs.map(s => esc(s.odcsType)).getOrElse("""<span class="muted">—</span>"""),
              state)
          }
          val extras = schema.keys.toSeq.sorted
            .filterNot(contractProps.map(_.name).toSet)
            .map(n => Seq(s"<code>${esc(n)}</code>",
              """<span class="muted">—</span>""",
              esc(schema(n).odcsType),
              """<span class="muted">extra</span>"""))
          val diff =
            if (schema.isEmpty)
              "<h2>schema diff</h2><p>This observation predates schema " +
                "snapshots — only metric expectations were evaluated.</p>"
            else "<h2>schema diff</h2>" + table(
              Seq("column", "expected", "observed", "state"), diffRows ++ extras)
          val obsMetrics =
            if (metrics.isEmpty) ""
            else "<h2>observed metrics</h2>" + table(Seq("metric", "value"),
              metrics.toSeq.sortBy(_._1).map { case (k, v) =>
                Seq(s"<code>${esc(k)}</code>", esc(String.valueOf(v))) })
          page(title, subject + verdict + diff + obsMetrics)
      }
    }

  private def statusTable(sts: Seq[DatasetStatus]): String =
    table(Seq("dataset", "version", "contract", "status", "errors", "warnings"),
      sts.sortBy(-_.recordedAt).map { st =>
        Seq(
          s"""<a href="/ui/dataset?dataset=${enc(st.datasetId)}">${esc(st.datasetId)}</a>""",
          esc(st.datasetVersion),
          contractLink(st.contractId, st.contractVersion),
          statusCell(st.status),
          st.errors.map(esc).mkString("<br>"),
          st.warnings.map(esc).mkString("<br>"))
      })

  /** The review queue — every outstanding draft revision across all
    * contracts (the reference's contract review workflow surfaces these
    * on the contract pages; one aggregated queue is what a reviewer
    * actually works). Read-only: approval stays on the JSON API
    * (`/governance/review-draft`).
    *
    * Reads WebUi's OWN contract store (not the governance backend's
    * optionally-attached one — the constructors permit them to differ,
    * and a silently empty queue would hide pending reviews). Fetch is
    * bounded to `-draft`-suffixed versions: every graft-minted draft
    * carries the suffix (`Drafter.draftVersion`, the products
    * `nextDraftVersion`), so a full-store document scan per page view
    * is avoided; the status check still gates what renders. The change
    * summary is the draft's recorded `draft_change_log`, falling back
    * to its description. */
  def draftsPage(): String = {
    val rows = for {
      id <- contracts.listContractIds()
      v <- contracts.listVersions(id) if v.contains("-draft")
      draft <- contracts.get(id, v).toSeq
      if draft.status.map(_.toLowerCase).contains("draft")
    } yield Seq(
      contractLink(draft.id, draft.version),
      draft.customProperties.get("dataset_id").map(esc)
        .getOrElse("""<span class="muted">—</span>"""),
      draft.customProperties.get("draft_change_log").map(esc)
        .orElse(draft.description.map(esc))
        .getOrElse("""<span class="muted">—</span>"""),
      s"""<a href="/ui/draft-edit?id=${enc(draft.id)}&version=${enc(draft.version)}">edit / review</a>""")
    page("Draft review queue",
      table(Seq("draft", "proposed from dataset", "change summary", ""), rows))
  }

  /** Draft EDIT workspace — the reference contracts-app's draft editing
    * flow (`server.py` draft workspace), reduced to the semantics the
    * facade supports: the draft's full ODCS JSON in a textarea posting
    * to the facade's `/ui/draft-edit` form route (which delegates to
    * `GovernanceService.updateDraft` — id/version/status pinned
    * server-side, so a hand-edited status cannot self-approve), plus
    * approve/reject actions posting to `/ui/draft-review`. `None`
    * (→ 404) for unknown or already-reviewed revisions. */
  def draftEditPage(id: String, version: String): Option[String] =
    contracts.get(id, version)
      .filter(_.status.map(_.toLowerCase).contains("draft"))
      .map { draft =>
        val action = s"/ui/draft-edit?id=${enc(id)}&version=${enc(version)}"
        val review = s"/ui/draft-review?id=${enc(id)}&version=${enc(version)}"
        page(s"Edit draft $id:$version",
          "<form method=\"post\" action=\"" + action + "\">\n" +
            "<textarea name=\"json\" rows=\"28\" cols=\"100\">" +
            esc(graft.contracts.ContractJson.toJson(draft)) +
            "</textarea><br>\n" +
            "<button type=\"submit\">Save draft</button>\n</form>\n" +
            "<form method=\"post\" action=\"" + review + "&approve=true\">" +
            "<button type=\"submit\">Approve</button></form>\n" +
            "<form method=\"post\" action=\"" + review + "&approve=false\">" +
            "<button type=\"submit\">Reject</button></form>")
      }

  // ------------------------------------------------------------------
  // authoring (reference `new_contract.html` / `new_data_product.html` +
  // the create flows in `dc43_contracts_app/server.py:8099-8133` and
  // `:9582-9623`): a form pre-filled with a starter document, validation
  // server-side (id required, semver version, duplicate (id, version)
  // refused — `_validate_contract_payload(editing=False)`), 303 to the
  // listing on success, the form re-rendered WITH the submitted text and
  // the error on failure (the reference's error round-trip, so a typo
  // never loses the operator's editing)
  // ------------------------------------------------------------------

  /** The starter ODCS document the contract form opens with — the
    * reference's default editor state (version seeded 1.0.0,
    * `server.py:8102`), as the JSON the facade's put route accepts. */
  private val contractSkeleton: String =
    """{
      |  "id": "team.dataset",
      |  "version": "1.0.0",
      |  "status": "active",
      |  "name": "New contract",
      |  "description": "describe the dataset",
      |  "schema": [{
      |    "name": "team.dataset",
      |    "properties": [
      |      {"name": "id", "physicalType": "bigint", "required": true, "unique": true},
      |      {"name": "value", "physicalType": "string"}
      |    ]
      |  }]
      |}""".stripMargin

  /** The starter ODPS document — version seeded 0.1.0, status draft
    * (reference `_data_product_editor_state`, `server.py:9606-9607`). */
  private val productSkeleton: String =
    """{
      |  "id": "dp.new-product",
      |  "version": "0.1.0",
      |  "status": "draft",
      |  "outputPorts": [
      |    {"name": "gold", "contractId": "team.dataset", "version": "1.0.0"}
      |  ]
      |}""".stripMargin

  private def authoringForm(title: String, action: String, prefill: String,
                            error: Option[String],
                            button: String = "Create"): String =
    page(title,
      error.fold("")(e => s"""<p class="block">${esc(e)}</p>\n""") +
        "<form method=\"post\" action=\"" + action + "\">\n" +
        "<textarea name=\"json\" rows=\"24\" cols=\"100\">" + esc(prefill) +
        "</textarea><br>\n" +
        "<button type=\"submit\">" + esc(button) + "</button>\n</form>")

  /** The new-contract form; re-rendered with the operator's text and the
    * validation error on a failed submit. */
  def newContractPage(prefill: Option[String] = None,
                      error: Option[String] = None): String =
    authoringForm("New contract", "/ui/new-contract",
      prefill.getOrElse(contractSkeleton), error)

  /** The new-data-product form — `None` (→ 404) without a product
    * service, like the reference's 503 when no backend is configured. */
  def newProductPage(prefill: Option[String] = None,
                     error: Option[String] = None): Option[String] =
    products.map(_ => authoringForm("New data product", "/ui/new-product",
      prefill.getOrElse(productSkeleton), error))

  /** Serializes the duplicate check against its put: the facade serves
    * forms from a thread pool, and two simultaneous creates of the same
    * (id, version) would both pass a bare check-then-put — the second
    * silently overwriting the first, exactly what "creation never
    * overwrites" forbids. SCOPE: this guards the FORM path of one
    * facade (the GovernanceBackend reviewDraft/updateDraft precedent) —
    * a concurrent direct `/contracts/put` (last-write-wins by design,
    * the reference's `put_contract` too) or a second facade over the
    * same store is governed by the store's own semantics, not this
    * lock. */
  private val createLock = new Object

  /** Create a contract from submitted ODCS JSON — the reference's
    * `_validate_contract_payload(editing=False)` + put: id and version
    * required, version must parse as semver, an already-stored
    * (id, version) is refused (creation never overwrites — edits go
    * through the draft workspace). `Left(message)` for the form to
    * re-render; `Right(contract)` after the store accepted it. */
  /** The validation tail every contract-authoring path shares (id
    * present, version present and semver, no overwrite of a stored
    * (id, version), put under [[createLock]]) — ONE copy, so a gate
    * added here reaches create and edit alike. */
  private def validateAndStore(c: Contract,
                               duplicateMsg: Contract => String): Either[String, Contract] =
    if (c.id.trim.isEmpty) Left("contract id is required")
    else if (c.version.trim.isEmpty) Left("version is required")
    else if (graft.contracts.SemVer.tryParse(c.version).isEmpty)
      Left(s"not a semantic version: ${c.version}")
    else createLock.synchronized {
      if (contracts.get(c.id, c.version).nonEmpty) Left(duplicateMsg(c))
      else { contracts.put(c); Right(c) }
    }

  def createContract(json: String): Either[String, Contract] =
    scala.util.Try(graft.contracts.ContractJson.fromJson(json)).toEither
      .left.map(e => s"invalid contract JSON: ${e.getMessage}")
      .flatMap(validateAndStore(_,
        c => s"contract ${c.id} already has a version ${c.version}"))

  /** The edit form's version seed — the reference's `_next_version`
    * (`server.py:8269`): patch bump of the base (pre-release suffix
    * tolerated and stripped by the bump); strings that are not semver
    * at all pass through unchanged — the FORM still renders for a
    * bespoke-versioned base, but storing requires the operator to pick
    * a semver (the create/edit gates are semver-only, like the
    * reference's). */
  private def nextVersion(v: String): String =
    graft.contracts.SemVer.tryParse(v).map(_.bump("patch").toString).getOrElse(v)

  /** EDIT-as-new-version form (reference
    * `GET /contracts/{cid}/{ver}/edit`, `server.py:9430-9448`):
    * pre-filled with the stored revision's ODCS JSON, version seeded to
    * the next patch — an edit of a RELEASED contract always mints a new
    * version (draft revisions are edited in place through the
    * draft workspace instead). `None` (→ 404) for an unknown base. */
  def editContractPage(id: String, version: String,
                       prefill: Option[String] = None,
                       error: Option[String] = None): Option[String] =
    contracts.get(id, version)
      // drafts edit in place through the review workspace — rendering a
      // form here would be a dead end (editContract refuses every
      // submit), so the draft base 404s like an unknown one
      .filterNot(_.status.map(_.toLowerCase).contains("draft"))
      .map { base =>
        val seed = prefill.getOrElse(graft.contracts.ContractJson.toJson(
          base.copy(version = nextVersion(version))))
        authoringForm(s"Edit contract $id (new version from $version)",
          s"/ui/edit-contract?id=${enc(id)}&version=${enc(version)}", seed, error,
          button = "Create new version")
      }

  /** Apply an edit of `baseId:baseVersion` as a NEW version — the
    * reference's `_validate_contract_payload(editing=True)` +
    * put (`server.py:9081-9099`): the contract id cannot change while
    * editing, the new version must parse, be STRICTLY greater than the
    * base's release core, and not already be stored. Same
    * error-round-trip shape as [[createContract]]. */
  def editContract(baseId: String, baseVersion: String,
                   json: String): Either[String, Contract] =
    contracts.get(baseId, baseVersion) match {
      case None => Left(s"unknown base revision $baseId:$baseVersion")
      // a draft has a review workflow of its own — minting a released
      // revision from an unapproved draft would bypass it
      case Some(b) if b.status.map(_.toLowerCase).contains("draft") =>
        Left("draft revisions are edited in place through the draft workspace")
      case Some(_) =>
        scala.util.Try(graft.contracts.ContractJson.fromJson(json)).toEither
          .left.map(e => s"invalid contract JSON: ${e.getMessage}")
          .flatMap { c =>
            val base = graft.contracts.SemVer.tryParse(baseVersion)
            val next = graft.contracts.SemVer.tryParse(c.version)
            if (c.id != baseId) Left("contract id cannot be changed while editing")
            // FULL semver order (release > pre-release), not just the
            // release core: promoting 2.0.0-rc.1 to 2.0.0 is a legal edit
            else if (base.exists(b => next.exists(_ <= b)))
              Left(s"version ${c.version} must be greater than $baseVersion")
            else validateAndStore(c,
              c2 => s"version ${c2.version} is already stored for contract ${c2.id}")
          }
    }

  /** Create a data product from submitted ODPS JSON — same contract as
    * [[createContract]] over the product service; requires the service
    * (reference 503s without one). */
  def createProduct(json: String): Either[String, graft.products.DataProduct] =
    products.toRight("no data-product service attached").flatMap { pb =>
      scala.util.Try(graft.products.DataProductJson.fromJson(json)).toEither
        .left.map(e => s"invalid data-product JSON: ${e.getMessage}")
        .flatMap { p =>
          val ver = p.version.map(_.trim).getOrElse("")
          if (p.id.trim.isEmpty) Left("data product id is required")
          else if (ver.isEmpty) Left("version is required")
          else if (graft.contracts.SemVer.tryParse(ver).isEmpty)
            Left(s"not a semantic version: $ver")
          else createLock.synchronized {
            if (pb.get(p.id, ver).nonEmpty)
              Left(s"data product ${p.id} already has a version $ver")
            else { pb.put(p); Right(p) }
          }
        }
    }

  /** Dataset listing — reference `datasets.html`: every governed dataset
    * with its latest verdict. */
  def datasetsPage(): String = {
    val rows = gov.listDatasets().map { id =>
      val recs = gov.datasetRecords(Some(id), None)
      val latest = recs.sortBy(-_.lastSeenAt).headOption
      Seq(
        s"""<a href="/ui/dataset?dataset=${enc(id)}">${esc(id)}</a>""",
        latest.map(r => esc(r.datasetVersion)).getOrElse("—"),
        latest.flatMap(_.status).map(st => statusCell(st.status))
          .getOrElse("""<span class="muted">—</span>"""),
        recs.size.toString)
    }
    page("Datasets", table(Seq("dataset", "latest version", "status", "records"), rows))
  }

  /** One dataset's version chain + activity — reference
    * `dataset_detail.html` / `dataset_versions.html`. */
  def datasetPage(dataset: String): Option[String] = {
    val recs = gov.datasetRecords(Some(dataset), None)
    if (recs.isEmpty) return None
    val chain = table(
      Seq("version", "contract", "status", "errors", "warnings", "pipeline touches"),
      recs.sortBy(-_.lastSeenAt).map { r =>
        Seq(
          esc(r.datasetVersion),
          contractLink(r.contractId, r.contractVersion),
          r.status.map(st => statusCell(st.status)).getOrElse("""<span class="muted">—</span>"""),
          r.status.map(_.errors.map(esc).mkString("<br>")).getOrElse(""),
          r.status.map(_.warnings.map(esc).mkString("<br>")).getOrElse(""),
          r.activity.size.toString)
      })
    val metrics = gov.metricHistory(dataset)
    val metricsTable =
      if (metrics.isEmpty) ""
      else "<h2>metric history</h2>" + table(Seq("version", "metric", "value"),
        metrics.map(o => Seq(esc(o.datasetVersion), s"<code>${esc(o.key)}</code>",
          esc(o.valueText))))
    Some(page(s"Dataset $dataset", chain + metricsTable))
  }

  /** Data-product listing — reference `data_products.html`. `None`
    * (→ 404) when the attached backend can't list. */
  def productsPage(): Option[String] = listingProducts.map { pb =>
    val rows = pb.listDataProducts().items.map { id =>
      val latest = pb.latest(id)
      Seq(
        s"""<a href="/ui/product?id=${enc(id)}">${esc(id)}</a>""",
        latest.flatMap(_.version).map(esc).getOrElse("—"),
        latest.map(p => statusCell(p.status)).getOrElse("""<span class="muted">—</span>"""),
        latest.map(p => p.inputPorts.size.toString).getOrElse("0"),
        latest.map(p => p.outputPorts.size.toString).getOrElse("0"))
    }
    page("Data products",
      table(Seq("id", "latest", "status", "input ports", "output ports"), rows) +
        """<p><a href="/ui/new-product">+ new data product</a></p>""")
  }

  /** One data product's latest revision + ports + version chain —
    * reference `data_product_detail.html`. */
  def productPage(id: String): Option[String] = products.flatMap { pb =>
    pb.latest(id).map { p =>
      val meta = "<table>\n" +
        s"<tr><th>latest version</th><td>${p.version.map(esc).getOrElse("—")}</td></tr>\n" +
        s"<tr><th>status</th><td>${statusCell(p.status)}</td></tr>\n" +
        p.name.fold("")(n => s"<tr><th>name</th><td>${esc(n)}</td></tr>\n") +
        "</table>"
      val inputs =
        if (p.inputPorts.isEmpty) ""
        else "<h2>input ports</h2>" + table(Seq("port", "contract", "properties"),
          p.inputPorts.map(ip => Seq(s"<code>${esc(ip.name)}</code>",
            contractLink(ip.contractId, ip.version),
            ip.customProperties.toSeq.sortBy(_._1)
              .map { case (k, v) => s"<code>${esc(k)}</code>=${esc(v)}" }.mkString("<br>"))))
      val outputs =
        if (p.outputPorts.isEmpty) ""
        else "<h2>output ports</h2>" + table(Seq("port", "contract", "type"),
          p.outputPorts.map(op => Seq(s"<code>${esc(op.name)}</code>",
            contractLink(op.contractId, op.version),
            op.portType.map(esc).getOrElse("—"))))
      val versions = "<h2>versions</h2>" + table(Seq("version", "status", ""),
        pb.listVersions(id).map { v =>
          val d = pb.get(id, v)
          Seq(esc(v), d.map(x => statusCell(x.status)).getOrElse("—"),
            s"""<a href="/ui/edit-product?id=${enc(id)}&version=${enc(v)}">edit as new version</a>""")
        })
      page(s"Data product $id", meta + inputs + outputs + versions)
    }
  }

  // ------------------------------------------------------------------
  // setup wizard + integration helper (reference `GET/POST /setup`,
  // `GET /setup/export`, `GET /integration-helper` +
  // `/api/integration-helper/*`, server.py:7897-8112 +
  // templates/setup.html / integration_helper.html)
  // ------------------------------------------------------------------

  /** The wizard's normalized selections. STATELESS by design — a
    * documented deviation from the reference, which persists wizard
    * state in `work_dir/setup_state.json` across steps: here the
    * selections travel in the form fields and ride the export link as
    * query parameters, so the facade stays a pure function of its
    * stores and two operators can walk the wizard concurrently without
    * clobbering each other's half-finished state. */
  private final case class SetupSelections(runtime: String, master: String,
                                           dataRoot: String,
                                           token: Option[String],
                                           modules: Seq[String])

  private val SetupRuntimes = Seq("spark", "streaming")

  private def setupSelections(p: Map[String, String]): SetupSelections = {
    val boxed = SetupBundle.ExampleModules.filter(m =>
      p.get(s"module__$m").exists(_.nonEmpty))
    val listed = p.getOrElse("modules", "").split(",").map(_.trim)
      .filter(SetupBundle.ExampleModules.contains).toSeq
    SetupSelections(
      runtime = p.getOrElse("runtime", "spark").trim,
      master = p.getOrElse("master", "").trim,
      dataRoot = p.getOrElse("data_root", "./graft-data").trim,
      token = p.get("token").map(_.trim).filter(_.nonEmpty),
      modules = SetupBundle.ExampleModules.filter(m =>
        boxed.contains(m) || listed.contains(m)))
  }

  private def setupValidate(s: SetupSelections): Option[String] =
    if (!SetupRuntimes.contains(s.runtime))
      Some(s"unknown pipeline runtime '${s.runtime}' " +
        s"(supported: ${SetupRuntimes.mkString(", ")})")
    else if (s.dataRoot.isEmpty) Some("service data root is required")
    else None

  private def setupBundles(s: SetupSelections): Seq[Bundle] = {
    val hints = Map("spark_master" -> s.master).filter(_._2.nonEmpty)
    Seq(SetupBundle.pipeline(s.runtime, hints).get,
      SetupBundle.service(s.dataRoot, s.token)) ++
      (if (s.modules.isEmpty) Nil
       else Seq(SetupBundle.pipelineExample("spark", s.modules, hints)))
  }

  /** The export control is a POST form of hidden fields, NOT a GET
    * link: the selections include the optional API token, and a token
    * riding a URL leaks into access logs, browser history and Referer
    * headers — a POST body does not. */
  private def setupExportForm(s: SetupSelections): String = {
    def hidden(k: String, v: String) =
      s"""<input type="hidden" name="${esc(k)}" value="${esc(v)}">"""
    // the token round-trips as a password-typed field with autofill off:
    // a plain text/hidden input sits readable in the DOM and gets
    // captured by browser form autofill/history even though the POST
    // design keeps it out of URLs
    def secret(k: String, v: String) =
      s"""<input type="password" style="display:none" name="${esc(k)}" """ +
        s"""value="${esc(v)}" autocomplete="off" aria-hidden="true">"""
    "<form method=\"post\" action=\"/ui/setup/export\">" +
      hidden("runtime", s.runtime) + hidden("master", s.master) +
      hidden("data_root", s.dataRoot) +
      s.token.fold("")(secret("token", _)) +
      (if (s.modules.isEmpty) "" else hidden("modules", s.modules.mkString(","))) +
      "<button type=\"submit\">Download bundle.zip</button></form>"
  }

  /** The setup wizard form (reference `GET /setup` / `setup.html`):
    * pick the pipeline runtime, runtime hints, the service data root,
    * and the optional module-aware example. Re-rendered with the
    * operator's values and the validation error on a failed submit. */
  def setupPage(p: Map[String, String] = Map.empty,
                error: Option[String] = None): String = {
    val s = setupSelections(p)
    def opt(v: String, cur: String) =
      s"""<option${if (v == cur) " selected" else ""}>${esc(v)}</option>"""
    val body =
      error.fold("")(e => s"""<p class="block">${esc(e)}</p>\n""") +
        "<p>Generate a starter deployment: a governed pipeline project, " +
        "the service facade config, and (optionally) a module-aware " +
        "integration example. Review lists the files; export downloads " +
        "the bundle.</p>\n" +
        "<form method=\"post\" action=\"/ui/setup\">\n<table>\n" +
        "<tr><th>pipeline runtime</th><td><select name=\"runtime\">" +
        SetupRuntimes.map(opt(_, s.runtime)).mkString + "</select></td></tr>\n" +
        "<tr><th>spark master (hint)</th><td><input name=\"master\" value=\"" +
        esc(s.master) + "\"></td></tr>\n" +
        "<tr><th>service data root</th><td><input name=\"data_root\" value=\"" +
        esc(s.dataRoot) + "\"></td></tr>\n" +
        "<tr><th>API token (optional)</th><td>" +
        "<input type=\"password\" autocomplete=\"off\" name=\"token\" value=\"" +
        esc(s.token.getOrElse("")) + "\"></td></tr>\n" +
        "<tr><th>example modules</th><td>" +
        SetupBundle.ExampleModules.map(m =>
          s"""<label><input type="checkbox" name="module__${esc(m)}"${
            if (s.modules.contains(m)) " checked" else ""}> ${esc(m)}</label> """)
          .mkString +
        "</td></tr>\n</table>\n" +
        "<button type=\"submit\">Review bundle</button>\n</form>"
    page("Setup", body)
  }

  /** The wizard's review step (the reference's final wizard page):
    * validates the selections, lists every file the export will
    * contain, and links the zip download with the selections encoded in
    * the URL. `Left(error)` re-renders the form. */
  def setupReview(p: Map[String, String]): Either[String, String] = {
    val s = setupSelections(p)
    setupValidate(s).toLeft {
      val sections = setupBundles(s).map { b =>
        s"<h2>${esc(b.root)}/ <span class=\"muted\">(entrypoint ${esc(b.entrypoint)})</span></h2>" +
          table(Seq("file", "bytes"),
            b.files.map(f => Seq(s"<code>${esc(b.root)}/${esc(f.path)}</code>",
              f.content.getBytes("UTF-8").length.toString)))
      }.mkString("\n")
      page("Setup — review",
        sections + setupExportForm(s) +
          """<p><a href="/ui/setup">back to the wizard</a></p>""")
    }
  }

  /** `POST /ui/setup/export` — the zip archive of the selected bundles
    * (the reference streams exactly this from the wizard state; POST,
    * not GET, so the token never rides a URL — see
    * [[setupExportForm]]). */
  def setupExport(p: Map[String, String]): Either[String, Array[Byte]] = {
    val s = setupSelections(p)
    setupValidate(s).toLeft(SetupBundle.zipOf(setupBundles(s)))
  }

  /** The integration helper (reference `GET /integration-helper` +
    * `POST /api/integration-helper/stub`): pick a stored contract (and
    * optionally a data product) in the browser, get the module-aware
    * pipeline stub with the ids FILLED IN, ready to paste. Selection is
    * a GET form — stub generation is pure, so the picked ids ride the
    * query string and the result page is linkable. Unknown selections
    * re-render the picker with the error. */
  def integrationHelperPage(p: Map[String, String] = Map.empty): String = {
    val contractOpts = contracts.listContractIds().flatMap(id =>
      contracts.listVersions(id).map(v => s"$id:$v"))
    val productOpts = listingProducts.toSeq.flatMap(pb =>
      pb.listDataProducts().items.flatMap(id =>
        pb.listVersions(id).map(v => s"$id:$v")))
    val selContract = p.getOrElse("contract", "")
    val selProduct = p.getOrElse("product", "")
    val selIntegration = p.getOrElse("integration", "spark")
    // `picked=1` (a hidden field) marks a real submission: unchecked
    // boxes send no parameters, so without the marker an intentional
    // all-unticked selection would be indistinguishable from the first
    // visit and silently upgrade to every module
    val s = setupSelections(p)
    val selModules =
      if (p.contains("picked")) s.modules
      else if (s.modules.nonEmpty) s.modules
      else SetupBundle.ExampleModules
    def options(vals: Seq[String], cur: String, none: Boolean) =
      (if (none) s"""<option value=""${if (cur.isEmpty) " selected" else ""}>—</option>"""
       else "") +
        vals.map(v => s"""<option${if (v == cur) " selected" else ""}>${esc(v)}</option>""")
          .mkString
    val form =
      "<form method=\"get\" action=\"/ui/integration-helper\">\n<table>\n" +
        "<tr><th>contract</th><td><select name=\"contract\">" +
        options(contractOpts, selContract, none = true) + "</select></td></tr>\n" +
        (if (productOpts.nonEmpty)
          "<tr><th>data product</th><td><select name=\"product\">" +
            options(productOpts, selProduct, none = true) + "</select></td></tr>\n"
         else "") +
        "<tr><th>integration</th><td><select name=\"integration\">" +
        options(Seq("spark", "dlt"), selIntegration, none = false) +
        "</select></td></tr>\n" +
        "<tr><th>modules</th><td>" +
        SetupBundle.ExampleModules.map(m =>
          s"""<label><input type="checkbox" name="module__${esc(m)}"${
            if (selModules.contains(m)) " checked" else ""}> ${esc(m)}</label> """)
          .mkString +
        "</td></tr>\n</table>\n" +
        "<input type=\"hidden\" name=\"picked\" value=\"1\">\n" +
        "<button type=\"submit\">Generate stub</button>\n</form>"
    def split(sel: String): Option[(String, String)] = {
      val i = sel.lastIndexOf(':')
      if (i <= 0 || i == sel.length - 1) None
      else Some((sel.substring(0, i), sel.substring(i + 1)))
    }
    val rendered: String =
      if (selContract.isEmpty) ""
      else split(selContract) match {
        case Some((cid, cver)) if contracts.get(cid, cver).nonEmpty =>
          val productIds = Option(selProduct).filter(_.nonEmpty)
            .flatMap(split).map { case (pid, _) => Map("data_product_id" -> pid) }
            .getOrElse(Map.empty)
          val stub = SetupBundle.pipelineExample(selIntegration, selModules,
            ids = Map("contract_id" -> cid, "contract_version" -> cver) ++
              productIds)
          s"<h2>Generated stub for ${esc(cid)}:${esc(cver)}</h2>" +
            s"<pre>${esc(stub.file("ExampleMain.scala").get.content)}</pre>"
        case _ =>
          s"""<p class="block">unknown contract revision ${esc(selContract)}</p>"""
      }
    page("Integration helper", form + rendered)
  }

  /** EDIT-as-new-version form for a data product (reference
    * `GET /data-products/{id}/{version}/edit`, the product-side twin of
    * [[editContractPage]]): pre-filled with the stored revision's ODPS
    * JSON, version seeded to the next patch. `None` (→ 404) without a
    * product service or for an unknown base. */
  def editProductPage(id: String, version: String,
                      prefill: Option[String] = None,
                      error: Option[String] = None): Option[String] =
    products.flatMap(_.get(id, version)).map { base =>
      val seed = prefill.getOrElse(graft.products.DataProductJson.toJson(
        base.copy(version = Some(nextVersion(version)))))
      authoringForm(s"Edit data product $id (new version from $version)",
        s"/ui/edit-product?id=${enc(id)}&version=${enc(version)}", seed, error,
        button = "Create new version")
    }

  /** Apply a product edit as a NEW version — [[editContract]]'s gates
    * over the product service (reference
    * `POST /data-products/{id}/{version}/edit`): id unchanged, semver,
    * strictly greater than the base, never overwriting a stored
    * version. Products have no draft workspace, so any stored base is
    * editable. */
  def editProduct(baseId: String, baseVersion: String,
                  json: String): Either[String, graft.products.DataProduct] =
    products.toRight("no data-product service attached").flatMap { pb =>
      pb.get(baseId, baseVersion) match {
        case None => Left(s"unknown base revision $baseId:$baseVersion")
        case Some(_) =>
          scala.util.Try(graft.products.DataProductJson.fromJson(json)).toEither
            .left.map(e => s"invalid data-product JSON: ${e.getMessage}")
            .flatMap { pr =>
              val ver = pr.version.map(_.trim).getOrElse("")
              val base = graft.contracts.SemVer.tryParse(baseVersion)
              val next = graft.contracts.SemVer.tryParse(ver)
              if (pr.id != baseId)
                Left("data product id cannot be changed while editing")
              else if (ver.isEmpty) Left("version is required")
              else if (next.isEmpty) Left(s"not a semantic version: $ver")
              else if (base.exists(b => next.exists(_ <= b)))
                Left(s"version $ver must be greater than $baseVersion")
              else createLock.synchronized {
                if (pb.get(pr.id, ver).nonEmpty)
                  Left(s"data product ${pr.id} already has a version $ver")
                else { pb.put(pr); Right(pr) }
              }
            }
      }
    }

  // ------------------------------------------------------------------
  // dispatch
  // ------------------------------------------------------------------

  /** Route a `/ui...` path + query params to a page. `None` = 404. */
  def render(path: String, params: Map[String, String]): Option[String] =
    path.stripSuffix("/") match {
      case "/ui" | "" => Some(index())
      case "/ui/contracts" => Some(contractsPage())
      case "/ui/new-contract" => Some(newContractPage())
      case "/ui/new-product" => newProductPage()
      case "/ui/edit-contract" =>
        (params.get("id"), params.get("version")) match {
          case (Some(id), Some(v)) => editContractPage(id, v)
          case _ => None
        }
      case "/ui/drafts" => Some(draftsPage())
      case "/ui/draft-edit" =>
        (params.get("id"), params.get("version")) match {
          case (Some(id), Some(v)) => draftEditPage(id, v)
          case _ => None
        }
      case "/ui/contract" =>
        params.get("id").flatMap(id => contractPage(id, params.get("version")))
      case "/ui/validate-contract" =>
        (params.get("id"), params.get("version"), params.get("dataset"),
          params.get("datasetVersion")) match {
          case (Some(id), Some(v), Some(ds), Some(dv)) =>
            validatePage(id, v, ds, dv)
          case _ => None
        }
      case "/ui/datasets" => Some(datasetsPage())
      case "/ui/dataset" => params.get("dataset").flatMap(datasetPage)
      case "/ui/products" => productsPage()
      case "/ui/product" => params.get("id").flatMap(productPage)
      case "/ui/setup" => Some(setupPage(params))
      case "/ui/integration-helper" => Some(integrationHelperPage(params))
      case "/ui/edit-product" =>
        (params.get("id"), params.get("version")) match {
          case (Some(id), Some(v)) => editProductPage(id, v)
          case _ => None
        }
      case _ => None
    }
}
