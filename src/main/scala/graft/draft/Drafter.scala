package graft.draft

import graft.contracts._
import graft.quality.SchemaSnapshot
import org.apache.spark.sql.DataFrame

/** Draft contracts from observed DataFrame schemas.
  * Mirrors dc43 `spark/contracts.py:105-191`: materialise an ODCS draft
  * from the observed schema, or patch-bump a base contract and refresh its
  * properties with what the runtime actually saw.
  */
object Drafter {

  private val InvalidIdent = "[^0-9A-Za-z-]+".r

  /** Semver-friendly identifier token (reference `_normalise_identifier`,
    * `drafting.py:26-32`): non-alphanumerics collapse to `-`, edges
    * trimmed; empty means no token. */
  private def normIdent(v: String): Option[String] = {
    val t = InvalidIdent.replaceAllIn(v, "-").dropWhile(_ == '-')
      .reverse.dropWhile(_ == '-').reverse
    Option(t).filter(_.nonEmpty)
  }

  /** Keys the reference scans for a reviewer-friendly origin label
    * (`_pipeline_hint`, `drafting.py:35-48`), in priority order. */
  private val PipelineKeys =
    Seq("pipeline", "job", "project", "module", "function", "qualname", "source")

  private def pipelineValue(ctx: Map[String, String]): Option[String] =
    PipelineKeys.iterator.map(ctx.get).collectFirst { case Some(v) if v.nonEmpty => v }

  private def pipelineHint(ctx: Map[String, String]): Option[String] =
    PipelineKeys.iterator.flatMap(k => ctx.get(k).flatMap(normIdent)).nextOption()

  /** Draft-version pre-release suffix (reference `_draft_version_suffix`,
    * `drafting.py:51-77`): `draft` + normalised dataset version + dataset
    * id + pipeline hint. DEVIATION: the reference appends a wall-clock
    * timestamp and uuid entropy for global uniqueness; graft omits both —
    * a draft version here is a pure function of its inputs, so retries
    * and re-runs converge on ONE stored draft instead of littering the
    * store with per-attempt copies (stores overwrite same-version puts). */
  private def draftSuffix(datasetId: Option[String], datasetVersion: Option[String],
                          ctx: Map[String, String]): String =
    (Seq("draft") ++ datasetVersion.flatMap(normIdent) ++
      datasetId.flatMap(normIdent) ++ pipelineHint(ctx)).mkString("-")

  private def json(fields: (String, org.json4s.JValue)*): String =
    org.json4s.jackson.JsonMethods.compact(
      org.json4s.jackson.JsonMethods.render(org.json4s.JObject(fields.toList)))

  private def jAny(v: Any): org.json4s.JValue = v match {
    case n: Long    => org.json4s.JLong(n)
    case n: Int     => org.json4s.JLong(n.toLong)
    case n: Double  => org.json4s.JDouble(n)
    case n: Number  => org.json4s.JDouble(n.doubleValue)
    case b: Boolean => org.json4s.JBool(b)
    case other      => org.json4s.JString(String.valueOf(other))
  }

  /** Draft a revised contract from validation feedback — the twin of the
    * reference's `draft_from_validation_result`
    * (`contracts/backend/drafting.py:204-365`): only produced when the
    * validation carried errors or warnings; the base is minor-bumped with
    * a draft suffix, observed field types/nullability overwrite the
    * declared ones, and quality rules the data violated are dropped.
    *
    * The draft carries the reference's full review-context payload in
    * customProperties (nested payloads as compact JSON — this model's
    * properties are string-valued): `draft_context` (context + provenance
    * defaults + module hint), `draft_pipeline`, `provenance`,
    * `validation_metrics`, `validation_outcome`, `dq_feedback`,
    * `data_format`, `validation_reference` (only when `collectedAt` is
    * supplied — wall-clock stamps are caller-injected, never implicit,
    * so drafting stays deterministic), plus the flat `draftContext`
    * entries for direct lookup and the pre-existing `base_contract` /
    * `validation_errors` / `draft_change_log`.
    *
    * Enum rules follow the reference's `_enum_extension`
    * (`drafting.py:158-201, 501-519`): a violated enum is never dropped —
    * when the metrics carry `observed.enum_<field>` values (produced by
    * `Metrics.computeWithObservations`, riding the same single-pass agg)
    * the rule is EXTENDED with the unseen values; without observations it
    * is kept unchanged. Additions append in sorted order (the metrics
    * payload is sorted for cross-partitioning determinism; the reference
    * appends in observation order, which a distributed collect can't
    * reproduce). */
  def fromValidation(
      validation: graft.quality.ValidationResult,
      baseContract: Contract,
      bump: String = "minor",
      draftContext: Map[String, String] = Map.empty,
      datasetId: Option[String] = None,
      datasetVersion: Option[String] = None,
      dataFormat: Option[String] = None,
      dqStatus: Option[String] = None,
      dqFeedback: Map[String, String] = Map.empty,
      collectedAt: Option[String] = None
  ): Option[Contract] = {
    if (validation.errors.isEmpty && validation.warnings.isEmpty) return None
    val bumped = SemVer.tryParse(baseContract.version).getOrElse(SemVer(0, 1, 0)).bump(bump)
    // flat dataset_id/dataset_version context entries double as suffix
    // provenance when the dedicated params are absent (the GovernanceBackend
    // call path supplies them through draftContext)
    val dsId = datasetId.orElse(draftContext.get("dataset_id"))
    val dsVer = datasetVersion.orElse(draftContext.get("dataset_version"))
    val suffix = draftSuffix(dsId, dsVer, draftContext)
    val log = Seq.newBuilder[String]

    val newSchema = baseContract.schema.map { obj =>
      obj.copy(properties = obj.properties.map { f =>
        val observed = validation.schema.get(f.name)
        val newType = observed.map(_.odcsType).orElse(f.physicalType.orElse(f.logicalType))
        if (observed.exists(o => f.odcsType != OdcsTypes.canonical(o.odcsType)))
          log += s"${f.name}: type ${f.odcsType} -> ${observed.get.odcsType}"
        // relax `required` only on observed null VIOLATIONS — runtime
        // nullability flags are true for every parquet/csv column and
        // prove nothing about the data (metrics do)
        val nullViolations = validation.metrics
          .get(s"violations.not_null_${f.name}")
          .orElse(validation.metrics.get(s"violations.required_${f.name}"))
          .collect { case n: Number => n.longValue }
        val nowRequired = if (f.required) nullViolations.forall(_ == 0L) else f.required
        if (f.required && !nowRequired) log += s"${f.name}: relaxed required"
        val keptQuality = f.quality.flatMap { dq =>
          val key = ruleKeyOf(dq, f.name)
          val violated = key.exists(k =>
            validation.metrics.get(s"violations.$k").exists {
              case n: Number => n.longValue > 0
              case _         => false
            })
          if (!violated) Some(dq)
          else if (dq.rule.exists(_.equalsIgnoreCase("enum"))) {
            // reference semantics: enums extend or stay, never drop
            val observed: Seq[String] = key
              .flatMap(k => validation.metrics.get(s"observed.$k"))
              .collect { case s: Seq[_] => s.map(String.valueOf) }
              .getOrElse(Nil)
            val additions = observed.filterNot(dq.values.toSet)
            if (additions.nonEmpty) {
              log += s"${f.name}: extended enum with ${additions.mkString(",")}"
              Some(dq.copy(values = dq.values ++ additions))
            } else { log += s"${f.name}: kept violated enum (no observations)"; Some(dq) }
          } else {
            log += s"${f.name}: dropped violated rule ${key.getOrElse("?")}"
            None
          }
        }
        f.copy(physicalType = newType, required = nowRequired, quality = keptQuality)
      })
    }

    import org.json4s.{JArray, JObject, JString, JBool, JValue}
    // context payload: caller context + provenance defaults + the module
    // hint the reference derives from a dotted pipeline value
    val pipeVal = pipelineValue(draftContext)
    val ctxPayload = {
      val base = draftContext ++
        dsId.filterNot(_ => draftContext.contains("dataset_id"))
          .map("dataset_id" -> _) ++
        dsVer.filterNot(_ => draftContext.contains("dataset_version"))
          .map("dataset_version" -> _)
      pipeVal.filterNot(_ => base.contains("module"))
        .map(v => base + ("module" -> v.split('.').dropRight(1).mkString(".")))
        .filter(_.get("module").exists(_.nonEmpty)).getOrElse(base)
    }
    val structured = Seq.newBuilder[(String, String)]
    structured += "validation_metrics" -> json(
      "metrics" -> JObject(validation.metrics.toList.sortBy(_._1)
        .map { case (k, v) => k -> jAny(v) }),
      "schema" -> JObject(validation.schema.toList.sortBy(_._1).map { case (k, s) =>
        k -> (JObject(
          "backend_type" -> JString(s.backendType),
          "odcs_type" -> JString(s.odcsType),
          "nullable" -> JBool(s.nullable)): JValue)
      }))
    structured += "validation_outcome" -> json(
      "errors" -> JArray(validation.errors.toList.map(JString(_))),
      "warnings" -> JArray(validation.warnings.toList.map(JString(_))))
    if (dqStatus.nonEmpty || dqFeedback.nonEmpty)
      structured += "dq_feedback" -> json(
        (dqFeedback ++ dqStatus.filterNot(_ => dqFeedback.contains("status"))
          .map("status" -> _)).toList.sortBy(_._1)
          .map { case (k, v) => k -> (JString(v): JValue) }: _*)
    dataFormat.foreach(f => structured += "data_format" -> f)
    if (ctxPayload.nonEmpty)
      structured += "draft_context" -> json(ctxPayload.toList.sortBy(_._1)
        .map { case (k, v) => k -> (JString(v): JValue) }: _*)
    pipeVal.orElse(pipelineHint(draftContext))
      .foreach(v => structured += "draft_pipeline" -> v)
    if (dsId.nonEmpty || dsVer.nonEmpty)
      structured += "provenance" -> json(
        (dsId.map("dataset_id" -> _) ++ dsVer.map("dataset_version" -> _))
          .toList.map { case (k, v) => k -> (JString(v): JValue) }: _*)
    // wall-clock stamp only when the CALLER supplies it: drafting itself
    // must stay a pure function of its inputs
    for (at <- collectedAt if dsId.nonEmpty || dsVer.nonEmpty)
      structured += "validation_reference" -> json(
        (dsId.map("dataset_id" -> _) ++ dsVer.map("dataset_version" -> _))
          .toList.map { case (k, v) => k -> (JString(v): JValue) } :+
          ("collected_at" -> (JString(at): JValue)): _*)

    Some(baseContract.copy(
      version = s"$bumped-$suffix",
      status = Some("draft"),
      schema = newSchema,
      customProperties = baseContract.customProperties ++ draftContext ++
        structured.result().toMap ++ Map(
        "base_contract" -> s"${baseContract.id}:${baseContract.version}",
        "validation_errors" -> validation.errors.mkString("; "),
        "draft_change_log" -> log.result().mkString("; "))))
  }

  /** Data-driven draft (graft extension beyond the reference's
    * schema-only drafting): profile the frame in one pass and propose
    * range quality rules from the observed envelope, widened by
    * `margin` (relative) so natural drift doesn't instantly violate the
    * draft. Required flags come from observed null counts, not just
    * schema nullability. */
  def fromDataFrameWithStats(
      df: org.apache.spark.sql.DataFrame,
      contractId: String,
      margin: Double = 0.1,
      baseVersion: String = "0.1.0"
  ): Contract = {
    val profiles = graft.quality.Profiler.profile(df)
    // exact BigDecimal arithmetic — a math.round path would clamp at
    // Long.MaxValue and invert bounds for epoch-micros-sized values
    def widen(v: Double, up: Boolean): BigDecimal = {
      val bd = BigDecimal(v)
      val delta = (bd.abs * BigDecimal(margin)).max(BigDecimal("1e-9"))
      (if (up) bd + delta else bd - delta)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP)
    }
    val fields = profiles.map { p =>
      val rules = (p.min, p.max) match {
        case (Some(lo), Some(hi)) if !lo.isNaN && !hi.isNaN
            && !lo.isInfinity && !hi.isInfinity => Seq(
          QualityRule(mustBeGreaterOrEqualTo = Some(widen(lo, up = false))),
          QualityRule(mustBeLessOrEqualTo = Some(widen(hi, up = true))))
        case _ => Nil
      }
      FieldDef(p.name, Some(p.odcsType), required = p.nullCount == 0, quality = rules)
    }
    Contract(
      id = contractId,
      version = draftVersion(baseVersion),
      status = Some("draft"),
      schema = Seq(SchemaObjectDef(contractId, fields)),
      customProperties = Map("draft_source" -> "profile",
        "profile_margin" -> margin.toString))
  }

  /** Metric key a per-field quality rule reports under, if countable. */
  private def ruleKeyOf(dq: QualityRule, field: String): Option[String] = {
    if (dq.mustBeGreaterThan.isDefined) Some(s"gt_$field")
    else if (dq.mustBeGreaterOrEqualTo.isDefined) Some(s"ge_$field")
    else if (dq.mustBeLessThan.isDefined) Some(s"lt_$field")
    else if (dq.mustBeLessOrEqualTo.isDefined) Some(s"le_$field")
    else dq.rule.map(_.toLowerCase) match {
      case Some("enum")   => Some(s"enum_$field")
      case Some("regex")  => Some(s"regex_$field")
      case Some("unique") => Some(s"unique_$field")
      case _              => None
    }
  }

  /** Draft version string: patch-bumped base with a `draft` suffix. */
  def draftVersion(baseVersion: String, hasContext: Boolean = false): String = {
    val bumped = SemVer.tryParse(baseVersion).getOrElse(SemVer(0, 1, 0)).bump("patch")
    val suffix = if (hasContext) "ctx-draft" else "draft"
    s"$bumped-$suffix"
  }

  def fromDataFrame(
      df: DataFrame,
      contractId: String,
      baseContract: Option[Contract] = None,
      baseVersion: String = "0.1.0",
      name: Option[String] = None,
      description: Option[String] = None,
      draftContext: Map[String, String] = Map.empty
  ): Contract = {
    val snapshot = SchemaSnapshot.of(df)
    val observedProps: Seq[FieldDef] = snapshot.toSeq.map { case (colName, info) =>
      FieldDef(
        name = colName,
        physicalType = Some(info.odcsType),
        required = !info.nullable
      )
    }

    val base = baseContract.getOrElse(
      Contract(
        id = contractId,
        version = baseVersion,
        name = name.orElse(Some(contractId)),
        description = description,
        schema = Seq(SchemaObjectDef(name.getOrElse(contractId), Nil))
      )
    )

    // refresh/overlay observed properties onto the base object's schema,
    // keeping declared quality rules for properties that still exist
    val baseObj = base.schema.headOption.getOrElse(SchemaObjectDef(contractId, Nil))
    val declared = baseObj.properties.map(p => p.name -> p).toMap
    val merged = observedProps.map { obs =>
      declared.get(obs.name) match {
        case Some(d) => d.copy(physicalType = obs.physicalType.orElse(d.physicalType))
        case None    => obs
      }
    }

    base.copy(
      version = draftVersion(base.version, draftContext.nonEmpty),
      status = Some("draft"),
      schema = Seq(baseObj.copy(properties = merged)) ++ base.schema.drop(1),
      customProperties = base.customProperties ++ draftContext
    )
  }
}
