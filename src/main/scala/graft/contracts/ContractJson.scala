package graft.contracts

import org.json4s._
import org.json4s.jackson.JsonMethods

/** JSON (de)serialisation for the ODCS-lite contract model.
  *
  * Accepts the ODCS 3.x field spelling used by the reference
  * (`schema` array of objects with `properties`, per-property `quality`
  * entries carrying `mustBe*` thresholds / `rule` discriminators — see
  * dc43 `data_quality/backend/engine.py:48-163`).
  */
object ContractJson {

  def toJson(c: Contract): String = JsonMethods.pretty(JsonMethods.render(contractToJValue(c)))

  def fromJson(s: String): Contract = jvalueToContract(JsonMethods.parse(s))

  // --- encode ---

  private[contracts] def contractToJValue(c: Contract): JValue = {
    val base: List[(String, JValue)] = List(
      "id" -> JString(c.id),
      "version" -> JString(c.version),
      "kind" -> JString(c.kind),
      "apiVersion" -> JString(c.apiVersion)
    ) ++
      c.name.map(v => "name" -> JString(v)) ++
      c.description.map(v => "description" -> JString(v)) ++
      c.status.map(v => "status" -> JString(v)) ++
      List("schema" -> JArray(c.schema.map(objToJValue).toList)) ++
      (if (c.servers.nonEmpty)
         List("servers" -> JArray(c.servers.map(serverToJValue).toList))
       else Nil) ++
      (if (c.customProperties.nonEmpty)
         List("customProperties" -> JArray(c.customProperties.map { case (k, v) =>
           JObject("property" -> JString(k), "value" -> JString(v))
         }.toList))
       else Nil)
    JObject(base: _*)
  }

  private def objToJValue(o: SchemaObjectDef): JValue =
    JObject(
      List[(String, JValue)]("name" -> JString(o.name),
        "properties" -> JArray(o.properties.map(fieldToJValue).toList)) ++
        (if (o.quality.nonEmpty) List("quality" -> JArray(o.quality.map(ruleToJValue).toList)) else Nil): _*
    )

  private def fieldToJValue(f: FieldDef): JValue = {
    val base: List[(String, JValue)] = List("name" -> JString(f.name)) ++
      f.physicalType.map(v => "physicalType" -> JString(v)) ++
      f.logicalType.map(v => "logicalType" -> JString(v)) ++
      List("required" -> JBool(f.required), "unique" -> JBool(f.unique)) ++
      (if (f.quality.nonEmpty) List("quality" -> JArray(f.quality.map(ruleToJValue).toList)) else Nil) ++
      (if (f.fields.nonEmpty) List("properties" -> JArray(f.fields.map(fieldToJValue).toList)) else Nil) ++
      f.items.map(i => "items" -> fieldToJValue(i))
    JObject(base: _*)
  }

  private def serverToJValue(s: ServerDef): JValue = JObject(
    (s.server.map(v => "server" -> (JString(v): JValue)) ++
      s.serverType.map(v => "type" -> (JString(v): JValue)) ++
      s.host.map(v => "host" -> (JString(v): JValue)) ++
      s.path.map(v => "path" -> (JString(v): JValue)) ++
      s.format.map(v => "format" -> (JString(v): JValue)) ++
      s.catalog.map(v => "catalog" -> (JString(v): JValue)) ++
      s.schemaName.map(v => "schema" -> (JString(v): JValue)) ++
      s.dataset.map(v => "dataset" -> (JString(v): JValue))).toList: _*)

  private def ruleToJValue(r: QualityRule): JValue = {
    def dec(v: BigDecimal): JValue = JDecimal(v)
    val mustBe: Option[(String, JValue)] =
      if (r.values.nonEmpty)
        Some("mustBe" -> JArray(r.values.toList.map(v =>
          if (r.valuesAreNumeric) JDecimal(BigDecimal(v)) else JString(v))))
      else r.pattern.map(p => "mustBe" -> JString(p))
    val base: List[(String, JValue)] =
      r.rule.map(v => "rule" -> JString(v)).toList ++
        r.name.map(v => "name" -> JString(v)) ++
        r.mustBeGreaterThan.map(v => "mustBeGreaterThan" -> dec(v)) ++
        r.mustBeGreaterOrEqualTo.map(v => "mustBeGreaterOrEqualTo" -> dec(v)) ++
        r.mustBeLessThan.map(v => "mustBeLessThan" -> dec(v)) ++
        r.mustBeLessOrEqualTo.map(v => "mustBeLessOrEqualTo" -> dec(v)) ++
        mustBe ++
        r.query.map(v => "query" -> JString(v)) ++
        r.engine.map(v => "engine" -> JString(v))
    JObject(base: _*)
  }

  // --- decode ---

  private def str(j: JValue): Option[String] = j match {
    case JString(s) => Some(s)
    case JInt(i)    => Some(i.toString)
    case JDecimal(d) => Some(d.toString)
    case JDouble(d) => Some(d.toString)
    case _          => None
  }

  private def dec(j: JValue): Option[BigDecimal] = j match {
    case JInt(i)     => Some(BigDecimal(i))
    case JDecimal(d) => Some(d)
    case JDouble(d)  => Some(BigDecimal(d))
    case JString(s)  => scala.util.Try(BigDecimal(s)).toOption
    case _           => None
  }

  private[contracts] def jvalueToContract(j: JValue): Contract = {
    val fields = j match { case JObject(fs) => fs.toMap; case _ => Map.empty[String, JValue] }
    Contract(
      id = fields.get("id").flatMap(str).getOrElse(""),
      version = fields.get("version").flatMap(str).getOrElse("0.0.0"),
      name = fields.get("name").flatMap(str),
      description = fields.get("description").flatMap(str),
      status = fields.get("status").flatMap(str),
      kind = fields.get("kind").flatMap(str).getOrElse("DataContract"),
      apiVersion = fields.get("apiVersion").flatMap(str).getOrElse("v3.0.2"),
      schema = fields.get("schema") match {
        case Some(JArray(objs)) => objs.map(jvalueToObj)
        case _                  => Nil
      },
      servers = fields.get("servers") match {
        case Some(JArray(ss)) => ss.map(jvalueToServer)
        case _                => Nil
      },
      customProperties = fields.get("customProperties") match {
        case Some(JArray(items)) =>
          items.flatMap {
            case JObject(kv) =>
              val m = kv.toMap
              for (k <- m.get("property").flatMap(str); v <- m.get("value").flatMap(str)) yield k -> v
            case _ => None
          }.toMap
        case _ => Map.empty
      }
    )
  }

  private def jvalueToServer(j: JValue): ServerDef = {
    val fields = j match { case JObject(fs) => fs.toMap; case _ => Map.empty[String, JValue] }
    ServerDef(
      server = fields.get("server").flatMap(str),
      serverType = fields.get("type").flatMap(str),
      host = fields.get("host").flatMap(str),
      path = fields.get("path").flatMap(str),
      format = fields.get("format").flatMap(str),
      catalog = fields.get("catalog").flatMap(str),
      // the reference accepts schema_ / schema / database in that order
      // (`unity_catalog.py:190`)
      schemaName = fields.get("schema").orElse(fields.get("database")).flatMap(str),
      dataset = fields.get("dataset").flatMap(str))
  }

  private def jvalueToObj(j: JValue): SchemaObjectDef = {
    val fields = j match { case JObject(fs) => fs.toMap; case _ => Map.empty[String, JValue] }
    SchemaObjectDef(
      name = fields.get("name").flatMap(str).getOrElse(""),
      properties = fields.get("properties") match {
        case Some(JArray(ps)) => ps.map(jvalueToField)
        case _                => Nil
      },
      quality = fields.get("quality") match {
        case Some(JArray(qs)) => qs.map(jvalueToRule)
        case _                => Nil
      }
    )
  }

  private def jvalueToField(j: JValue): FieldDef = {
    val fields = j match { case JObject(fs) => fs.toMap; case _ => Map.empty[String, JValue] }
    val bool: JValue => Boolean = { case JBool(b) => b; case _ => false }
    FieldDef(
      name = fields.get("name").flatMap(str).getOrElse(""),
      physicalType = fields.get("physicalType").flatMap(str),
      logicalType = fields.get("logicalType").flatMap(str),
      required = fields.get("required").exists(bool),
      unique = fields.get("unique").exists(bool),
      quality = fields.get("quality") match {
        case Some(JArray(qs)) => qs.map(jvalueToRule)
        case _                => Nil
      },
      fields = fields.get("properties") match {
        case Some(JArray(ps)) => ps.map(jvalueToField)
        case _                => Nil
      },
      items = fields.get("items").map(jvalueToField)
    )
  }

  private def jvalueToRule(j: JValue): QualityRule = {
    val fields = j match { case JObject(fs) => fs.toMap; case _ => Map.empty[String, JValue] }
    val ruleName = fields.get("rule").flatMap(str).map(_.toLowerCase)
    val mustBe = fields.get("mustBe")
    val (values, numeric, pattern) = mustBe match {
      case Some(JArray(vs)) =>
        val isNum = vs.forall { case JInt(_) | JDouble(_) | JDecimal(_) => true; case _ => false }
        (vs.flatMap(str), isNum, None)
      case Some(other) if ruleName.contains("regex") => (Nil, false, str(other))
      case _ => (Nil, false, None)
    }
    QualityRule(
      rule = ruleName,
      mustBeGreaterThan = fields.get("mustBeGreaterThan").flatMap(dec),
      mustBeGreaterOrEqualTo = fields.get("mustBeGreaterOrEqualTo").flatMap(dec),
      mustBeLessThan = fields.get("mustBeLessThan").flatMap(dec),
      mustBeLessOrEqualTo = fields.get("mustBeLessOrEqualTo").flatMap(dec),
      values = values,
      valuesAreNumeric = numeric,
      pattern = pattern,
      query = fields.get("query").flatMap(str),
      engine = fields.get("engine").flatMap(str),
      name = fields.get("name").flatMap(str)
    )
  }
}
