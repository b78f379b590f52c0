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
