package graft.governance

import graft.contracts.Contract
import org.apache.spark.sql.SparkSession

/** Catalog synchronisation after governance link operations — the
  * Spark-catalog re-expression of the reference's Unity Catalog linker
  * (dc43 `governance/unity_catalog.py:215-311`): when a dataset version
  * is linked to a contract version, stamp the affected catalog tables
  * with the contract/dataset provenance as table properties (and,
  * optionally, tags), so catalog browsers see which contract governs a
  * table without consulting the governance store.
  *
  * Structure mirrors the reference exactly — pluggable property/tag
  * updaters, a dataset-id prefix resolver, a contract-`servers` table
  * resolver, reserved-key filtering, tag-character normalisation, and
  * skip-tables — but the default updaters drive the SPARK SESSION
  * CATALOG via `ALTER TABLE … SET TBLPROPERTIES` (public Spark SQL DDL)
  * instead of a Databricks SQL warehouse connection. Every failure path
  * warns through `onWarn` and never throws: catalog decoration must not
  * fail the link operation that triggered it.
  */
object CatalogLinker {

  type TablePropertyUpdater = (String, Map[String, String]) => Unit
  /** (table, tags to set, tag keys to unset). */
  type TableTagUpdater = (String, Map[String, String], Seq[String]) => Unit
  type MetadataProvider = (String, String, String, String) => Map[String, String]
  type DatasetToTable = String => Option[String]
  type ContractLoader = (String, String) => Option[Contract]
  type ContractTableResolver = Contract => Seq[String]

  /** Property keys the governed catalog owns (reference
    * `_RESERVED_PROPERTY_KEYS`, `unity_catalog.py:43`). */
  val ReservedPropertyKeys: Set[String] = Set("owner")
  private val InvalidTagChars: Set[Char] = Set('.', ',', '-', '=', '/', ':')

  /** Default provenance stamped onto linked tables (reference
    * `_default_metadata`, `unity_catalog.py:47-59`). Keys keep the
    * reference's `dc43.` spelling so a catalog populated by the
    * reference stays readable by graft and vice versa. */
  def defaultMetadata(datasetId: String, datasetVersion: String,
                      contractId: String, contractVersion: String): Map[String, String] = {
    val base = Map(
      "dc43.contract_id" -> contractId,
      "dc43.contract_version" -> contractVersion)
    if (datasetVersion.nonEmpty) base + ("dc43.dataset_version" -> datasetVersion) else base
  }

  /** `table:<name>` dataset ids map to catalog tables; everything else is
    * not table-backed (reference `prefix_table_resolver`,
    * `unity_catalog.py:62-74`). An empty prefix passes ids through. */
  def prefixTableResolver(prefix: String = "table:"): DatasetToTable = { datasetId =>
    if (prefix.isEmpty) Some(datasetId)
    else if (datasetId.startsWith(prefix)) Some(datasetId.drop(prefix.length))
    else None
  }

  /** Canonical form for skip/seen comparisons: backticks stripped,
    * lower-cased (reference `_normalise_table_identifier`). */
  def normaliseTableIdentifier(value: String): Option[String] =
    Option(value).map(_.trim.replace("`", "").toLowerCase).filter(_.nonEmpty)

  /** Table identifiers from a contract's `servers` entries —
    * catalog.schema.dataset, deduplicated case-insensitively, first
    * spelling wins (reference `contract_servers_table_resolver`,
    * `unity_catalog.py:197-212`). */
  def contractServersTableResolver(contract: Contract): Seq[String] = {
    val seen = scala.collection.mutable.Set.empty[String]
    contract.servers.flatMap { s =>
      s.dataset.map(_.trim).filter(_.nonEmpty).flatMap { ds =>
        val parts = (s.catalog ++ s.schemaName).map(_.trim).filter(_.nonEmpty).toSeq :+ ds
        val table = parts.mkString(".")
        normaliseTableIdentifier(table).filter(seen.add).map(_ => table)
      }
    }
  }

  private[governance] def normalisePropertyKey(key: String, onWarn: String => Unit): Option[String] = {
    val text = key.trim
    if (text.isEmpty) None
    else if (ReservedPropertyKeys(text.toLowerCase)) {
      onWarn(s"catalog property '$text' is reserved and will be ignored")
      None
    } else Some(text)
  }

  private[governance] def normaliseTagKey(key: String, onWarn: String => Unit): Option[String] = {
    val text = key.trim
    if (text.isEmpty) return None
    val cleaned = text.map(c => if (InvalidTagChars(c)) '_' else c)
    if (cleaned != text)
      onWarn(s"catalog tag '$text' contains reserved characters; converted to '$cleaned'")
    if (ReservedPropertyKeys(cleaned.toLowerCase)) {
      onWarn(s"catalog tag '$text' resolves to a reserved name and will be ignored")
      None
    } else Some(cleaned)
  }

  /** Static extras merge UNDER the per-link metadata (reference
    * `_build_properties` iterates extra first, metadata second). */
  private[governance] def buildProperties(metadata: Map[String, String],
                                          extra: Map[String, String],
                                          onWarn: String => Unit): Map[String, String] =
    (extra.toSeq ++ metadata.toSeq).flatMap { case (k, v) =>
      Option(v).flatMap(value => normalisePropertyKey(k, onWarn).map(_ -> value))
    }.toMap

  /** Tags plus the full key set (used to UNSET stale tags when a link
    * carries no tag values — reference `_build_tags`). */
  private[governance] def buildTags(metadata: Map[String, String],
                                    extra: Map[String, String],
                                    onWarn: String => Unit): (Map[String, String], Set[String]) = {
    val entries = (extra.toSeq ++ metadata.toSeq).flatMap { case (k, v) =>
      normaliseTagKey(k, onWarn).map(_ -> Option(v))
    }
    (entries.collect { case (k, Some(v)) => k -> v }.toMap, entries.map(_._1).toSet)
  }

  /** Backtick-quote a dotted identifier, escaping embedded backticks
    * (reference `_quote_identifier`, `unity_catalog.py:314-319`). */
  def quoteIdentifier(identifier: String): String = {
    val segments = identifier.split('.').map(_.trim).filter(_.nonEmpty)
    require(segments.nonEmpty, "catalog table name is empty")
    segments.map(s => "`" + s.replace("`", "``") + "`").mkString(".")
  }

  private def quoteLiteral(value: String): String = value.replace("'", "''")

  /** Property updater over the session catalog: one
    * `ALTER TABLE … SET TBLPROPERTIES` per table, keys sorted for a
    * deterministic statement (reference `sql_table_property_updater`
    * renders the identical DDL against its warehouse engine). */
  def sparkTablePropertyUpdater(spark: SparkSession): TablePropertyUpdater =
    (table, properties) => if (properties.nonEmpty) {
      val assignments = properties.toSeq.sortBy(_._1).map { case (k, v) =>
        s"'${quoteLiteral(k)}'='${quoteLiteral(v)}'"
      }.mkString(", ")
      spark.sql(s"ALTER TABLE ${quoteIdentifier(table)} SET TBLPROPERTIES ($assignments)")
    }

  /** Tag updater over the session catalog. DEVIATION: open-source Spark
    * has no `SET TAGS` DDL, so tags land as TBLPROPERTIES under
    * `tagPrefix` (default `dc43.tag.`) — same normalisation and
    * set/unset lifecycle as the reference's
    * `sql_table_tag_updater`, different physical spelling. */
  def sparkTableTagUpdater(spark: SparkSession,
                           tagPrefix: String = "dc43.tag."): TableTagUpdater =
    (table, tags, unsetTags) => {
      val id = quoteIdentifier(table)
      if (unsetTags.nonEmpty) {
        val keys = unsetTags.sorted.map(k => s"'${quoteLiteral(tagPrefix + k)}'").mkString(", ")
        spark.sql(s"ALTER TABLE $id UNSET TBLPROPERTIES IF EXISTS ($keys)")
      }
      if (tags.nonEmpty) {
        val assignments = tags.toSeq.sortBy(_._1).map { case (k, v) =>
          s"'${quoteLiteral(tagPrefix + k)}'='${quoteLiteral(v)}'"
        }.mkString(", ")
        spark.sql(s"ALTER TABLE $id SET TBLPROPERTIES ($assignments)")
      }
    }

  /** Linker wired to the session catalog with the default resolvers —
    * the `build_linker_from_config` convenience shape. */
  def forSpark(spark: SparkSession,
               contractLoader: Option[ContractLoader] = None,
               datasetPrefix: String = "table:",
               staticProperties: Map[String, String] = Map.empty,
               staticTags: Map[String, String] = Map.empty,
               tagsEnabled: Boolean = false,
               skipTables: Seq[String] = Nil,
               onWarn: String => Unit = _ => ()): CatalogLinker =
    new CatalogLinker(
      applyTableProperties = Some(sparkTablePropertyUpdater(spark)),
      applyTableTags = if (tagsEnabled) Some(sparkTableTagUpdater(spark)) else None,
      tableResolver = prefixTableResolver(datasetPrefix),
      contractLoader = contractLoader,
      contractTableResolver = Some(contractServersTableResolver),
      staticProperties = staticProperties,
      staticTags = staticTags,
      skipTables = skipTables.flatMap(normaliseTableIdentifier).toSet,
      onWarn = onWarn)
}

/** See [[CatalogLinker$]]. Field-for-field the reference's
  * `UnityCatalogLinker` dataclass (`unity_catalog.py:215-227`). */
final class CatalogLinker(
    val applyTableProperties: Option[CatalogLinker.TablePropertyUpdater] = None,
    val applyTableTags: Option[CatalogLinker.TableTagUpdater] = None,
    val tableResolver: CatalogLinker.DatasetToTable = CatalogLinker.prefixTableResolver(),
    val contractLoader: Option[CatalogLinker.ContractLoader] = None,
    val contractTableResolver: Option[CatalogLinker.ContractTableResolver] = None,
    val metadataProvider: CatalogLinker.MetadataProvider = CatalogLinker.defaultMetadata,
    val staticProperties: Map[String, String] = Map.empty,
    val staticTags: Map[String, String] = Map.empty,
    val skipTables: Set[String] = Set.empty,
    val onWarn: String => Unit = _ => ()) {

  import CatalogLinker._

  /** Resolve the affected tables and stamp them (reference
    * `link_dataset_contract`, `unity_catalog.py:229-311`): contract
    * `servers` targets win; the dataset-prefix resolver is the fallback;
    * skip-tables are never touched; each table's update failure warns
    * individually and the rest proceed. */
  def linkDatasetContract(datasetId: String, datasetVersion: String,
                          contractId: String, contractVersion: String): Unit = {
    val contract = contractLoader.flatMap { load =>
      try load(contractId, contractVersion)
      catch {
        case scala.util.control.NonFatal(e) =>
          onWarn(s"could not load contract '$contractId:$contractVersion': ${e.getMessage}")
          None
      }
    }

    val targets = Seq.newBuilder[String]
    val seen = scala.collection.mutable.Set.empty[String]
    def addTable(table: String): Unit =
      normaliseTableIdentifier(table).foreach { canonical =>
        if (skipTables(canonical))
          onWarn(s"catalog sync skipped reserved table '$table'")
        else if (seen.add(canonical)) targets += table
      }

    for (c <- contract; resolve <- contractTableResolver; t <- resolve(c)) addTable(t)
    val resolved = targets.result()
    val finalTargets =
      if (resolved.nonEmpty) resolved
      else {
        tableResolver(datasetId).foreach(addTable)
        targets.result()
      }
    if (finalTargets.isEmpty) return

    val metadata = metadataProvider(datasetId, datasetVersion, contractId, contractVersion)
    val properties = buildProperties(metadata, staticProperties, onWarn)
    val (tags, tagKeys) = applyTableTags match {
      case Some(_) => buildTags(metadata, staticTags, onWarn)
      case None    => (Map.empty[String, String], Set.empty[String])
    }

    for (table <- finalTargets) {
      for (apply <- applyTableProperties if properties.nonEmpty)
        try apply(table, properties)
        catch {
          case scala.util.control.NonFatal(e) =>
            onWarn(s"catalog property sync failed for '$table': ${e.getMessage}")
        }
      for (apply <- applyTableTags) {
        val unset: Seq[String] =
          if (tags.isEmpty && tagKeys.nonEmpty) tagKeys.toSeq.sorted else Nil
        try apply(table, tags, unset)
        catch {
          case scala.util.control.NonFatal(e) =>
            onWarn(s"catalog tag sync failed for '$table': ${e.getMessage}")
        }
      }
    }
  }
}
