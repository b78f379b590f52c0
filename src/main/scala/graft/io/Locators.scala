package graft.io

import graft.contracts.{Contract, SemVer}
import org.apache.spark.sql.SparkSession

/** Where a dataset id resolves to: a path or a table, plus format/options.
  * Lean twin of the reference's `DatasetResolution`
  * (`spark/io/locators.py:63-584`). */
final case class DatasetResolution(
    path: Option[String] = None,
    table: Option[String] = None,
    format: Option[String] = None,
    options: Map[String, String] = Map.empty)

/** Resolves dataset ids to concrete read/write locations. */
trait DatasetLocator {
  def forRead(datasetId: String, contract: Option[Contract],
              version: Option[String] = None): DatasetResolution
  def forWrite(datasetId: String, contract: Option[Contract],
               version: Option[String] = None): DatasetResolution
}

/** Fixed location regardless of contract (reference `StaticDatasetLocator`). */
final case class StaticDatasetLocator(resolution: DatasetResolution) extends DatasetLocator {
  def forRead(id: String, c: Option[Contract], v: Option[String]): DatasetResolution = resolution
  def forWrite(id: String, c: Option[Contract], v: Option[String]): DatasetResolution = resolution
}

/** Contract-first resolution (reference `ContractFirstDatasetLocator`):
  * the contract's custom properties (`path`, `table`, `format`) win,
  * falling back to `<root>/<dataset-id>`. */
final case class ContractFirstDatasetLocator(root: String, defaultFormat: String = "parquet")
    extends DatasetLocator {
  private def resolve(id: String, contract: Option[Contract]): DatasetResolution = {
    val props = contract.map(_.customProperties).getOrElse(Map.empty)
    DatasetResolution(
      path = props.get("path").orElse(
        if (props.contains("table")) None
        else Some(s"${root.stripSuffix("/")}/${id.replaceAll("[^A-Za-z0-9._-]", "_")}")),
      table = props.get("table"),
      format = props.get("format").orElse(Some(defaultFormat)))
  }
  def forRead(id: String, c: Option[Contract], v: Option[String]): DatasetResolution = resolve(id, c)
  def forWrite(id: String, c: Option[Contract], v: Option[String]): DatasetResolution = resolve(id, c)
}

/** Versioned-folder resolution (`<base>/<id>/<version>/`, reference
  * `ContractVersionLocator`): writes go to an explicit version folder;
  * reads resolve "latest" by SemVer over the existing subfolders. */
final case class ContractVersionLocator(
    spark: SparkSession, base: String, defaultFormat: String = "parquet")
    extends DatasetLocator {

  private def dir(id: String) =
    s"${base.stripSuffix("/")}/${id.replaceAll("[^A-Za-z0-9._-]", "_")}"

  /** SemVer-latest version folder under the dataset dir, if any. */
  def latestVersion(id: String): Option[String] = {
    val p = new org.apache.hadoop.fs.Path(dir(id))
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) None
    else fs.listStatus(p).toSeq.filter(_.isDirectory)
      .map(_.getPath.getName)
      .flatMap(n => SemVer.tryParse(n).map(_ -> n))
      .sortBy(_._1).lastOption.map(_._2)
  }

  def forRead(id: String, c: Option[Contract], v: Option[String]): DatasetResolution = {
    val version = v.filter(_ != "latest").orElse(latestVersion(id))
      .getOrElse(throw new IllegalArgumentException(s"no versions found for dataset $id under $base"))
    DatasetResolution(path = Some(s"${dir(id)}/$version"), format = Some(defaultFormat))
  }

  def forWrite(id: String, c: Option[Contract], v: Option[String]): DatasetResolution = {
    val version = v.orElse(c.map(_.version)).getOrElse("0.1.0")
    DatasetResolution(path = Some(s"${dir(id)}/$version"), format = Some(defaultFormat))
  }
}
