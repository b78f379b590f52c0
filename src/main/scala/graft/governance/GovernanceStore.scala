package graft.governance

import java.nio.file.{Files, Paths}

/** Storage primitives behind [[GovernanceBackend]] — the pluggable-store
  * seam of the reference's governance backends (`governance/backend/
  * stores/sql.py:1-593`, `stores/delta.py:1-692`, filesystem default in
  * `backend/local.py`). Three record families, all driver-side metadata
  * (verdicts and links, never data):
  *
  *  - status: one JSON document per (dataset id, dataset version),
  *    overwrite-on-re-record;
  *  - links:  one (contract id, contract version) pair per dataset id,
  *    overwrite-on-relink;
  *  - activity: an append-only log of JSON lines per dataset id.
  *
  * Keys are the RAW ids — any escaping a medium needs (sanitised
  * filenames, SQL parameters) is the implementation's business. Per-id
  * readers may over-return records of OTHER ids when the medium cannot
  * key exactly (the filesystem store's sanitised-filename collisions);
  * the backend re-filters on the authoritative ids inside each payload,
  * so implementations should err on returning more, never less. */
trait GovernanceStore {
  def putStatus(datasetId: String, datasetVersion: String, json: String): Unit
  def getStatus(datasetId: String, datasetVersion: String): Option[String]
  /** Every status payload, deterministically ordered. */
  def listStatuses(): Seq[String]
  /** Status payloads of one dataset (may over-return; backend re-filters). */
  def statusesFor(datasetId: String): Seq[String] = listStatuses()

  def putLink(datasetId: String, contractId: String, contractVersion: String): Unit
  def getLink(datasetId: String): Option[(String, String)]
  /** Every dataset id holding a link record (ids recoverable from
    * payloads only — see the filesystem store's legacy format). */
  def linkedDatasetIds(): Seq[String]

  def appendActivity(datasetId: String, jsonLine: String): Unit
  /** One dataset's activity lines in append order (may over-return). */
  def activityLines(datasetId: String): Seq[String]
  /** Every activity line across all datasets, in per-dataset append
    * order (for id discovery; ids live inside the payloads). */
  def allActivityLines(): Seq[String]
}

/** Filesystem store — the reference's local backend layout
  * (`governance/backend/local.py:129`): `status/<safe(id@ver)>.json`,
  * `links/<safe(id)>.txt`, `activity/<safe(id)>.jsonl` under one root.
  * Filenames are sanitised, so distinct raw ids can COLLIDE onto one
  * file ("a/b" and "a:b" both map to "a_b"); link files therefore carry
  * the raw id in the payload and hold several records when collided, and
  * per-id readers over-return the whole collided file (the backend
  * re-filters). Legacy link formats (2-line link+id, pre-r4 one-line
  * link-only) remain readable; a one-line file's id is unrecoverable. */
final class FsGovernanceStore(rootDir: String) extends GovernanceStore {

  private val root = Paths.get(rootDir)
  Files.createDirectories(root.resolve("status"))
  Files.createDirectories(root.resolve("links"))
  Files.createDirectories(root.resolve("activity"))
  private def safe(s: String) = s.replaceAll("[^A-Za-z0-9._-]", "_")

  private def listDir(sub: String): Seq[java.nio.file.Path] =
    scala.util.Using.resource(Files.list(root.resolve(sub))) { s =>
      import scala.jdk.CollectionConverters._
      s.iterator().asScala.toSeq.sortBy(_.getFileName.toString)
    }

  override def putStatus(datasetId: String, datasetVersion: String, json: String): Unit =
    Files.writeString(
      root.resolve("status").resolve(safe(s"$datasetId@$datasetVersion") + ".json"), json)

  override def getStatus(datasetId: String, datasetVersion: String): Option[String] = {
    val f = root.resolve("status").resolve(safe(s"$datasetId@$datasetVersion") + ".json")
    if (!Files.exists(f)) None else Some(Files.readString(f))
  }

  override def listStatuses(): Seq[String] =
    listDir("status").map(Files.readString(_))

  /** Filenames are safe("<id>@<version>") and sanitisation is per-char,
    * so every record of this dataset starts with safe(id) + "_" — the
    * prefix prunes unrelated files before any parse; prefix COLLISIONS
    * (two ids sanitising alike) over-return and the backend's payload
    * check arbitrates. */
  override def statusesFor(datasetId: String): Seq[String] = {
    val prefix = safe(datasetId) + "_"
    listDir("status")
      .filter(_.getFileName.toString.startsWith(prefix))
      .map(Files.readString(_))
  }

  // One record per line: "contractId:contractVersion\tdatasetId". The raw
  // id rides in the payload because filenames are sanitised, and one file
  // can hold SEVERAL records when sanitisation collides distinct ids —
  // a per-id rewrite must not drop the other id's link.
  private def parseLinks(text: String): Seq[(Option[String], String, String)] = {
    val lines = text.linesIterator.toSeq.filter(_.nonEmpty)
    if (lines.exists(_.contains('\t')))
      lines.flatMap { l =>
        l.split("\t", 2) match {
          case Array(link, id) => link.split(":", 2) match {
            case Array(c, v) => Some((Some(id), c, v))
            case _           => None
          }
          case _ => None
        }
      }
    else
      lines.headOption.toSeq.flatMap(_.split(":", 2) match {
        case Array(c, v) => Some((lines.drop(1).headOption, c, v))
        case _           => None
      })
  }

  override def putLink(datasetId: String, contractId: String, contractVersion: String): Unit = {
    val f = root.resolve("links").resolve(safe(datasetId) + ".txt")
    val existing = if (Files.exists(f)) parseLinks(Files.readString(f)) else Nil
    // a legacy no-id record shares this sanitised filename, so the new
    // write for that name supersedes it (forall: None is replaced too)
    val kept = existing.filterNot { case (id, _, _) => id.forall(_ == datasetId) }
    val all = kept :+ ((Option(datasetId), contractId, contractVersion))
    Files.writeString(f,
      all.map { case (id, c, v) => s"$c:$v\t${id.getOrElse("")}" }.mkString("\n"))
  }

  override def getLink(datasetId: String): Option[(String, String)] = {
    val f = root.resolve("links").resolve(safe(datasetId) + ".txt")
    if (!Files.exists(f)) None
    else {
      val recs = parseLinks(Files.readString(f))
      recs.collectFirst { case (Some(`datasetId`), c, v) => (c, v) }
        .orElse(recs.collectFirst { case (None, c, v) => (c, v) })
    }
  }

  // pre-r4 one-line link files carry no recoverable id — such datasets
  // surface only via their status or activity records. Every record's id
  // is scanned: a collided links file holds several.
  override def linkedDatasetIds(): Seq[String] =
    listDir("links").flatMap(f =>
      parseLinks(Files.readString(f)).flatMap { case (id, _, _) => id })

  override def appendActivity(datasetId: String, jsonLine: String): Unit =
    Files.writeString(
      root.resolve("activity").resolve(safe(datasetId) + ".jsonl"),
      jsonLine + "\n",
      java.nio.file.StandardOpenOption.CREATE, java.nio.file.StandardOpenOption.APPEND)

  override def activityLines(datasetId: String): Seq[String] = {
    val f = root.resolve("activity").resolve(safe(datasetId) + ".jsonl")
    if (!Files.exists(f)) Nil
    else Files.readString(f).linesIterator.filter(_.nonEmpty).toSeq
  }

  override def allActivityLines(): Seq[String] =
    listDir("activity").flatMap(f =>
      Files.readString(f).linesIterator.filter(_.nonEmpty).toSeq)
}
