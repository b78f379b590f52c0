package graft.governance

import java.sql.{Connection, DriverManager}

/** SQL-backed governance store over plain JDBC — the twin of the
  * reference's `SQLGovernanceStore` (`governance/backend/stores/
  * sql.py:1-593`), bringing the governance side to parity with
  * [[graft.contracts.JdbcContractStore]]. Three tables under one prefix:
  * `<p>_status` keyed (dataset_id, dataset_version) with the JSON
  * payload, `<p>_links` keyed dataset_id, `<p>_activity` an append-only
  * log ordered by an identity column. Keys are raw ids (no sanitisation
  * — SQL parameters escape), so per-id reads are exact, never
  * over-returning. Works against any JDBC URL; Derby embedded
  * (`jdbc:derby:<dir>;create=true`) ships with Spark. */
final class JdbcGovernanceStore(url: String, prefix: String = "governance")
    extends GovernanceStore {

  require(prefix.matches("[A-Za-z_][A-Za-z0-9_]*"), s"invalid table prefix: $prefix")
  private val statusT = s"${prefix}_status"
  private val linksT = s"${prefix}_links"
  private val activityT = s"${prefix}_activity"

  private def withConn[A](f: Connection => A): A = {
    val c = DriverManager.getConnection(url)
    try f(c) finally c.close()
  }

  // create-if-missing; Derby has no IF NOT EXISTS, so swallow "table
  // exists" (X0Y32) per statement — the JdbcContractStore discipline
  private def ensure(ddl: String): Unit = withConn { c =>
    try { c.createStatement().executeUpdate(ddl); () } catch {
      case e: java.sql.SQLException if e.getSQLState == "X0Y32" => // exists
    }
  }
  ensure(
    s"""CREATE TABLE $statusT (
       |  dataset_id VARCHAR(255) NOT NULL,
       |  dataset_version VARCHAR(255) NOT NULL,
       |  payload CLOB NOT NULL,
       |  PRIMARY KEY (dataset_id, dataset_version))""".stripMargin)
  ensure(
    s"""CREATE TABLE $linksT (
       |  dataset_id VARCHAR(255) NOT NULL,
       |  contract_id VARCHAR(255) NOT NULL,
       |  contract_version VARCHAR(128) NOT NULL,
       |  PRIMARY KEY (dataset_id))""".stripMargin)
  ensure(
    s"""CREATE TABLE $activityT (
       |  seq BIGINT GENERATED ALWAYS AS IDENTITY,
       |  dataset_id VARCHAR(255) NOT NULL,
       |  payload CLOB NOT NULL,
       |  PRIMARY KEY (seq))""".stripMargin)

  // delete+insert as ONE transaction (upsert without dialect-specific
  // MERGE): a concurrent reader never observes the key missing
  // mid-replace, and a crash between the statements rolls back
  private def upsert(table: String, keyCols: Seq[(String, String)],
                     valCols: Seq[(String, String)]): Unit = withConn { c =>
    c.setAutoCommit(false)
    try {
      val del = c.prepareStatement(
        s"DELETE FROM $table WHERE " + keyCols.map(_._1 + " = ?").mkString(" AND "))
      keyCols.zipWithIndex.foreach { case ((_, v), i) => del.setString(i + 1, v) }
      del.executeUpdate()
      val cols = keyCols ++ valCols
      val ins = c.prepareStatement(
        s"INSERT INTO $table (" + cols.map(_._1).mkString(", ") + ") VALUES (" +
          cols.map(_ => "?").mkString(", ") + ")")
      cols.zipWithIndex.foreach { case ((_, v), i) => ins.setString(i + 1, v) }
      ins.executeUpdate()
      c.commit()
    } catch {
      case e: Throwable =>
        try c.rollback() catch { case _: java.sql.SQLException => }
        throw e
    }
  }

  private def queryStrings(sql: String, params: String*): Seq[String] = withConn { c =>
    val st = c.prepareStatement(sql)
    params.zipWithIndex.foreach { case (p, i) => st.setString(i + 1, p) }
    val rs = st.executeQuery()
    val out = Seq.newBuilder[String]
    while (rs.next()) out += rs.getString(1)
    out.result()
  }

  override def putStatus(datasetId: String, datasetVersion: String, json: String): Unit =
    upsert(statusT,
      Seq("dataset_id" -> datasetId, "dataset_version" -> datasetVersion),
      Seq("payload" -> json))

  override def getStatus(datasetId: String, datasetVersion: String): Option[String] =
    queryStrings(
      s"SELECT payload FROM $statusT WHERE dataset_id = ? AND dataset_version = ?",
      datasetId, datasetVersion).headOption

  override def listStatuses(): Seq[String] =
    queryStrings(s"SELECT payload FROM $statusT ORDER BY dataset_id, dataset_version")

  override def statusesFor(datasetId: String): Seq[String] =
    queryStrings(
      s"SELECT payload FROM $statusT WHERE dataset_id = ? ORDER BY dataset_version",
      datasetId)

  override def putLink(datasetId: String, contractId: String, contractVersion: String): Unit =
    upsert(linksT, Seq("dataset_id" -> datasetId),
      Seq("contract_id" -> contractId, "contract_version" -> contractVersion))

  override def getLink(datasetId: String): Option[(String, String)] = withConn { c =>
    val st = c.prepareStatement(
      s"SELECT contract_id, contract_version FROM $linksT WHERE dataset_id = ?")
    st.setString(1, datasetId)
    val rs = st.executeQuery()
    if (rs.next()) Some((rs.getString(1), rs.getString(2))) else None
  }

  override def linkedDatasetIds(): Seq[String] =
    queryStrings(s"SELECT dataset_id FROM $linksT ORDER BY dataset_id")

  override def appendActivity(datasetId: String, jsonLine: String): Unit = withConn { c =>
    val st = c.prepareStatement(
      s"INSERT INTO $activityT (dataset_id, payload) VALUES (?, ?)")
    st.setString(1, datasetId); st.setString(2, jsonLine)
    st.executeUpdate()
  }

  override def activityLines(datasetId: String): Seq[String] =
    queryStrings(
      s"SELECT payload FROM $activityT WHERE dataset_id = ? ORDER BY seq", datasetId)

  override def allActivityLines(): Seq[String] =
    queryStrings(s"SELECT payload FROM $activityT ORDER BY dataset_id, seq")
}
