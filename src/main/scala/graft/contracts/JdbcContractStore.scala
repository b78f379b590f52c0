package graft.contracts

import java.sql.{Connection, DriverManager}

/** SQL-backed contract store over plain JDBC — the twin of the reference's
  * `SQLContractStore` (`contracts/backend/stores/sql.py:30`): one row per
  * (contract_id, version) with the ODCS JSON body. Works against any JDBC
  * URL; Derby embedded (`jdbc:derby:<dir>;create=true`) ships with Spark.
  */
final class JdbcContractStore(url: String, table: String = "contracts") extends ContractStore {

  require(table.matches("[A-Za-z_][A-Za-z0-9_]*"), s"invalid table name: $table")

  private def withConn[A](f: Connection => A): A = {
    val c = DriverManager.getConnection(url)
    try f(c) finally c.close()
  }

  // create-if-missing; Derby has no IF NOT EXISTS, so swallow "table exists"
  withConn { c =>
    try {
      c.createStatement().executeUpdate(
        s"""CREATE TABLE $table (
           |  contract_id VARCHAR(255) NOT NULL,
           |  version VARCHAR(128) NOT NULL,
           |  body CLOB NOT NULL,
           |  PRIMARY KEY (contract_id, version))""".stripMargin)
    } catch {
      case e: java.sql.SQLException if e.getSQLState == "X0Y32" => // exists
    }
  }

  // delete+insert as ONE transaction: a concurrent reader can never observe
  // the version missing mid-replace, and a crash between the statements
  // rolls back instead of losing the previous body
  override def put(contract: Contract): Unit = withConn { c =>
    c.setAutoCommit(false)
    try {
      val del = c.prepareStatement(s"DELETE FROM $table WHERE contract_id = ? AND version = ?")
      del.setString(1, contract.id); del.setString(2, contract.version)
      del.executeUpdate()
      val ins = c.prepareStatement(s"INSERT INTO $table (contract_id, version, body) VALUES (?, ?, ?)")
      ins.setString(1, contract.id); ins.setString(2, contract.version)
      ins.setString(3, ContractJson.toJson(contract))
      ins.executeUpdate()
      c.commit()
    } catch {
      case e: Throwable =>
        try c.rollback() catch { case _: java.sql.SQLException => }
        throw e
    }
  }

  override def get(id: String, version: String): Option[Contract] = withConn { c =>
    val st = c.prepareStatement(s"SELECT body FROM $table WHERE contract_id = ? AND version = ?")
    st.setString(1, id); st.setString(2, version)
    val rs = st.executeQuery()
    if (rs.next()) Some(ContractJson.fromJson(rs.getString(1))) else None
  }

  override def listVersions(id: String): Seq[String] = withConn { c =>
    val st = c.prepareStatement(s"SELECT version FROM $table WHERE contract_id = ? ORDER BY version")
    st.setString(1, id)
    val rs = st.executeQuery()
    val out = Seq.newBuilder[String]
    while (rs.next()) out += rs.getString(1)
    out.result()
  }

  override def listContractIds(): Seq[String] = withConn { c =>
    val rs = c.createStatement().executeQuery(
      s"SELECT DISTINCT contract_id FROM $table ORDER BY contract_id")
    val out = Seq.newBuilder[String]
    while (rs.next()) out += rs.getString(1)
    out.result()
  }
}
