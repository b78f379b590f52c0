package graft.governance

import graft.SparkSpec
import graft.contracts.{Contract, FsContractStore, ServerDef}

class CatalogLinkerSpec extends SparkSpec {

  import CatalogLinker._

  private def tableProps(table: String): Map[String, String] = {
    import spark.implicits._
    spark.sql(s"SHOW TBLPROPERTIES $table").as[(String, String)].collect().toMap
  }

  test("linking stamps contract provenance onto the session-catalog table") {
    spark.sql("CREATE TABLE cl_orders (i INT) USING parquet")
    try {
      val linker = CatalogLinker.forSpark(spark)
      linker.linkDatasetContract("table:cl_orders", "2026-01-01", "sales.orders", "1.2.0")
      val props = tableProps("cl_orders")
      assert(props("dc43.contract_id") == "sales.orders")
      assert(props("dc43.contract_version") == "1.2.0")
      assert(props("dc43.dataset_version") == "2026-01-01")
    } finally spark.sql("DROP TABLE IF EXISTS cl_orders")
  }

  test("contract servers resolve targets ahead of the prefix resolver; dedup case-insensitively") {
    val c = Contract(id = "c.srv", version = "1.0.0", servers = Seq(
      ServerDef(catalog = Some("spark_catalog"), schemaName = Some("default"),
        dataset = Some("cl_srv")),
      ServerDef(dataset = Some("SPARK_CATALOG.default.cl_srv")), // dup, other case
      ServerDef(path = Some("/data/file.parquet"))))             // no dataset → skipped
    assert(contractServersTableResolver(c)
      == Seq("spark_catalog.default.cl_srv"))

    spark.sql("CREATE TABLE cl_srv (i INT) USING parquet")
    try {
      val linker = CatalogLinker.forSpark(spark,
        contractLoader = Some((_, _) => Some(c)))
      // dataset id does NOT carry the table: prefix — servers supply targets
      linker.linkDatasetContract("files:/data/x", "v1", "c.srv", "1.0.0")
      assert(tableProps("cl_srv")("dc43.contract_id") == "c.srv")
    } finally spark.sql("DROP TABLE IF EXISTS cl_srv")
  }

  test("non-table datasets resolve to no target; skip-tables are never touched") {
    val applied = scala.collection.mutable.Buffer.empty[String]
    val warns = scala.collection.mutable.Buffer.empty[String]
    val linker = new CatalogLinker(
      applyTableProperties = Some((t, _) => applied += t),
      skipTables = Set("default.reserved"),
      onWarn = warns += _)
    linker.linkDatasetContract("files:/data/x", "v1", "c", "1.0.0")
    assert(applied.isEmpty)
    linker.linkDatasetContract("table:default.reserved", "v1", "c", "1.0.0")
    assert(applied.isEmpty && warns.exists(_.contains("skipped reserved table")))
    linker.linkDatasetContract("table:default.ok", "v1", "c", "1.0.0")
    assert(applied == Seq("default.ok"))
  }

  test("reserved property keys are dropped with a warning; static extras merge under metadata") {
    val warns = scala.collection.mutable.Buffer.empty[String]
    val props = buildProperties(
      Map("dc43.contract_id" -> "c", "Owner" -> "me"),
      Map("team" -> "data", "dc43.contract_id" -> "static-loses"),
      warns += _)
    assert(props == Map("dc43.contract_id" -> "c", "team" -> "data"))
    assert(warns.exists(_.contains("reserved")))
  }

  test("tag keys normalise reserved characters; tag lifecycle sets and unsets") {
    val warns = scala.collection.mutable.Buffer.empty[String]
    val (tags, keys) = buildTags(
      Map("dc43.contract_id" -> "c"), Map("pii/scope" -> "none"), warns += _)
    assert(tags == Map("dc43_contract_id" -> "c", "pii_scope" -> "none"))
    assert(keys == Set("dc43_contract_id", "pii_scope"))
    assert(warns.count(_.contains("reserved characters")) == 2)

    spark.sql("CREATE TABLE cl_tags (i INT) USING parquet")
    try {
      val update = sparkTableTagUpdater(spark)
      update("cl_tags", Map("scope" -> "none"), Nil)
      assert(tableProps("cl_tags")("dc43.tag.scope") == "none")
      update("cl_tags", Map.empty, Seq("scope"))
      assert(!tableProps("cl_tags").contains("dc43.tag.scope"))
      // unsetting an absent tag is harmless (IF EXISTS)
      update("cl_tags", Map.empty, Seq("never_set"))
    } finally spark.sql("DROP TABLE IF EXISTS cl_tags")
  }

  test("updater failures warn per-table and do not abort the remaining targets") {
    val applied = scala.collection.mutable.Buffer.empty[String]
    val warns = scala.collection.mutable.Buffer.empty[String]
    val c = Contract(id = "c.multi", version = "1.0.0", servers = Seq(
      ServerDef(dataset = Some("bad_table")), ServerDef(dataset = Some("good_table"))))
    val linker = new CatalogLinker(
      applyTableProperties = Some((t, _) =>
        if (t == "bad_table") sys.error("boom") else applied += t),
      contractLoader = Some((_, _) => Some(c)),
      contractTableResolver = Some(contractServersTableResolver),
      onWarn = warns += _)
    linker.linkDatasetContract("ds", "v1", "c.multi", "1.0.0")
    assert(applied == Seq("good_table"))
    assert(warns.exists(w => w.contains("bad_table") && w.contains("failed")))
  }

  test("GovernanceBackend link hooks fire with the dataset version after the link persists") {
    val fired = scala.collection.mutable.Buffer.empty[(String, String, String, String)]
    val be = new GovernanceBackend(tmpDir("graft_cl_gov"),
      Some(new FsContractStore(tmpDir("graft_cl_store"))))
    be.addLinkHook((d, dv, c, cv) => fired += ((d, dv, c, cv)))
    be.linkDatasetContract("table:t1", "c.x", "1.0.0", "2026-02-02")
    assert(be.linkedContract("table:t1").contains(("c.x", "1.0.0")))
    assert(fired == Seq(("table:t1", "2026-02-02", "c.x", "1.0.0")))
    // datasetVersion defaults to empty for legacy callers
    be.linkDatasetContract("table:t2", "c.x", "1.0.0")
    assert(fired.last == (("table:t2", "", "c.x", "1.0.0")))
  }

  test("identifier quoting survives backticks and rejects empties") {
    assert(quoteIdentifier("cat.sch.tab") == "`cat`.`sch`.`tab`")
    assert(quoteIdentifier("we`ird") == "`we``ird`")
    intercept[IllegalArgumentException](quoteIdentifier(" . "))
  }
}
