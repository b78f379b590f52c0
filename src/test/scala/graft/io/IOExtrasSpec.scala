package graft.io

import graft.{DemoContracts, SparkSpec}
import graft.contracts._
import graft.strategies.StrictStrategy

class LocatorsSpec extends SparkSpec {
  test("static and contract-first resolution") {
    val st = StaticDatasetLocator(DatasetResolution(path = Some("/x/y"), format = Some("json")))
    assert(st.forRead("any", None).path.contains("/x/y"))
    val cf = ContractFirstDatasetLocator("/data")
    assert(cf.forWrite("sales.orders", None).path.contains("/data/sales.orders"))
    val withProps = DemoContracts.orders.copy(customProperties = Map("path" -> "/lake/orders", "format" -> "delta"))
    val r = cf.forRead("sales.orders", Some(withProps))
    assert(r.path.contains("/lake/orders") && r.format.contains("delta"))
    val withTable = DemoContracts.orders.copy(customProperties = Map("table" -> "gold.orders"))
    val t = cf.forRead("sales.orders", Some(withTable))
    assert(t.table.contains("gold.orders") && t.path.isEmpty)
  }

  test("version locator: write to version folder, read resolves semver-latest") {
    val base = tmpDir("graft_loc")
    val loc = ContractVersionLocator(spark, base)
    import spark.implicits._
    for (v <- Seq("1.0.0", "1.2.0", "1.10.0"))
      Seq(v).toDF("v").write.parquet(loc.forWrite("d", None, Some(v)).path.get)
    assert(loc.latestVersion("d").contains("1.10.0"))
    assert(loc.forRead("d", None).path.get.endsWith("/d/1.10.0"))
    assert(loc.forRead("d", None, Some("1.2.0")).path.get.endsWith("/d/1.2.0"))
    intercept[IllegalArgumentException](loc.forRead("nope", None))
  }
}

class MergeIOSpec extends SparkSpec {
  import spark.implicits._

  private val contract = Contract(id = "t.merge", version = "1.0.0",
    schema = Seq(SchemaObjectDef("t", Seq(
      FieldDef("id", Some("bigint"), required = true),
      FieldDef("v", Some("string"), required = true)))))

  test("upsert: insert-new + update-existing via key merge, snapshot swapped") {
    val path = tmpDir("graft_merge") + "/data"
    MergeIO.upsert(Seq((1L, "a"), (2L, "b")).toDF("id", "v"), path, contract, Seq("id"))
    MergeIO.upsert(Seq((2L, "B"), (3L, "c")).toDF("id", "v"), path, contract, Seq("id"))
    val out = spark.read.parquet(path).as[(Long, String)].collect().toMap
    assert(out == Map(1L -> "a", 2L -> "B", 3L -> "c"))
    // no staging/old directories left behind
    assert(!new java.io.File(path + "__staging").exists())
    assert(!new java.io.File(path + "__old").exists())
  }

  test("upsert recovers a crash between the two swap renames") {
    val path = tmpDir("graft_merge_crash") + "/data"
    MergeIO.upsert(Seq((1L, "a"), (2L, "b")).toDF("id", "v"), path, contract, Seq("id"))
    // simulate dying after rename(target -> __old): dataset only under __old
    assert(new java.io.File(path).renameTo(new java.io.File(path + "__old")))
    assert(!new java.io.File(path).exists())
    // next upsert must first restore __old -> target, then merge against it
    MergeIO.upsert(Seq((2L, "B")).toDF("id", "v"), path, contract, Seq("id"))
    val out = spark.read.parquet(path).as[(Long, String)].collect().toMap
    assert(out == Map(1L -> "a", 2L -> "B"), s"recovered merge lost rows: $out")
    assert(!new java.io.File(path + "__old").exists())
  }

  test("upsert with Strict aborts and leaves the target untouched") {
    val path = tmpDir("graft_merge_strict") + "/data"
    MergeIO.upsert(Seq((1L, "a")).toDF("id", "v"), path, contract, Seq("id"))
    val broken = Seq((java.lang.Long.valueOf(2L), null: String)).toDF("id", "v")
    intercept[IllegalStateException] {
      MergeIO.upsert(broken, path, contract, Seq("id"), strategy = StrictStrategy())
    }
    assert(spark.read.parquet(path).count() == 1)
  }
}

class StoresSpec extends SparkSpec {
  private def roundtrip(store: ContractStore): Unit = {
    store.put(DemoContracts.orders.copy(version = "1.0.0"))
    store.put(DemoContracts.orders.copy(version = "1.1.0"))
    store.put(DemoContracts.lineitem)
    assert(store.get("sales.orders", "1.0.0").map(_.version).contains("1.0.0"))
    assert(store.listVersions("sales.orders") == Seq("1.0.0", "1.1.0"))
    assert(store.listContractIds() == Seq("sales.lineitem", "sales.orders"))
    assert(store.latest("sales.orders").map(_.version).contains("1.1.0"))
    // re-put supersedes
    val renamed = DemoContracts.orders.copy(version = "1.1.0", name = Some("orders-v2"))
    store.put(renamed)
    assert(store.get("sales.orders", "1.1.0").flatMap(_.name).contains("orders-v2"))
  }

  test("JdbcContractStore on embedded Derby round-trips contracts") {
    val dir = tmpDir("graft_derby")
    roundtrip(new JdbcContractStore(s"jdbc:derby:$dir/db;create=true"))
  }

  test("SparkTableContractStore round-trips contracts on parquet") {
    roundtrip(new SparkTableContractStore(spark, tmpDir("graft_tbl_store") + "/contracts"))
  }
}

class MergeSplitSpec extends SparkSpec {
  import spark.implicits._
  import graft.contracts.{Contract, FieldDef, QualityRule, SchemaObjectDef}
  import graft.strategies.SplitStrategy

  test("upsert with SplitStrategy merges only valid rows and quarantines the rest") {
    val c = Contract(id = "t.msplit", version = "1.0.0",
      schema = Seq(SchemaObjectDef("t", Seq(
        FieldDef("id", Some("bigint"), required = true),
        FieldDef("v", Some("double"),
          quality = Seq(QualityRule(mustBeGreaterThan = Some(BigDecimal(0)))))))))
    val path = tmpDir("graft_merge_split") + "/data"
    MergeIO.upsert(Seq((1L, 5.0)).toDF("id", "v"), path, c, Seq("id"))
    val res = MergeIO.upsert(Seq((2L, 3.0), (3L, -7.0)).toDF("id", "v"), path, c,
      Seq("id"), strategy = SplitStrategy())
    val merged = spark.read.parquet(path).as[(Long, Double)].collect().toMap
    assert(merged == Map(1L -> 5.0, 2L -> 3.0)) // invalid row 3 NOT merged
    assert(res.writtenPaths.exists(_.endsWith("_reject")))
    val rejected = spark.read.parquet(res.writtenPaths.find(_.endsWith("_reject")).get)
      .as[(Long, Double)].collect().toSeq
    assert(rejected == Seq((3L, -7.0)))
  }
}

class MergeSplitEdgeSpec extends SparkSpec {
  import spark.implicits._
  import graft.contracts.{Contract, FieldDef, QualityRule, SchemaObjectDef}
  import graft.strategies.SplitStrategy

  private val c = Contract(id = "t.msplit2", version = "1.0.0",
    schema = Seq(SchemaObjectDef("t", Seq(
      FieldDef("id", Some("bigint"), required = true),
      FieldDef("v", Some("double"),
        quality = Seq(QualityRule(mustBeGreaterThan = Some(BigDecimal(0)))))))))

  test("custom validSuffix still routes only the valid subset into the merge") {
    val path = tmpDir("graft_ms_suffix") + "/data"
    MergeIO.upsert(Seq((1L, 5.0)).toDF("id", "v"), path, c, Seq("id"))
    MergeIO.upsert(Seq((2L, 3.0), (3L, -7.0)).toDF("id", "v"), path, c,
      Seq("id"), strategy = SplitStrategy(validSuffix = "clean", rejectSuffix = "bad"))
    val merged = spark.read.parquet(path).as[(Long, Double)].collect().toMap
    assert(merged == Map(1L -> 5.0, 2L -> 3.0))
    assert(spark.read.parquet(path + "_bad").count() == 1)
  }

  test("includeValid=false quarantines without touching the target; rejects accumulate") {
    val path = tmpDir("graft_ms_noval") + "/data"
    MergeIO.upsert(Seq((1L, 5.0)).toDF("id", "v"), path, c, Seq("id"))
    val strat = SplitStrategy(includeValid = false)
    MergeIO.upsert(Seq((2L, -1.0)).toDF("id", "v"), path, c, Seq("id"), strategy = strat)
    MergeIO.upsert(Seq((3L, -2.0)).toDF("id", "v"), path, c, Seq("id"), strategy = strat)
    assert(spark.read.parquet(path).as[(Long, Double)].collect().toMap == Map(1L -> 5.0))
    assert(spark.read.parquet(path + "_reject").count() == 2) // append across upserts
  }
}

class ProfilerLargeValuesSpec extends SparkSpec {
  import spark.implicits._

  test("stats-draft bounds survive epoch-micros magnitudes and dotted names") {
    val df = Seq((1.7e15, 2.0), (1.5e15, 3.0)).toDF("event.ts_us", "v")
    val draft = graft.draft.Drafter.fromDataFrameWithStats(df, "t.big")
    val res = graft.quality.Evaluator.validate(df, draft)
    assert(res.ok, res.errors.mkString("; ")) // bounds not clamped/inverted
    val ub = draft.properties.find(_.name == "event.ts_us").get
      .quality.flatMap(_.mustBeLessOrEqualTo).head
    assert(ub > BigDecimal(1.7e15))
  }
}
