package graft.io

import graft.{DemoContracts, SparkSpec, T}
import graft.contracts._
import graft.strategies._

class ContractIOSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("governed write (NoOp): metrics ride the write via observe, no extra scan") {
    val df = T.load(spark, sf, "lineitem")
    val out = tmpDir("graft_w_noop")
    val res = ContractIO.write(df, out, DemoContracts.lineitem, mode = "overwrite")
    assert(res.writtenPaths == Seq(out))
    assert(res.validation.metrics("violations.gt_l_quantity").asInstanceOf[Long] > 0)
    assert(res.validation.metrics("row_count").asInstanceOf[Long] == df.count())
    assert(!res.validation.ok) // thresholds are genuinely violated by the data
    assert(spark.read.parquet(out).count() == df.count())
  }

  test("governed write (Split): valid/reject subsets under the target path") {
    val df = T.load(spark, sf, "lineitem")
    val out = tmpDir("graft_w_split")
    val res = ContractIO.write(df, out, DemoContracts.lineitem,
      mode = "overwrite", strategy = SplitStrategy())
    assert(res.writtenPaths.toSet == Set(s"$out/valid", s"$out/reject"))
    val nValid = spark.read.parquet(s"$out/valid").count()
    val nReject = spark.read.parquet(s"$out/reject").count()
    assert(nValid + nReject == df.count())
    assert(res.warnings.exists(_.contains("valid")))
  }

  test("governed write (Strict): aborts before writing anything") {
    val df = T.load(spark, sf, "lineitem")
    val out = tmpDir("graft_w_strict")
    val e = intercept[IllegalStateException] {
      ContractIO.write(df, out, DemoContracts.lineitem,
        mode = "overwrite", strategy = StrictStrategy())
    }
    assert(e.getMessage.contains("violations"))
    assert(!new java.io.File(s"$out/_SUCCESS").exists())
  }

  test("write validates the input frame: lossy auto-cast cannot mask a type mismatch") {
    // contract declares qty int; data is double — align would cast silently,
    // but validation must observe the pre-align frame and error
    val c = Contract(id = "t.w", version = "1.0.0",
      schema = Seq(SchemaObjectDef("t", Seq(
        FieldDef("id", Some("bigint"), required = true),
        FieldDef("qty", Some("int"), required = true)))))
    val df = Seq((1L, 2.7), (2L, 3.9)).toDF("id", "qty")
    val res = ContractIO.write(df, tmpDir("graft_w_cast"), c, mode = "overwrite")
    assert(res.validation.errors.exists(_.contains("type mismatch for qty")))
  }

  test("write runs object-level query rules through the pre-scan path") {
    val df = T.load(spark, sf, "lineitem")
    val res = ContractIO.write(df, tmpDir("graft_w_query"),
      DemoContracts.lineitemWithQuery, mode = "overwrite")
    assert(res.validation.metrics.contains("high_discount_count"))
    assert(res.validation.metrics("high_discount_count").asInstanceOf[Number].longValue > 0)
  }

  test("governed read: enforce throws on broken contract, aligned frame otherwise") {
    val ok = ContractIO.read(spark, s"$sf/lineitem.parquet", DemoContracts.lineitemAlign)
    assert(ok.df.columns.toSeq == DemoContracts.lineitemAlign.properties.map(_.name))
    intercept[IllegalStateException] {
      ContractIO.read(spark, s"$sf/lineitem.parquet", DemoContracts.lineitemBroken, enforce = true)
    }
  }
}

class FormatsSpec extends SparkSpec {
  import graft.{DemoContracts, T}

  test("governed IO round-trips csv and json with contract-driven casts") {
    val li = T.load(spark, "/root/testdata/sf0.001", "lineitem")
      .select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag", "l_shipdate")
    for (fmt <- Seq("csv", "json")) {
      val out = tmpDir(s"graft_fmt_$fmt")
      ContractIO.write(li, out, DemoContracts.lineitemAlign, format = fmt,
        mode = "overwrite", options = if (fmt == "csv") Map("header" -> "true") else Map.empty)
      val r = ContractIO.read(spark, out, DemoContracts.lineitemAlign, format = fmt,
        options = if (fmt == "csv") Map("header" -> "true") else Map.empty)
      assert(r.df.count() == li.count(), s"$fmt row count")
      assert(r.df.columns.toSeq == DemoContracts.lineitemAlign.properties.map(_.name), s"$fmt columns")
      // text formats come back as strings; the align cast restores types
      assert(r.df.schema("l_quantity").dataType == org.apache.spark.sql.types.LongType, s"$fmt cast")
      val q = r.df.agg(org.apache.spark.sql.functions.sum("l_quantity")).collect()(0).getLong(0)
      val expected = li.agg(org.apache.spark.sql.functions.sum(
        org.apache.spark.sql.functions.col("l_quantity").cast("long"))).collect()(0).getLong(0)
      assert(q == expected, s"$fmt values")
    }
  }
}
