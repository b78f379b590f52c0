package graft.align

import graft.SparkSpec
import graft.contracts._
import org.apache.spark.sql.types._

class AlignSpec extends SparkSpec {
  import spark.implicits._

  private val contract = Contract(id = "t.a", version = "1.0.0",
    schema = Seq(SchemaObjectDef("t", Seq(
      FieldDef("id", Some("bigint"), required = true),
      FieldDef("qty", Some("bigint")),       // double -> bigint cast
      FieldDef("name", Some("string")),
      FieldDef("extra_missing", Some("date"))))))

  private def df = Seq((1, 2.7, "x", true), (2, -3.9, "y", false))
    .toDF("id", "qty", "name", "unmapped")

  test("align selects contract columns in order, casts, fills typed nulls") {
    val out = ApplyContract.align(df, contract)
    assert(out.columns.toSeq == Seq("id", "qty", "name", "extra_missing"))
    assert(out.schema("id").dataType == LongType)
    assert(out.schema("qty").dataType == LongType)
    assert(out.schema("extra_missing").dataType == DateType)
    val rows = out.orderBy("id").collect()
    assert(rows(0).getLong(1) == 2L && rows(1).getLong(1) == -3L) // trunc toward zero
    assert(rows.forall(_.isNullAt(3)))
  }

  test("keepExtraColumns appends unmapped columns after contract columns") {
    val out = ApplyContract.align(df, contract, keepExtraColumns = true)
    assert(out.columns.toSeq == Seq("id", "qty", "name", "extra_missing", "unmapped"))
  }

  test("autoCast=false keeps source types") {
    val out = ApplyContract.align(df, contract, autoCast = false)
    assert(out.schema("qty").dataType == DoubleType)
  }

  test("toStructType maps the full primitive matrix incl. nested") {
    val c = Contract(id = "t.t", version = "1.0.0",
      schema = Seq(SchemaObjectDef("t", Seq(
        FieldDef("s", Some("string")), FieldDef("i", Some("int"), required = true),
        FieldDef("d", Some("decimal")), FieldDef("ts", Some("timestamp")),
        FieldDef("arr", Some("array"), items = Some(FieldDef("e", Some("double")))),
        FieldDef("o", Some("object"), fields = Seq(FieldDef("x", Some("boolean"))))))))
    val st = ApplyContract.toStructType(c)
    assert(st("s").dataType == StringType)
    assert(st("i").dataType == IntegerType && !st("i").nullable)
    assert(st("d").dataType == DecimalType(38, 18))
    assert(st("arr").dataType == ArrayType(DoubleType, containsNull = true))
    assert(st("o").dataType == StructType(Seq(StructField("x", BooleanType, nullable = true))))
  }

  test("alignment prunes the parquet read schema to contract columns") {
    val li = graft.T.load(spark, "/root/testdata/sf0.001", "lineitem")
    val slim = ApplyContract.align(li, graft.DemoContracts.lineitemAlign)
    val scan = slim.queryExecution.executedPlan.collectLeaves().head.toString
    assert(scan.contains("l_orderkey") && !scan.contains("l_extendedprice"),
      s"scan should prune to contract columns: $scan")
  }
}
