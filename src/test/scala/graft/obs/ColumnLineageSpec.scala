package graft.obs

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ColumnLineageSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("projection, rename, and computed columns trace to their parquet source fields") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    val out = li.select(col("l_orderkey").as("id"),
      (col("l_extendedprice") * (lit(1) - col("l_discount"))).as("net"))
    val lin = ColumnLineage.lineage(out)
    val src = lin("id")
    assert(src.size == 1 && src.head._2 == "l_orderkey")
    assert(src.head._1.contains("lineitem"), s"source dataset: ${src.head._1}")
    assert(lin("net").map(_._2) == Set("l_extendedprice", "l_discount"))
  }

  test("aggregates and joins union the contributing fields across tables") {
    val o = spark.read.parquet(s"$sf/orders.parquet")
    val c = spark.read.parquet(s"$sf/customer.parquet")
    val out = c.join(o, col("c_custkey") === col("o_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(sum(col("o_totalprice")).as("revenue"),
        countDistinct(col("o_orderkey"), col("c_custkey")).as("k"))
    val lin = ColumnLineage.lineage(out)
    assert(lin("c_mktsegment").map(_._2) == Set("c_mktsegment"))
    assert(lin("revenue").map(_._2) == Set("o_totalprice"))
    assert(lin("revenue").head._1.contains("orders"))
    // cross-table aggregate references both sides
    assert(lin("k").map(_._2) == Set("o_orderkey", "c_custkey"))
    assert(lin("k").map(_._1).size == 2)
  }

  test("windows, explode, and unions propagate; filters add nothing") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("l_suppkey")).orderBy(col("l_shipdate"))
    val windowed = li.filter(col("l_quantity") > 10)
      .withColumn("rn", row_number().over(w))
    val lin = ColumnLineage.lineage(windowed.select("l_orderkey", "rn"))
    assert(lin("l_orderkey").map(_._2) == Set("l_orderkey"))
    // row_number derives from its partition/order columns
    assert(lin("rn").map(_._2) == Set("l_suppkey", "l_shipdate"))

    // in-memory relations trace to the underlying tuple fields (_1/_2) —
    // the plan-faithful identity; dataset label is "memory"
    val mem = Seq((1L, "a b")).toDF("doc_id", "text")
    val exploded = mem.select(col("doc_id"),
      explode(split(col("text"), " ")).as("tok"))
    val lin2 = ColumnLineage.lineage(exploded)
    assert(lin2("tok") == Set(("memory", "_2")))

    val u = li.select(col("l_orderkey").as("k"))
      .union(spark.read.parquet(s"$sf/orders.parquet").select(col("o_orderkey")))
    val lin3 = ColumnLineage.lineage(u)
    assert(lin3("k").map(_._2) == Set("l_orderkey", "o_orderkey"),
      s"positional union must merge both sides: ${lin3("k")}")
  }

  test("facet renders the OpenLineage columnLineage shape") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    val j = ColumnLineage.facet(li.select(col("l_orderkey").as("id")))
    val s = org.json4s.jackson.JsonMethods.compact(
      org.json4s.jackson.JsonMethods.render(j))
    assert(s.contains("\"fields\"") && s.contains("\"inputFields\"") &&
      s.contains("\"field\":\"l_orderkey\""))
  }
}
