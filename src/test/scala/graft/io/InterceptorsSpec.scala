package graft.io

import graft.{DemoContracts, SparkSpec, T}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class InterceptorsSpec extends SparkSpec {

  test("interceptors run around governed IO and can rewrite frames") {
    val events = Seq.newBuilder[String]
    val masker = new GovernanceInterceptor {
      override def preRead(ctx: InterceptorContext): Unit = events += s"preRead:${ctx.path.get}"
      override def postRead(ctx: InterceptorContext, df: DataFrame): DataFrame = {
        events += "postRead"
        df.withColumn("l_returnflag", lit("MASKED"))
      }
      override def preWrite(ctx: InterceptorContext, df: DataFrame): DataFrame = {
        events += "preWrite"; df
      }
      override def postWrite(ctx: InterceptorContext, result: WriteResult): Unit =
        events += s"postWrite:${result.writtenPaths.size}"
    }
    val li = T.load(spark, "/root/testdata/sf0.001", "lineitem")
    val out = tmpDir("graft_icept")
    ContractIO.write(li, out, DemoContracts.lineitem, mode = "overwrite",
      interceptors = Seq(masker))
    val r = ContractIO.read(spark, out, DemoContracts.lineitemAlign, interceptors = Seq(masker))
    assert(r.df.select("l_returnflag").distinct().collect().map(_.getString(0)).toSeq == Seq("MASKED"))
    assert(events.result() == Seq("preWrite", "postWrite:1", s"preRead:$out", "postRead"))
  }

  test("read status policy gates non-active contracts") {
    val src = "/root/testdata/sf0.001/lineitem.parquet"
    val draft = DemoContracts.lineitemAlign.copy(status = Some("draft"))
    intercept[IllegalStateException] {
      ContractIO.read(spark, src, draft, statusPolicy = Some(ReadStatusPolicy()))
    }
    // allowed when policy admits drafts
    val ok = ContractIO.read(spark, src, draft,
      statusPolicy = Some(ReadStatusPolicy(allowedStatuses = Set("active", "draft"))))
    assert(ok.df.columns.nonEmpty)
    // missing status allowed by default, rejected when required
    val noStatus = DemoContracts.lineitemAlign.copy(status = None)
    assert(ContractIO.read(spark, src, noStatus,
      statusPolicy = Some(ReadStatusPolicy())).df.columns.nonEmpty)
    intercept[IllegalStateException] {
      ContractIO.read(spark, src, noStatus,
        statusPolicy = Some(ReadStatusPolicy(allowMissingStatus = false)))
    }
  }
}
