package graft.stream

import graft.{DemoContracts, SparkSpec, T}
import org.apache.spark.sql.streaming.Trigger

class RecoverySpec extends SparkSpec {

  test("governed stream restarts from its checkpoint exactly-once") {
    val base = tmpDir("graft_recov")
    val src = s"$base/src"
    val out = s"$base/out"
    val ckpt = s"$base/ckpt"
    val li = T.load(spark, "/root/testdata/sf0.001", "lineitem")

    def runOnce(): Unit = {
      val stream = ContractStream.read(spark, src, DemoContracts.lineitemAlign)
      val q = stream.writeStream
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .format("parquet")
        .start(out)
      q.awaitTermination()
    }

    // first tranche
    li.limit(1000).write.mode("append").parquet(src)
    runOnce()
    assert(spark.read.parquet(out).count() == 1000)

    // restart with new files only: checkpoint must skip the old tranche
    li.limit(1500).write.mode("append").parquet(src) // 1500 more rows in new files
    runOnce()
    val total = spark.read.parquet(out)
    assert(total.count() == 2500, "restart must process exactly the new files")
    // aligned schema survived both runs
    assert(total.columns.toSeq == DemoContracts.lineitemAlign.properties.map(_.name))

    // a third run with nothing new appends nothing
    runOnce()
    assert(spark.read.parquet(out).count() == 2500)
  }
}
