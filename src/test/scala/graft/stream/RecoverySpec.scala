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

  test("StreamSemanticDup bucket state survives a checkpointed restart") {
    import spark.implicits._
    val base = tmpDir("ssd_recov")
    val src = s"$base/src"; val out = s"$base/out"; val ckpt = s"$base/ckpt"
    val v = Seq(1f, 0f, 1f, 0f) // identical vectors share every band bucket

    def runOnce(): Unit = {
      val stream = spark.readStream
        .schema("vec_id long, embedding array<float>, label int")
        .parquet(src)
      val q = StreamSemanticDup.candidates(stream, dim = 4, nBits = 16, bandBits = 4)
        .writeStream.option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .format("parquet").start(out)
      q.awaitTermination()
    }

    Seq((1L, v, 0), (2L, v, 0)).toDF("vec_id", "embedding", "label")
      .write.mode("append").parquet(src)
    runOnce()
    def pairs = spark.read.parquet(out)
      .select("vec_a", "vec_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L)))

    // restart: vec 3 must pair against the RECOVERED bucket members 1 and 2
    Seq((3L, v, 0)).toDF("vec_id", "embedding", "label")
      .write.mode("append").parquet(src)
    runOnce()
    assert(pairs == Set((1L, 2L), (1L, 3L), (2L, 3L)),
      "state must survive the restart: cross-restart pairs prove recovery")
  }
}
