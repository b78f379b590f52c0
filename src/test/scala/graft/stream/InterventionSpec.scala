package graft.stream

import graft.SparkSpec
import graft.contracts._
import graft.obs.BufferingObservationSink
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.StreamingQueryException

final case class Rec(id: Long, v: Double)

class InterventionSpec extends SparkSpec {
  import spark.implicits._

  private val contract = Contract(id = "t.stream", version = "1.0.0",
    schema = Seq(SchemaObjectDef("t", Seq(
      FieldDef("id", Some("bigint"), required = true),
      FieldDef("v", Some("double"),
        quality = Seq(QualityRule(mustBeGreaterThan = Some(BigDecimal(0)))))))))

  test("governed streaming write records per-batch observations and intervenes on violations") {
    val mem = MemoryStream[Rec](spark)
    val sink = new BufferingObservationSink
    val out = tmpDir("graft_stream_out")
    val q = ContractStream.write(mem.toDF(), s"$out/data", contract,
      checkpointLocation = s"$out/ckpt",
      intervention = new FailAfterViolationsIntervention(maxViolatedBatches = 0),
      sink = sink)
    try {
      mem.addData(Rec(1, 1.0), Rec(2, 2.0)) // clean batch: stream continues
      q.processAllAvailable()
      assert(q.isActive)
      assert(sink.all.exists { case (id, _, m, v) =>
        id == "t.stream" && v.ok && m("row_count").asInstanceOf[Long] == 2L })
      mem.addData(Rec(3, -5.0)) // violated batch: intervention stops the stream
      val e = intercept[StreamingQueryException] { q.processAllAvailable(); q.awaitTermination(10000) }
      assert(e.getMessage.contains("violated its contract") ||
        Option(e.getCause).exists(_.getMessage.contains("violated its contract")))
      assert(sink.all.exists { case (_, _, _, v) => !v.ok })
      // the clean batch's rows were appended before the stop
      assert(spark.read.parquet(s"$out/data").count() >= 2)
    } finally q.stop()
  }
}
