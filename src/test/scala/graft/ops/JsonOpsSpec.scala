package graft.ops

import graft.SparkSpec

class JsonOpsSpec extends SparkSpec {
  import spark.implicits._

  test("extractProps: malformed flagged invalid, missing key valid-with-null, total over dirty feeds") {
    val ev = Seq(
      (1L, "view", """{"k": 42}"""),
      (2L, "view", """{"other": 1}"""),   // valid object, no k
      (3L, "view", """not json at all"""), // malformed
      (4L, "view", """{"k": null}"""),     // explicit null
      (5L, "view", null.asInstanceOf[String]), // null payload
      (6L, "view", "[1,2]"),               // well-formed non-object
      (7L, "view", "123"),                 // well-formed scalar
      (8L, "view", "null"),                // well-formed bare null
      (9L, "view", ""))                    // empty string — unparseable
      .toDF("event_id", "event_type", "props")
    val out = JsonOps.extractProps(ev)
      .collect().map(r => r.getLong(0) ->
        ((if (r.isNullAt(2)) None else Some(r.getLong(2))), r.getBoolean(3))).toMap
    assert(out(1L) == ((Some(42L), true)))
    assert(out(2L) == ((None, true)), "missing key is valid JSON with null field")
    assert(out(3L) == ((None, false)), "malformed payload must flag, not throw")
    assert(out(4L) == ((None, true)))
    assert(out(5L) == ((None, false)))
    // TRY_CAST(... AS JSON) parity: any well-formed JSON is valid, even
    // non-objects — only genuinely unparseable payloads flag false
    assert(out(6L) == ((None, true)), "array payload is valid JSON")
    assert(out(7L) == ((None, true)), "scalar payload is valid JSON")
    assert(out(8L) == ((None, true)), "bare null payload is valid JSON")
    assert(out(9L) == ((None, false)), "empty string is not JSON")
    assert(out.size == 9, "operator must be total — every input row survives")
  }

  test("extractProps is a stateless projection: runs unchanged on a streaming frame") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val mem = MemoryStream[(Long, String, String)](spark)
    val q = JsonOps.extractProps(mem.toDF().toDF("event_id", "event_type", "props"))
      .writeStream.format("memory").queryName("json_stream_out")
      .outputMode("append").start()
    try {
      mem.addData((1L, "x", """{"k": 5}"""), (2L, "x", "broken"))
      q.processAllAvailable()
      val out = spark.table("json_stream_out")
        .collect().map(r => r.getLong(0) ->
          ((if (r.isNullAt(2)) None else Some(r.getLong(2))), r.getBoolean(3))).toMap
      assert(out == Map(1L -> ((Some(5L), true)), 2L -> ((None, false))))
    } finally q.stop()
  }

  test("propsStats: grid-sized output, nulls excluded, exact distinct") {
    val ev = (1 to 30).map(i => (i.toLong, if (i % 2 == 0) "a" else "b",
      s"""{"k": ${i % 15}}""")) :+ ((31L, "a", "broken"))
    val out = JsonOps.propsStats(ev.toDF("event_id", "event_type", "props"))
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    // type a sees even i -> k in {2,4,..,14, 0,...}; buckets 0 and 1
    assert(out.keySet.forall { case (_, b) => b == 0L || b == 1L })
    // the malformed row contributed nothing
    assert(out.values.map(_._1).sum == 30)
    // n_distinct never exceeds bucket width
    assert(out.values.forall(_._2 <= 10))
  }
}
