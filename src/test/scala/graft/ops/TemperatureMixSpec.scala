package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

final case class TmDoc(doc_id: Long, lang: String)

class TemperatureMixSpec extends SparkSpec {
  import spark.implicits._

  // skewed corpus: 1000 en, 200 fr, 50 de
  private lazy val corpus =
    ((1L to 1000L).map(i => TmDoc(i, "en")) ++
      (1001L to 1200L).map(i => TmDoc(i, "fr")) ++
      (1201L to 1250L).map(i => TmDoc(i, "de"))).toDF()

  test("alpha=0.5 upweights rare groups; alpha=1 is proportional (flat rate)") {
    val r05 = Curate.temperatureRates(corpus, "lang", targetPercent = 40)
      .as[(String, Long, Long)].collect().map(r => r._1 -> r._3).toMap
    assert(r05("de") > r05("fr") && r05("fr") > r05("en"),
      s"sqrt temperature must favor rare groups: $r05")
    val r1 = Curate.temperatureRates(corpus, "lang", targetPercent = 40, alpha = 1.0)
      .as[(String, Long, Long)].collect().map(r => r._1 -> r._3).toMap
    // proportional sampling keeps every group at the flat target rate
    // (integral division may round down by 1)
    assert(r1.values.forall(r => r == 40L || r == 39L), s"$r1")
  }

  test("alpha=0.25 flattens harder than alpha=0.5") {
    def frOverEn(alpha: Double): Double = {
      val r = Curate.temperatureRates(corpus, "lang", 40, alpha)
        .as[(String, Long, Long)].collect().map(x => x._1 -> x._3).toMap
      r("fr").toDouble / r("en")
    }
    // the rare-to-common rate ratio grows as alpha falls toward 0
    assert(frOverEn(0.25) > frOverEn(0.5) && frOverEn(0.5) > 1.0,
      "lower alpha must upweight rare groups harder")
  }

  test("total kept tracks targetPercent of the corpus") {
    val kept = Curate.temperatureMix(corpus, "lang", targetPercent = 40).count()
    val expected = 0.40 * 1250
    assert(math.abs(kept - expected) < 0.15 * 1250,
      s"kept $kept vs expected ~$expected")
  }

  test("rates cap at 100 when a rare group's share exceeds its size") {
    // de has 50 rows; at target 100% with strong flattening its ideal
    // share exceeds 50 rows, so the rate caps
    val r = Curate.temperatureRates(corpus, "lang", targetPercent = 100,
      alpha = 0.25).as[(String, Long, Long)].collect()
      .map(x => x._1 -> x._3).toMap
    assert(r("de") == 100L)
  }

  test("null groups are dropped; unknown groups dropped by mixWithRates") {
    val withNull = corpus.unionByName(Seq(TmDoc(9999L, null)).toDF())
    val rates = Curate.temperatureRates(withNull, "lang", 40)
    assert(rates.filter(col("lang").isNull).count() == 0)
    val onlyEn = rates.filter(col("lang") === "en")
    val mixed = Curate.mixWithRates(withNull, onlyEn, "lang")
    assert(mixed.filter(col("lang") =!= "en").count() == 0)
  }

  test("temperatureMix == freeze rates + mixWithRates (the artifact path)") {
    val direct = Curate.temperatureMix(corpus, "lang", 40)
      .select("doc_id").as[Long].collect().toSet
    val frozen = Curate.temperatureRates(corpus, "lang", 40)
    val applied = Curate.mixWithRates(corpus, frozen, "lang")
      .select("doc_id").as[Long].collect().toSet
    assert(direct == applied)
  }

  test("mixWithRates admits rows statelessly on a stream, matching batch") {
    val frozen = Curate.temperatureRates(corpus, "lang", 40)
      .collect().toSeq // freeze driver-side, as an ingest job would load it
    val ratesDf = spark.createDataFrame(
      spark.sparkContext.parallelize(frozen), Curate.temperatureRates(corpus, "lang", 40).schema)
    val mem = MemoryStream[TmDoc](spark)
    val q = Curate.mixWithRates(mem.toDF(), ratesDf, "lang")
      .writeStream.format("memory").queryName("tmix_stream").outputMode("append")
      .start()
    try {
      mem.addData((1L to 100L).map(i => TmDoc(i, "en")) ++
        (1201L to 1250L).map(i => TmDoc(i, "de")): _*)
      q.processAllAvailable()
      val streamed = spark.table("tmix_stream").select("doc_id").as[Long].collect().toSet
      val batch = Curate.mixWithRates(
        ((1L to 100L).map(i => TmDoc(i, "en")) ++
          (1201L to 1250L).map(i => TmDoc(i, "de"))).toDF(),
        ratesDf, "lang").select("doc_id").as[Long].collect().toSet
      assert(streamed == batch, "online admission must equal the batch operator")
    } finally q.stop()
  }

  test("invalid alpha and targetPercent are rejected") {
    intercept[IllegalArgumentException] {
      Curate.temperatureRates(corpus, "lang", 40, alpha = 0.7)
    }
    intercept[IllegalArgumentException] {
      Curate.temperatureRates(corpus, "lang", 0)
    }
  }
}
