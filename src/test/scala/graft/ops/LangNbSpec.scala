package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Trained multi-class language ID: agreement with the [[TextOps.langId]]
  * heuristic on easy real-language classes (the r14 verdict's done
  * clause), deterministic tie/empty behavior, model shape, and
  * stream-admissibility of inference. */
class LangNbSpec extends SparkSpec {
  import spark.implicits._

  // genuinely-separable textlets per language (the documents table's
  // lang labels are synthetic — the heuristic-agreement pin needs REAL
  // language text, repeated enough for char-trigram statistics)
  private val textlets = Map(
    "en" -> "the house is near the river and it is quiet for you that day",
    "de" -> "der hund und die katze sind nicht im haus ich gehe zu dir mit",
    "fr" -> "le chien et la petite maison est une belle chose que pour les",
    "es" -> "el perro y las casas es una cosa que por para los padres aqui",
    "zh" -> "这是一个很好的房子和河流")

  private def corpus = (for {
    ((lang, text), c) <- textlets.toSeq.sortBy(_._1).zipWithIndex
    i <- 0 until 6
  } yield ((c * 10 + i).toLong, s"$text $i", lang))
    .toDF("doc_id", "text", "lang")

  test("trained NB agrees with the heuristic on the easy fixture classes") {
    val model = TextOps.trainLangNb(corpus, col("lang"), buckets = 256)
    assert(model.classes == Seq("de", "en", "es", "fr", "zh"),
      "classes sorted ascending (the tie order)")
    assert(model.weights.forall(_.size == 256) && model.priors.size == 5)
    // balanced classes -> equal priors
    assert(model.priors.distinct.size == 1)
    val predicted = TextOps.langIdNb(corpus, model)
      .join(corpus.select(col("doc_id"), col("lang")), Seq("doc_id"))
    val trained = predicted.select(col("doc_id"), col("predicted_lang"))
      .as[(Long, String)].collect().toMap
    val heuristic = TextOps.langId(corpus)
      .select(col("doc_id"), col("predicted_lang"))
      .as[(Long, String)].collect().toMap
    assert(trained == heuristic,
      "on cleanly-separable text the trained model must agree with the heuristic")
    // ...and both are simply RIGHT on this fixture
    val correct = predicted.filter(col("predicted_lang") === col("lang")).count()
    assert(correct == corpus.count())
  }

  test("deterministic edges: empty text argmaxes the priors with ties to the first class") {
    val model = TextOps.trainLangNb(corpus, col("lang"), buckets = 64)
    val out = TextOps.langIdNb(
      Seq((1L, ""), (2L, null.asInstanceOf[String]), (3L, "ab"))
        .toDF("doc_id", "text"), model)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_feats"), r.getAs[String]("predicted_lang"),
          r.getAs[Long]("score_micro"))).toMap
    // equal priors -> the tie goes to the lexicographically first class,
    // and the score is exactly micro(prior)
    val pm = math.round(model.priors.head * 1e6)
    assert(out(1L) == (0L, "de", pm))
    assert(out(2L) == (0L, "de", pm), "null text is total")
    assert(out(3L) == (0L, "de", pm), "sub-trigram text has no features")
    // unbalanced priors move the featureless argmax
    val lopsided = corpus.unionByName(
      Seq((999L, "more english text entirely", "en")).toDF("doc_id", "text", "lang"))
    val m2 = TextOps.trainLangNb(lopsided, col("lang"), buckets = 64)
    val p2 = TextOps.langIdNb(Seq((1L, "")).toDF("doc_id", "text"), m2)
      .collect().head.getAs[String]("predicted_lang")
    assert(p2 == "en", "the majority class wins a featureless argmax")
  }

  test("training contracts: null labels excluded, empty training loud") {
    val withNulls = corpus.unionByName(
      Seq((5000L, "unlabeled text here")).toDF("doc_id", "text")
        .withColumn("lang", lit(null: String)))
    val m = TextOps.trainLangNb(withNulls, col("lang"), buckets = 64)
    assert(m.classes.size == 5, "null labels train nothing")
    intercept[IllegalArgumentException] {
      TextOps.trainLangNb(corpus.filter(col("doc_id") < 0), col("lang"))
    }
  }

  test("inference is stream-admissible: a MemoryStream scores identically to batch") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val model = TextOps.trainLangNb(corpus, col("lang"), buckets = 64)
    val probes = Seq((1L, textlets("fr")), (2L, textlets("zh")), (3L, ""))
    val batch = TextOps.langIdNb(probes.toDF("doc_id", "text"), model)
      .collect().map(_.toSeq).toSet
    val mem = MemoryStream[(Long, String)](spark)
    val q = TextOps.langIdNb(mem.toDF().toDF("doc_id", "text"), model)
      .writeStream.format("memory").queryName("langnb_stream")
      .outputMode("append").start()
    try {
      mem.addData(probes: _*)
      q.processAllAvailable()
      val streamed = spark.table("langnb_stream").collect().map(_.toSeq).toSet
      assert(streamed == batch, "inference must be a pure projection: stream ≡ batch")
    } finally q.stop()
  }

  test("the hash mode is part of the model: inference hashes under the trained mode") {
    // train the same corpus under both modes — the models must RECORD
    // their mode, and each model's inference must reproduce the
    // training-time bucketing (pre-fix, langIdNb took an independent
    // mode parameter: a Portable-trained model scored under Default
    // hashed features into wrong buckets with no error)
    val mp = TextOps.trainLangNb(corpus, col("lang"), buckets = 256,
      mode = HashMode.Portable)
    val md = TextOps.trainLangNb(corpus, col("lang"), buckets = 256)
    assert(mp.mode == HashMode.Portable && md.mode == HashMode.Default)
    // different hash functions bucket differently, so the learned
    // weight tables cannot coincide — a mode mix-up would be visible
    assert(mp.weights != md.weights,
      "portable and default training must produce distinct weight tables")
    // both self-consistent models classify the separable fixture right
    for (m <- Seq(mp, md)) {
      val correct = TextOps.langIdNb(corpus, m)
        .join(corpus.select(col("doc_id"), col("lang")), Seq("doc_id"))
        .filter(col("predicted_lang") === col("lang")).count()
      assert(correct == corpus.count(),
        s"mode ${m.mode} model must classify its own training fixture")
    }
  }

  test("nGram = 1 emits no phantom feature for empty/null text") {
    // split("", "") is [""] (size 1): at nGram = 1 the size guard alone
    // passed and produced one EMPTY-STRING feature per empty document —
    // both the trained counts and n_feats were off by one there
    val model = TextOps.trainLangNb(corpus, col("lang"), buckets = 64,
      nGram = 1)
    val out = TextOps.langIdNb(
      Seq((1L, ""), (2L, null.asInstanceOf[String]), (3L, "a"))
        .toDF("doc_id", "text"), model)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_feats"))
      .toMap
    assert(out(1L) == 0L, "empty text has zero unigram features")
    assert(out(2L) == 0L, "null text has zero unigram features")
    assert(out(3L) == 1L, "a 1-char text has exactly one unigram feature")
  }
}
