package graft.io

import graft.SparkSpec
import graft.contracts._
import graft.ops.{Curate, HashMode, TextOps}
import org.apache.spark.sql.functions._

/** Integration: the governance surface (contract-validated read, observed
  * write) wrapped around the training-data curation operators — the two
  * halves of the library composing the way a real pipeline would run
  * them: governed ingest → curation chain → governed, metric-observed
  * publish. */
class GovernedCurationSpec extends SparkSpec {
  import spark.implicits._

  private val docsContract = Contract(
    id = "corpus.documents", version = "1.0.0",
    schema = Seq(SchemaObjectDef("documents", Seq(
      FieldDef("doc_id", Some("bigint"), required = true, unique = true),
      FieldDef("text", Some("string"), required = true),
      FieldDef("lang", Some("string"), required = true,
        quality = Seq(QualityRule(rule = Some("enum"),
          values = Seq("en", "de", "fr", "es", "zh")))),
      FieldDef("source", Some("string"), required = true)))))

  private val curatedContract = Contract(
    id = "corpus.curated", version = "1.0.0",
    schema = Seq(SchemaObjectDef("curated", Seq(
      FieldDef("doc_id", Some("bigint"), required = true, unique = true),
      FieldDef("text", Some("string"), required = true),
      FieldDef("lang", Some("string"), required = true),
      FieldDef("source", Some("string"), required = true),
      FieldDef("split", Some("string"), required = true,
        quality = Seq(QualityRule(rule = Some("enum"),
          values = Seq("train", "val", "test"))))))))

  test("governed read -> curation chain -> observed governed write") {
    val dir = tmpDir("graft_govcur")
    graft.T.load(spark, "/root/testdata/sf0.001", "documents")
      .select("doc_id", "text", "lang", "source")
      .write.parquet(s"$dir/raw")

    // governed ingest: validate + align against the documents contract
    val in = ContractIO.read(spark, s"$dir/raw", docsContract, enforce = true)
    assert(in.validation.ok)

    // the curation chain, exactly as q_curation_pipeline composes it,
    // plus whole-token truncation before publish
    val quality = TextOps.textQuality(in.df).filter(col("keep")).select("doc_id")
    val kept = in.df.join(quality, Seq("doc_id"), "left_semi")
    val deduped = TextOps.dedupExact(kept)
      .join(kept.select("doc_id", "text"), Seq("doc_id"))
    val split = Curate.assignSplits(
      Curate.mixBySource(deduped, Map.empty, defaultPercent = 75,
        mode = HashMode.Portable),
      Seq("train" -> 80, "val" -> 10, "test" -> 10), mode = HashMode.Portable)
    val curated = TextOps.truncateTokens(
      split.select("doc_id", "text", "lang", "source", "split"), maxTokens = 64)
      .drop("n_tokens_kept")

    // governed publish: metrics ride the write pass via observe
    val out = ContractIO.write(curated, s"$dir/curated", curatedContract,
      mode = "overwrite")
    assert(out.validation.ok,
      s"curated output must satisfy its contract: ${out.validation.errors}")
    val m = out.validation.metrics
    assert(m("row_count").asInstanceOf[Number].longValue == curated.count())
    assert(m("violations.enum_split").asInstanceOf[Number].longValue == 0L)

    // round-trip: the published corpus re-reads clean under its contract
    val back = ContractIO.read(spark, s"$dir/curated", curatedContract, enforce = true)
    assert(back.validation.ok)
    assert(back.df.count() == curated.count())
  }
}
