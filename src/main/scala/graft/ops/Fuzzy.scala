package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Edit-distance (Levenshtein) fuzzy matching — the entity-resolution /
  * record-linkage primitive a curation pipeline needs to reconcile noisy
  * catalogs, product names, author strings, or near-identical titles
  * (dc43 has no native fuzzy matching; this extends the dedup family —
  * cf. dc43 `integrations/spark` dedup surface — to typo-distance
  * semantics the n-gram/minhash operators cannot express: Jaccard over
  * shingles is blind to single-character edits in SHORT strings, where
  * one typo changes most shingles).
  *
  * Scale shape: a naive fuzzy join is |L|×|R| Levenshtein calls — dead at
  * any scale. Here candidates come from an EQUI-join on a derived
  * blocking key, so Spark plans a hash join (shuffle- or broadcast-) and
  * the quadratic work is confined within blocks:
  *
  *  - Length banding is COMPLETE and built in: `dist(a,b) >= |len(a) -
  *    len(b)|`, so any pair within `maxDist` has lengths within
  *    `maxDist`. With band width `w = maxDist + 1`, qualifying pairs sit
  *    in the same or adjacent bands; the left side expands each row to
  *    its {b−1, b, b+1} band neighbourhood and the right side keeps its
  *    own band, so every qualifying pair meets on EXACTLY ONE key (the
  *    right row's band) — no distinct needed, 3× left replication total.
  *  - `blockCols` adds user blocking (first token, registrable domain,
  *    phonetic key, an LSH bucket from [[NearDup]]...) composed into the
  *    same equi-key. This is where the 100-TB candidate volume is really
  *    cut; the recall trade is the caller's, and it is the documented
  *    standard practice (complete blocking on length alone would compare
  *    every similar-length pair in the corpus).
  *
  * The residual predicate short-circuits: the cheap exact length check
  * runs before Levenshtein, and the Levenshtein itself is the THRESHOLDED
  * variant (band-limited O(len·maxDist) DP with early abandon, codegen'd)
  * rather than the full O(len²) matrix.
  *
  * Null/empty contract: rows with a NULL text or NULL block column never
  * match (equi-join semantics); empty strings match anything of length
  * <= maxDist within their block. */
object Fuzzy {

  /** Fuzzy equi-blocked join of `left` and `right` on edit distance over
    * `textCol` (present in both frames). Returns one row per qualifying
    * pair: `a_<idCol>`, `b_<idCol>`, `dist` (long, <= maxDist), plus the
    * block columns. Pairs are emitted exactly once (see banding note
    * above). Self-pairs are NOT filtered here — use [[fuzzyDedupPairs]]
    * for the self-join form. */
  def fuzzyJoin(left: DataFrame, right: DataFrame, textCol: String,
                maxDist: Int, idCol: String = "doc_id",
                blockCols: Seq[String] = Nil): DataFrame = {
    require(maxDist >= 0, "maxDist must be non-negative")
    val w = maxDist + 1
    def band(c: Column): Column = floor(length(c) / lit(w)).cast(LongType)
    // left expands to its band neighbourhood; right keeps its own band —
    // a qualifying pair (|lenDiff| <= maxDist < w ⇒ bands differ by <= 1)
    // meets on the right row's band exactly once
    val a = left.select(
      Seq(col(idCol).as("_fz_a_id"), col(textCol).as("_fz_a_txt")) ++
        blockCols.map(c => col(c).as(s"_fz_a_$c")): _*)
      .withColumn("_fz_band",
        explode(array(band(col("_fz_a_txt")) - 1, band(col("_fz_a_txt")),
          band(col("_fz_a_txt")) + 1)))
    val b = right.select(
      Seq(col(idCol).as("_fz_b_id"), col(textCol).as("_fz_b_txt")) ++
        blockCols.map(c => col(c).as(s"_fz_b_$c")): _*)
      .withColumn("_fz_band", band(col("_fz_b_txt")))
    val joined = a.join(b,
      a("_fz_band") === b("_fz_band") &&
        blockCols.map(c => col(s"_fz_a_$c") === col(s"_fz_b_$c"))
          .foldLeft(lit(true))(_ && _))
    joined
      // cheap complete prefilter before the DP — most candidates die here
      .filter(abs(length(col("_fz_a_txt")) - length(col("_fz_b_txt"))) <= maxDist)
      // thresholded Levenshtein: returns -1 above maxDist (early abandon)
      .withColumn("dist",
        levenshtein(col("_fz_a_txt"), col("_fz_b_txt"), maxDist).cast(LongType))
      .filter(col("dist") >= 0)
      .select(
        Seq(col("_fz_a_id").as(s"a_$idCol"), col("_fz_b_id").as(s"b_$idCol"),
          col("dist")) ++ blockCols.map(c => col(s"_fz_a_$c").as(c)): _*)
  }

  /** Self-join form: unordered within-corpus pairs (`a_<idCol> <
    * b_<idCol>`) whose `textCol` values are within `maxDist` edits,
    * blocked as [[fuzzyJoin]]. The typo-dedup complement to
    * [[NearDup.ngramPairs]]: shingle Jaccard for long documents,
    * edit distance for short strings (titles, names, labels). */
  def fuzzyDedupPairs(df: DataFrame, textCol: String, maxDist: Int,
                      idCol: String = "doc_id",
                      blockCols: Seq[String] = Nil): DataFrame =
    fuzzyJoin(df, df, textCol, maxDist, idCol, blockCols)
      .filter(col(s"a_$idCol") < col(s"b_$idCol"))
}
