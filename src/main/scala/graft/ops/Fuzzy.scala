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
                blockCols: Seq[String] = Nil,
                maxPairsPerBlock: Long = 0L,
                onHotBlock: String = "salt",
                hotBlockSalts: Int = 32): DataFrame = {
    require(maxDist >= 0, "maxDist must be non-negative")
    require(onHotBlock == "salt" || onHotBlock == "fail",
      s"onHotBlock must be 'salt' or 'fail', got '$onHotBlock'")
    require(hotBlockSalts >= 2, "hotBlockSalts must be at least 2")
    val w = maxDist + 1
    def band(c: Column): Column = floor(length(c) / lit(w)).cast(LongType)
    // left expands to its band neighbourhood; right keeps its own band —
    // a qualifying pair (|lenDiff| <= maxDist < w ⇒ bands differ by <= 1)
    // meets on the right row's band exactly once
    val a0 = left.select(
      Seq(col(idCol).as("_fz_a_id"), col(textCol).as("_fz_a_txt")) ++
        blockCols.map(c => col(c).as(s"_fz_a_$c")): _*)
      .withColumn("_fz_band",
        explode(array(band(col("_fz_a_txt")) - 1, band(col("_fz_a_txt")),
          band(col("_fz_a_txt")) + 1)))
    val b0 = right.select(
      Seq(col(idCol).as("_fz_b_id"), col(textCol).as("_fz_b_txt")) ++
        blockCols.map(c => col(c).as(s"_fz_b_$c")): _*)
      .withColumn("_fz_band", band(col("_fz_b_txt")))

    // ---- degenerate-block guard (opt-in: maxPairsPerBlock > 0) ----
    // Length banding + user blocking confine the quadratic, but nothing
    // above bounds ONE HOT BLOCK: a natural skewed key (every "the"-
    // initial title in a 100 TB catalog) concentrates |L_k|×|R_k|
    // Levenshtein calls on a single join key — one straggler task doing
    // the whole block while the cluster idles, or a silent week-long
    // job. The guard counts rows per (band × blockCols) key on each
    // side (two grid-sized aggregations — linear, nothing next to the
    // quadratic they police) and for keys whose candidate product
    // exceeds `maxPairsPerBlock` either fails loudly (`onHotBlock =
    // "fail"`, the hotColdJoin require posture: add a stronger blocking
    // key) or auto-salts (`"salt"`): hot-key left rows split over
    // `ceil(pairs / maxPairsPerBlock)` (capped at `hotBlockSalts`) salt
    // lanes by id hash, hot-key right rows replicate across the lanes —
    // every pair still meets exactly once, but as `s` parallel tasks
    // instead of one straggler. Total comparisons are unchanged (they
    // are the operator's semantics); what the salt buys is the 100-TB
    // survival property that no single task owns an unbounded block.
    val (a, b, saltCond) =
      if (maxPairsPerBlock <= 0L) (a0, b0, lit(true))
      else {
        val aKeyNames = "_fz_band" +: blockCols.map(c => s"_fz_a_$c")
        val bKeyNames = "_fz_band" +: blockCols.map(c => s"_fz_b_$c")
        def counted(df: DataFrame, names: Seq[String], cnt: String) =
          df.groupBy(names.zipWithIndex.map { case (n, i) =>
              col(n).as(s"_fz_k$i") }: _*)
            .agg(count(lit(1)).as(cnt))
        val kCols = aKeyNames.indices.map(i => s"_fz_k$i")
        // DOUBLE product for the threshold: two Long counts can each be
        // billions at the scale this guard polices, and a wrapped Long
        // product would read negative and silently disable the guard on
        // exactly the most degenerate key (precision loss at 2^53 pairs
        // is irrelevant against any sane bound)
        val pairsCol = col("_fz_an").cast("double") * col("_fz_bn").cast("double")
        val hot = counted(a0, aKeyNames, "_fz_an")
          .join(counted(b0, bKeyNames, "_fz_bn"), kCols.toSeq)
          .filter(pairsCol > maxPairsPerBlock.toDouble)
        if (onHotBlock == "fail") {
          // hot keys are driver-bounded by construction: each carries >
          // maxPairsPerBlock candidates, so at most total/max of them
          val offenders = hot.orderBy(pairsCol.desc)
            .limit(3).collect()
          require(offenders.isEmpty, {
            val shown = offenders.map { r =>
              val key = kCols.indices.map(i => String.valueOf(r.get(i))).mkString("/")
              val pairs = r.getAs[Long]("_fz_an").toDouble * r.getAs[Long]("_fz_bn")
              s"$key (~${pairs.toLong} candidate pairs)"
            }.mkString(", ")
            s"fuzzyJoin degenerate block(s) exceed maxPairsPerBlock=" +
              s"$maxPairsPerBlock: $shown — add a stronger blocking key " +
              "(blockCols), raise the bound, or use onHotBlock=\"salt\""
          })
          (a0, b0, lit(true))
        } else {
          val lanes = broadcast(hot.select(kCols.map(col) :+
            least(lit(hotBlockSalts.toLong),
              ceil(pairsCol / maxPairsPerBlock.toDouble)
                .cast(LongType)).as("_fz_salt_n"): _*))
          def joinLanes(df: DataFrame, names: Seq[String]) =
            df.join(lanes, names.zip(kCols).map { case (n, k) =>
                df(n) === lanes(k) }.reduce(_ && _), "left")
              .drop(kCols: _*)
          val aSalted = joinLanes(a0, aKeyNames)
            .withColumn("_fz_a_salt",
              when(col("_fz_salt_n").isNull, lit(0L))
                .otherwise(pmod(xxhash64(col("_fz_a_id")), col("_fz_salt_n"))))
            .drop("_fz_salt_n")
          val bSalted = joinLanes(b0, bKeyNames)
            .withColumn("_fz_b_salt",
              explode(when(col("_fz_salt_n").isNull, array(lit(0L)))
                .otherwise(sequence(lit(0L), col("_fz_salt_n") - 1))))
            .drop("_fz_salt_n")
          (aSalted, bSalted, col("_fz_a_salt") === col("_fz_b_salt"))
        }
      }

    val joined = a.join(b,
      a("_fz_band") === b("_fz_band") &&
        blockCols.map(c => col(s"_fz_a_$c") === col(s"_fz_b_$c"))
          .foldLeft(saltCond)(_ && _))
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
                      blockCols: Seq[String] = Nil,
                      maxPairsPerBlock: Long = 0L,
                      onHotBlock: String = "salt",
                      hotBlockSalts: Int = 32): DataFrame =
    fuzzyJoin(df, df, textCol, maxDist, idCol, blockCols,
      maxPairsPerBlock, onHotBlock, hotBlockSalts)
      .filter(col(s"a_$idCol") < col(s"b_$idCol"))
}
