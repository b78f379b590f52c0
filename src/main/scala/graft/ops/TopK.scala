package graft.ops

import org.apache.spark.sql.{DataFrame, Encoder, Encoders, TypedColumn}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Typed top-k-per-key aggregation.
  *
  * The window formulation (`row_number over (partition by k order by s)
  * <= n`) shuffles EVERY row and fully sorts each partition — O(n log n)
  * per key and no map-side reduction. This `Aggregator` keeps a bounded
  * k-sized buffer, so Spark runs it with partial aggregation: each input
  * partition reduces to ≤ k rows per key before the shuffle, the exchange
  * carries O(keys × k) rows, and total work is O(n log k). At 100 TB of
  * scored candidates that is the difference between shuffling the
  * candidate set and shuffling the answer.
  *
  * Results are deterministic: ties on score break on the smaller id
  * (matching the `cosine DESC, id ASC` ordering the query surface uses).
  */
object TopK {

  /** (id, score) pair ordered by score desc, then id asc. */
  private def better(a: (Long, Double), b: (Long, Double)): Boolean =
    a._2 > b._2 || (a._2 == b._2 && a._1 < b._1)

  /** Insert into a descending-sorted bounded buffer. */
  private def insert(buf: List[(Long, Double)], x: (Long, Double), k: Int): List[(Long, Double)] = {
    val (pre, post) = buf.span(better(_, x))
    val merged = pre ::: (x :: post)
    if (merged.lengthCompare(k) > 0) merged.take(k) else merged
  }

  /** Aggregator over (key, id, score) tuples keeping the k best
    * (id, score) pairs. */
  final class TopKByScore(k: Int)
      extends Aggregator[(Long, Long, Double), List[(Long, Double)], Seq[(Long, Double)]] {
    override def zero: List[(Long, Double)] = Nil
    override def reduce(b: List[(Long, Double)], a: (Long, Long, Double)): List[(Long, Double)] =
      insert(b, (a._2, a._3), k)
    override def merge(x: List[(Long, Double)], y: List[(Long, Double)]): List[(Long, Double)] =
      y.foldLeft(x)((acc, e) => insert(acc, e, k))
    override def finish(r: List[(Long, Double)]): Seq[(Long, Double)] = r
    override def bufferEncoder: Encoder[List[(Long, Double)]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[List[(Long, Double)]]()
    override def outputEncoder: Encoder[Seq[(Long, Double)]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Long, Double)]]()
  }

  def topK(k: Int): TypedColumn[(Long, Long, Double), Seq[(Long, Double)]] =
    new TopKByScore(k).toColumn

  /** Bounded-buffer aggregator keeping the k SMALLEST ids — the
    * partial-aggregated replacement for `row_number over (partition by
    * key order by id) <= k`: each input partition reduces to ≤ k ids per
    * key before the exchange. Key-type agnostic (pair it with any
    * `groupByKey`). */
  final class MinKIds(k: Int) extends Aggregator[Long, List[Long], Seq[Long]] {
    private def ins(b: List[Long], x: Long): List[Long] = {
      val (pre, post) = b.span(_ < x)
      val merged = pre ::: (x :: post)
      if (merged.lengthCompare(k) > 0) merged.take(k) else merged
    }
    override def zero: List[Long] = Nil
    override def reduce(b: List[Long], a: Long): List[Long] = ins(b, a)
    override def merge(x: List[Long], y: List[Long]): List[Long] =
      y.foldLeft(x)(ins)
    override def finish(r: List[Long]): Seq[Long] = r
    override def bufferEncoder: Encoder[List[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[List[Long]]()
    override def outputEncoder: Encoder[Seq[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
  }

  def minKIds(k: Int): TypedColumn[Long, Seq[Long]] = new MinKIds(k).toColumn

  /** [[MinKIds]] with SET semantics: the k smallest DISTINCT values per
    * key. This is the KMV ("k minimum values") sketch buffer — a bounded
    * distinct-cardinality summary with the same partial-aggregation scale
    * shape as the other bounded buffers here: each input partition
    * reduces to ≤ k values before the exchange, so estimating distinct
    * counts over 100 TB shuffles O(keys × k) longs, never the value
    * stream. A duplicate insert is a no-op (membership check is O(log k)
    * against the sorted buffer), which is exactly what makes the buffer a
    * function of the value SET — merge order cannot change the result. */
  final class MinKDistinct(k: Int) extends Aggregator[Long, List[Long], Seq[Long]] {
    private def ins(b: List[Long], x: Long): List[Long] = {
      val (pre, post) = b.span(_ < x)
      post match {
        case h :: _ if h == x => b
        case _ =>
          val merged = pre ::: (x :: post)
          if (merged.lengthCompare(k) > 0) merged.take(k) else merged
      }
    }
    override def zero: List[Long] = Nil
    override def reduce(b: List[Long], a: Long): List[Long] = ins(b, a)
    override def merge(x: List[Long], y: List[Long]): List[Long] =
      y.foldLeft(x)(ins)
    override def finish(r: List[Long]): Seq[Long] = r
    override def bufferEncoder: Encoder[List[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[List[Long]]()
    override def outputEncoder: Encoder[Seq[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
  }

  def minKDistinct(k: Int): TypedColumn[Long, Seq[Long]] = new MinKDistinct(k).toColumn

  /** Bounded-buffer aggregator keeping the k smallest `(sortKey, id)`
    * pairs ordered `(sortKey ASC, id ASC)` — [[MinKIds]] with the sort key
    * decoupled from the returned id, so "k lowest-HASH rows per stratum"
    * (deterministic sampling) costs O(keys × k) through the exchange
    * instead of a full window sort. Sort keys stay `Long` end to end: a
    * 60-bit hash cast to double would lose low bits (2^53 mantissa) and
    * silently reorder near ties. */
  final class MinKPairs(k: Int)
      extends Aggregator[(Long, Long), List[(Long, Long)], Seq[(Long, Long)]] {
    private def less(a: (Long, Long), b: (Long, Long)): Boolean =
      a._1 < b._1 || (a._1 == b._1 && a._2 < b._2)
    private def ins(b: List[(Long, Long)], x: (Long, Long)): List[(Long, Long)] = {
      val (pre, post) = b.span(less(_, x))
      val merged = pre ::: (x :: post)
      if (merged.lengthCompare(k) > 0) merged.take(k) else merged
    }
    override def zero: List[(Long, Long)] = Nil
    override def reduce(b: List[(Long, Long)], a: (Long, Long)): List[(Long, Long)] = ins(b, a)
    override def merge(x: List[(Long, Long)], y: List[(Long, Long)]): List[(Long, Long)] =
      y.foldLeft(x)(ins)
    override def finish(r: List[(Long, Long)]): Seq[(Long, Long)] = r
    override def bufferEncoder: Encoder[List[(Long, Long)]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[List[(Long, Long)]]()
    override def outputEncoder: Encoder[Seq[(Long, Long)]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Long, Long)]]()
  }

  def minKPairs(k: Int): TypedColumn[(Long, Long), Seq[(Long, Long)]] =
    new MinKPairs(k).toColumn

  /** Top-k rows per key of `(key, id, score)`, returned flat with ranks —
    * same shape and tiebreaks as the row_number window formulation, but
    * partial-aggregated before the shuffle.
    *
    * NaN scores are EXCLUDED up front: `better`'s primitive comparisons
    * are never true for NaN, so a NaN entering the buffer would neither
    * rank consistently nor sort stably — its final position would depend
    * on partition arrival order, i.e. be non-deterministic across
    * shuffles. (A row_number window would instead rank NaN first under
    * Spark's NaN-greatest ordering; for score-ranked search results,
    * dropping undefined scores is the saner contract. Null scores are
    * likewise dropped.) */
  def topKPerKey(df: DataFrame, keyCol: String, idCol: String,
                 scoreCol: String, k: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(keyCol).cast("long"), col(idCol).cast("long"), col(scoreCol).cast("double"))
      .filter(col(scoreCol).isNotNull && !isnan(col(scoreCol)))
      .as[(Long, Long, Double)]
      .groupByKey(_._1)
      .agg(topK(k))
      .toDF("key", "top")
      .select(col("key").as(keyCol),
        posexplode(col("top")).as(Seq("rank0", "entry")))
      .select(col(keyCol),
        col("entry._1").as(idCol),
        (col("rank0") + 1).cast("long").as("rank"),
        col("entry._2").as(scoreCol))
  }

  /** String-id pair ordered by score desc, then id asc. Java's UTF-16
    * code-unit comparison equals UTF-8 byte order for BMP text — only
    * supplementary-plane ids (emoji etc.) would tie-break differently
    * from a byte-collated engine. */
  private def betterStr(a: (String, Double), b: (String, Double)): Boolean =
    a._2 > b._2 || (a._2 == b._2 && a._1 < b._1)

  private def insertStr(buf: List[(String, Double)], x: (String, Double),
                        k: Int): List[(String, Double)] = {
    val (pre, post) = buf.span(betterStr(_, x))
    val merged = pre ::: (x :: post)
    if (merged.lengthCompare(k) > 0) merged.take(k) else merged
  }

  /** [[TopKByScore]] with string ids — for term/token-keyed rankings
    * where the id is text, not a numeric surrogate. */
  final class TopKByScoreStr(k: Int)
      extends Aggregator[(Long, String, Double), List[(String, Double)], Seq[(String, Double)]] {
    override def zero: List[(String, Double)] = Nil
    override def reduce(b: List[(String, Double)], a: (Long, String, Double)): List[(String, Double)] =
      insertStr(b, (a._2, a._3), k)
    override def merge(x: List[(String, Double)], y: List[(String, Double)]): List[(String, Double)] =
      y.foldLeft(x)((acc, e) => insertStr(acc, e, k))
    override def finish(r: List[(String, Double)]): Seq[(String, Double)] = r
    override def bufferEncoder: Encoder[List[(String, Double)]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[List[(String, Double)]]()
    override def outputEncoder: Encoder[Seq[(String, Double)]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(String, Double)]]()
  }

  def topKStr(k: Int): TypedColumn[(Long, String, Double), Seq[(String, Double)]] =
    new TopKByScoreStr(k).toColumn

  /** [[topKPerKey]] for string ids: top-k `(key, id, score)` rows per key
    * with ranks, `score DESC, id ASC` tiebreaks, partial-aggregated
    * (O(keys × k) through the exchange). NaN/null scores are dropped for
    * the same determinism reason as [[topKPerKey]]; null ids are dropped
    * (a null id cannot tie-break deterministically). */
  def topKPerKeyStr(df: DataFrame, keyCol: String, idCol: String,
                    scoreCol: String, k: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(keyCol).cast("long"), col(idCol).cast("string"), col(scoreCol).cast("double"))
      .filter(col(scoreCol).isNotNull && !isnan(col(scoreCol)) && col(idCol).isNotNull)
      .as[(Long, String, Double)]
      .groupByKey(_._1)
      .agg(topKStr(k))
      .toDF("key", "top")
      .select(col("key").as(keyCol),
        posexplode(col("top")).as(Seq("rank0", "entry")))
      .select(col(keyCol),
        col("entry._1").as(idCol),
        (col("rank0") + 1).cast("long").as("rank"),
        col("entry._2").as(scoreCol))
  }
}
