package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Semi-structured column support: typed extraction from JSON string
  * columns (the `events.props` shape — every event system ships one).
  * Spark-native path: `from_json` with an explicit schema — the
  * JacksonParser projection, scan-parallel, no UDF; a malformed payload
  * yields a NULL struct (flagged, never an exception), so the operator
  * is total over dirty feeds — the Flag-strategy posture applied to
  * payload parsing.
  *
  * At 100 TB the explicit schema is the point: `schema_of_json`-style
  * inference is a second corpus scan and a schema-merge reduce; a
  * declared contract schema (the engine's whole philosophy) costs
  * neither. */
object JsonOps {

  /** The `events.props` payload contract: `{"k": <long>}`. */
  val PropsSchema: StructType = StructType(Seq(StructField("k", LongType)))

  /** Typed per-event extraction: `k` (null when absent or malformed)
    * plus a validity flag (false only for unparseable payloads —
    * a parseable object MISSING the key is valid with a null field,
    * the standard distinction). Pure projection, stream-admissible.
    *
    * Validity is probed with `try_parse_json` (variant parse, null only
    * on genuinely unparseable input), so ANY well-formed JSON payload —
    * object, array, scalar, bare `null` — counts as valid, matching the
    * TRY_CAST(... AS JSON) contract most SQL engines expose. PERMISSIVE
    * `from_json` into a STRUCT cannot express this (it never nulls), and
    * a MAP-typed probe would reject non-object JSON. Two parses of the
    * same string in one projection — both inside the same codegen
    * stage, and the JSON parse is the row's dominant cost either way. */
  def extractProps(events: DataFrame, fanOut: Boolean = true): DataFrame =
    // fanOut (r16): two JSON parses per row is compute-bound map work
    // over a small events scan (see Parallel.fan) — 30% faster fanned as
    // a standalone projection; [[propsStats]] opts out (its aggregation
    // already shuffles, and the extra exchange measured net-negative)
    (if (fanOut) Parallel.fan(events) else events)
      .select(col("event_id"), col("event_type"),
        from_json(col("props"), PropsSchema).as("_p"),
        try_parse_json(col("props")).isNotNull.as("valid_json"))
      .select(col("event_id"), col("event_type"),
        col("_p.k").as("k"), col("valid_json"))

  /** Payload-value distribution per event type over `k div bucketWidth`
    * buckets — the JSON-to-aggregation pipeline in one hop: parse
    * projection, then a grid-sized (type × bucket) aggregation. Null
    * `k` (absent key or malformed payload) is excluded; `n_distinct`
    * is exact (buckets are narrow by construction — width values at
    * most). */
  def propsStats(events: DataFrame, bucketWidth: Long = 10L): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    extractProps(events, fanOut = false)
      .filter(col("k").isNotNull)
      .groupBy(col("event_type"),
        expr(s"k div ${bucketWidth}L").as("k_bucket"))
      .agg(count(lit(1)).as("n"), countDistinct(col("k")).as("n_distinct"))
  }
}
