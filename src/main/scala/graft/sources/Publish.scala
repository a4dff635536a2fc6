package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/**
 * Publish-payload decoding (reference atlas-webapi PublishApi: a JSON batch
 * of datapoints `{"tags": {...common...}, "metrics": [{"tags": {...},
 * "timestamp": ms, "value": v}, ...]}`, where batch-level tags apply to
 * every metric and metric tags win on conflict).
 *
 * `parse` turns a frame of raw JSON payload strings (a Kafka value column,
 * an HTTP-ingest log, a file stream) into the engine's canonical datapoint
 * frame. Everything is column expressions (from_json + explode + map
 * merge), so it runs identically over a batch frame or a readStream and
 * stays inside the scan projection at 100 TB/day ingest volumes:
 *
 *  - malformed JSON -> from_json yields null -> row dropped;
 *  - metrics missing timestamp/value -> dropped;
 *  - tag-rule validation (charset, count, length caps — the reference's
 *    validation rules, sources/Validation.scala) drops invalid series.
 */
object Publish {

  /** PublishApi batch payload schema. */
  val payloadSchema: StructType = StructType.fromDDL(
    "tags MAP<STRING,STRING>, " +
      "metrics ARRAY<STRUCT<tags: MAP<STRING,STRING>, timestamp: BIGINT, value: DOUBLE>>")

  /**
   * Decode a payload-string column to canonical datapoints
   * (tags, ts, value). Batch-level tags merge under metric tags
   * (PublishApi semantics: the metric's own tags win on conflict).
   */
  def parse(payloads: DataFrame, payloadCol: String = "payload"): DataFrame = {
    val parsed = payloads
      .select(from_json(col(payloadCol), payloadSchema).as("p"))
      .filter(col("p").isNotNull && col("p.metrics").isNotNull)
      .select(coalesce(col("p.tags"), map()).as("common"), explode(col("p.metrics")).as("m"))
    val mtags = coalesce(col("m.tags"), map())
    // metric tags override batch tags; map_concat rejects duplicate keys, so
    // drop the overridden batch entries first (ingest-side only — the
    // map_filter pushdown caveat doesn't apply to a JSON payload scan)
    val merged = map_concat(
      map_filter(col("common"), (k, _) => !array_contains(map_keys(mtags), k)),
      mtags)
    parsed
      .select(
        merged.as("tags"),
        col("m.timestamp").as("ts"),
        col("m.value").as("value"))
      .filter(col("ts").isNotNull && col("value").isNotNull)
      .filter(Validation.validTags(col("tags")))
  }

  /**
   * Decode a Smile (binary JSON) payload column to canonical datapoints —
   * the second wire format the reference's publish endpoint accepts
   * (PublishApi handles both `application/json` and
   * `application/x-jackson-smile` bodies). Payload bytes transcode to JSON
   * text in a partition-local kernel ([[Smile.decode]], clean-room decoder
   * of the public format spec) and then flow through the EXACT same
   * [[parse]] pipeline — schema coercion, batch/metric tag merge,
   * validation — so the two formats can never drift. Undecodable payloads
   * are dropped like malformed JSON.
   */
  def parseSmile(payloads: DataFrame, payloadCol: String = "payload"): DataFrame = {
    val spark = payloads.sparkSession
    import spark.implicits._
    val json = payloads
      .select(col(payloadCol).cast("binary").as("b"))
      .as[Array[Byte]]
      .mapPartitions(it => it.flatMap(b => Smile.decode(b).map(Smile.toJson)))
      .toDF("payload")
    parse(json, "payload")
  }
}
