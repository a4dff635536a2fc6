package graft.sources

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * Ingest validation rules (reference atlas-core core/validation/: KeyLength,
 * ValueLength, MaxUserTags, ReservedKey, ValidCharacters, HasKey). Two
 * forms: a scalar validator for request-path use, and a Column predicate so
 * streaming/batch ingest can filter (or route to a dead-letter sink)
 * without leaving codegen.
 */
object Validation {

  final case class Rules(
      minKeyLength: Int = 2,
      maxKeyLength: Int = 60,
      maxValueLength: Int = 120,
      maxUserTags: Int = 20,
      reservedPrefixes: List[String] = List("atlas.", "nf."),
      allowedReserved: Set[String] = Set("atlas.dstype", "nf.app", "nf.cluster", "nf.node"),
      charPattern: String = "^[-._A-Za-z0-9]+$",
      requiredKeys: List[String] = List("name")
  )

  val default: Rules = Rules()

  /** Scalar validation: list of human-readable issues, empty = valid. */
  def validate(tags: Map[String, String], rules: Rules = default): List[String] = {
    val issues = List.newBuilder[String]
    val userTags = tags.keys.count(k => !rules.reservedPrefixes.exists(k.startsWith))
    if (userTags > rules.maxUserTags)
      issues += s"too many user tags: $userTags > ${rules.maxUserTags}"
    rules.requiredKeys.filterNot(tags.contains).foreach(k => issues += s"missing key: $k")
    tags.foreach { case (k, v) =>
      if (k.length > rules.maxKeyLength) issues += s"key too long: [$k]"
      if (k.length < rules.minKeyLength) issues += s"key too short: [$k]"
      if (v.length > rules.maxValueLength) issues += s"value too long: [$k]"
      if (v.isEmpty) issues += s"value empty: [$k]"
      if (!k.matches(rules.charPattern)) issues += s"invalid characters in key: [$k]"
      if (!v.matches(rules.charPattern)) issues += s"invalid characters in value: [$k]=[$v]"
      if (rules.reservedPrefixes.exists(k.startsWith) && !rules.allowedReserved.contains(k))
        issues += s"unknown reserved key: [$k]"
    }
    issues.result()
  }

  /** Column predicate: true iff a `tags: map<string,string>` value passes. */
  def validTags(tags: Column, rules: Rules = default): Column = {
    val entries = map_entries(tags)
    val userTags = size(filter(entries, e =>
      rules.reservedPrefixes.map(p => !e.getField("key").startsWith(p)).reduce(_ && _)))
    val required = rules.requiredKeys
      .map(k => tags.getItem(k).isNotNull)
      .foldLeft(lit(true))(_ && _)
    val perEntry = forall(entries, { e =>
      val k = e.getField("key")
      val v = e.getField("value")
      val reservedOk = rules.reservedPrefixes.map(p => !k.startsWith(p)).reduce(_ && _) ||
        k.isin(rules.allowedReserved.toSeq: _*)
      length(k).between(rules.minKeyLength, rules.maxKeyLength) &&
        length(v).between(1, rules.maxValueLength) &&
        k.rlike(rules.charPattern) && v.rlike(rules.charPattern) &&
        reservedOk
    })
    (userTags <= rules.maxUserTags) && required && perEntry
  }
}
