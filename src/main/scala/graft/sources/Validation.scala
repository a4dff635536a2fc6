package graft.sources

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * Ingest validation rules (reference atlas-core core/validation/: KeyLength,
 * ValueLength, MaxUserTags, ReservedKey, ValidCharacters, HasKey, plus the
 * config-driven KeyPatternRule / ValuePatternRule / NameValueLengthRule).
 * Two forms: a scalar validator for request-path use, and a Column
 * predicate so streaming/batch ingest can filter (or route to a
 * dead-letter sink) without leaving codegen. StreamRunner.ingestDlq feeds
 * both: the Column form selects rejects, the scalar form writes their
 * human-readable reasons.
 */
object Validation {

  /**
   * @param keyPattern       optional configured key regex
   *                         (KeyPatternRule analog,
   *                         core/validation/KeyPatternRule.scala) — applied
   *                         ON TOP of `charPattern`; anchored full-match
   * @param valuePattern     optional configured value regex
   *                         (ValuePatternRule analog)
   * @param nameValueLength  optional (min, max) length bounds for the VALUE
   *                         of the `name` key, independent of other values
   *                         (NameValueLengthRule analog,
   *                         core/validation/NameValueLengthRule.scala);
   *                         None = `name` follows the common bounds
   */
  final case class Rules(
      minKeyLength: Int = 2,
      maxKeyLength: Int = 60,
      maxValueLength: Int = 120,
      maxUserTags: Int = 20,
      reservedPrefixes: List[String] = List("atlas.", "nf."),
      allowedReserved: Set[String] = Set("atlas.dstype", "nf.app", "nf.cluster", "nf.node"),
      charPattern: String = "^[-._A-Za-z0-9]+$",
      requiredKeys: List[String] = List("name"),
      keyPattern: Option[String] = None,
      valuePattern: Option[String] = None,
      nameValueLength: Option[(Int, Int)] = None
  )

  val default: Rules = Rules()

  /** Force full-match semantics onto a possibly-unanchored pattern so the
    * Column `rlike` (find semantics) agrees with the scalar `matches`. */
  private def anchored(p: String): String = "^(?:" + p + ")$"

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
      // empty values are invalid regardless of a configured min of 0 —
      // the clamp keeps the scalar reasons and the Column predicate in
      // lockstep (the unconditional "value empty" below would otherwise
      // reject what a min-0 Column bound accepts)
      val (vMin, vMax) = {
        val (mn, mx) =
          if (k == "name") rules.nameValueLength.getOrElse((1, rules.maxValueLength))
          else (1, rules.maxValueLength)
        (math.max(1, mn), mx)
      }
      if (v.length > vMax) issues += s"value too long: [$k]"
      if (v.isEmpty) issues += s"value empty: [$k]"
      else if (v.length < vMin) issues += s"value too short: [$k]"
      if (!k.matches(rules.charPattern)) issues += s"invalid characters in key: [$k]"
      if (!v.matches(rules.charPattern)) issues += s"invalid characters in value: [$k]=[$v]"
      rules.keyPattern.foreach(p =>
        if (!k.matches(p)) issues += s"key doesn't match pattern '$p': [$k]")
      rules.valuePattern.foreach(p =>
        if (!v.matches(p)) issues += s"value doesn't match pattern '$p': [$k]=[$v]")
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
    val (nameMin0, nameMax) = rules.nameValueLength.getOrElse((1, rules.maxValueLength))
    val nameMin = math.max(1, nameMin0) // empty never passes; matches the scalar
    val perEntry = forall(entries, { e =>
      val k = e.getField("key")
      val v = e.getField("value")
      val reservedOk = rules.reservedPrefixes.map(p => !k.startsWith(p)).reduce(_ && _) ||
        k.isin(rules.allowedReserved.toSeq: _*)
      val vLenOk = when(k === "name", length(v).between(nameMin, nameMax))
        .otherwise(length(v).between(1, rules.maxValueLength))
      val keyPatOk = rules.keyPattern.map(p => k.rlike(anchored(p))).getOrElse(lit(true))
      val valPatOk = rules.valuePattern.map(p => v.rlike(anchored(p))).getOrElse(lit(true))
      length(k).between(rules.minKeyLength, rules.maxKeyLength) &&
        vLenOk &&
        k.rlike(rules.charPattern) && v.rlike(rules.charPattern) &&
        keyPatOk && valPatOk &&
        reservedOk
    })
    (userTags <= rules.maxUserTags) && required && perEntry
  }
}
