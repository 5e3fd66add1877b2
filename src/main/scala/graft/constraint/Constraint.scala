package graft.constraint

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Declarative constraint ADT — the engine analog of a draft-07 JSONSchema
  * document (/root/reference/test/schemas/test/0.0.1). Each check compiles to
  * a codegen-friendly `Column` predicate; details carry AJV-parity messages
  * (`'<dataPath>' <message>`, /root/reference/lib/error.js:42-47, golden
  * string "'.test' should be string" at
  * /root/reference/test/spec.test.yaml:124).
  *
  * Null policy mirrors AJV: an absent (null) value only violates `NonNull`
  * (`required`); every other keyword passes on null — exactly how a missing
  * property skips `pattern`/`maxLength`/... in JSONSchema.
  */
sealed trait Check extends Serializable {
  def field: String
  /** Constraint id — goes into the violation row verbatim. */
  def id: String
  /** TRUE ⇔ the row passes this check. Must be null-safe (never null). */
  def passes: Column
  /** AJV-style message (static ⇒ constant-folded by Catalyst). */
  def message: String
  /** AJV dataPath ('' for required-at-root, '.field' otherwise). */
  def dataPath: String = s".$field"
  final def detail: Column = lit(s"'$dataPath' $message")
  protected final def c: Column = col(field)
}

/** `required` (/root/reference/test/schemas/test/0.0.1:31-33). */
final case class NonNull(field: String) extends Check {
  val id = s"non_null($field)"
  def passes: Column = c.isNotNull
  def message = s"should have required property '$field'"
  override def dataPath = ""
}

/** JSONSchema `minimum` — north-rule range(w,h) lower bound. */
final case class Minimum(field: String, lo: Long) extends Check {
  val id = s"min($field)"
  def passes: Column = c.isNull || c >= lo
  def message = s"should be >= $lo"
}

/** JSONSchema `maximum` — north-rule range(w,h) upper bound. */
final case class Maximum(field: String, hi: Long) extends Check {
  val id = s"max($field)"
  def passes: Column = c.isNull || c <= hi
  def message = s"should be <= $hi"
}

/** `enum` whitelist — north-rule fmt ∈ {...}; ancestor: stream-allowlist
  * (/root/reference/test/schemas/stream-config.test.yaml:1-8).
  */
final case class IsIn(field: String, allowed: Seq[String]) extends Check {
  val id = s"whitelist($field)"
  def passes: Column = c.isNull || c.isin(allowed: _*)
  def message = "should be equal to one of the allowed values"
}

/** `minLength` (/root/reference/test/schemas/error/0.0.1:21) — caption_nonempty. */
final case class MinLength(field: String, n: Int) extends Check {
  val id = s"min_length($field)"
  def passes: Column = c.isNull || length(c) >= n
  def message = s"should NOT be shorter than $n characters"
}

/** `maxLength` (/root/reference/test/schemas/test/0.0.1:24). */
final case class MaxLength(field: String, n: Int) extends Check {
  val id = s"max_length($field)"
  def passes: Column = c.isNull || length(c) <= n
  def message = s"should NOT be longer than $n characters"
}

/** `pattern` (/root/reference/test/schemas/test/0.0.1:23). Security lint
  * (ConstraintSet.lint) requires a MaxLength on the same field, mirroring
  * json-schema-secure (/root/reference/lib/EventValidator.js:188-195).
  */
final case class Pattern(field: String, regex: String) extends Check {
  val id = s"pattern($field)"
  def passes: Column = c.isNull || c.rlike(regex)
  def message = s"""should match pattern "$regex""""
}

/** `format: date-time` (/root/reference/test/schemas/test/0.0.1:28). */
final case class DateTimeFormat(field: String) extends Check {
  val id = s"format($field)"
  def passes: Column = c.isNull || to_timestamp(c).isNotNull
  def message = """should match format "date-time""""
}

/** `type` conformance on a raw JSON payload column, via Spark 4 VARIANT:
  * reproduces AJV's "'.test' should be string"
  * (/root/reference/test/spec.test.yaml:120-124). `field` is the JSON key;
  * `rawCol` the column holding the raw JSON event text.
  */
final case class JsonTypeIs(field: String, jsonType: String, rawCol: String) extends Check {
  val id = s"type($field)"
  def passes: Column = {
    val v = try_variant_get(try_parse_json(col(rawCol)), s"$$.$field", "variant")
    v.isNull || upper(schema_of_variant(v)) === jsonType.toUpperCase
  }
  def message = s"should be ${jsonType.toLowerCase}"
}

/** Arbitrary Column predicate escape hatch (the reference's injectable
  * `validate` function, /root/reference/lib/eventgate.js:157-166).
  */
final case class Predicate(field: String, id: String, passes: Column, message: String) extends Check

/** `default` fill — AJV useDefaults MUTATES the event
  * (/root/reference/lib/EventValidator.js:29-33, asserted at
  * test/features/lib/EventValidator.js:116-118): validation rewrites rows,
  * applied BEFORE checks.
  */
final case class DefaultFill(field: String, default: Any) extends Serializable {
  def apply(in: Column): Column = coalesce(in, lit(default))
}

/** A versioned constraint set — the analog of one compiled JSONSchema at a
  * fixed URI. Version id flows into lineage (snapshot manifest), replacing
  * the per-event `$schema` URI of the reference (fixed-schema table ⇒ one
  * constraint-set per snapshot, SURVEY.md §1.3).
  */
final case class ConstraintSet(version: String, fills: Seq[DefaultFill], checks: Seq[Check]) {

  /** Static lint pass before compilation — the json-schema-secure gate
    * analog (/root/reference/lib/EventValidator.js:140-141,188-195):
    * pattern/format checks on unbounded strings are pathological at scale.
    * Returns problems; empty = secure.
    */
  def lint: Seq[String] = {
    val bounded = checks.collect { case MaxLength(f, _) => f }.toSet
    checks.collect {
      case Pattern(f, _) if !bounded(f) =>
        s"pattern($f) without maxLength($f) — rejected by secure lint"
      case DateTimeFormat(f) if !bounded(f) =>
        s"format($f) without maxLength($f) — rejected by secure lint"
    }
  }

  def require(field: String): ConstraintSet = copy(checks = checks :+ NonNull(field))
}

object Compiler {
  import org.apache.spark.sql.DataFrame

  /** One violation struct per failed check, or null — all under ONE
    * projection so every constraint is evaluated per row with no
    * short-circuit, matching AJV `allErrors: true`
    * (/root/reference/lib/EventValidator.js:29-33). Catalyst CSE dedups
    * shared subexpressions (e.g. repeated `length(caption)`).
    */
  def violationsArray(cs: ConstraintSet): Column = {
    val cells = cs.checks.map { ck =>
      when(
        !ck.passes,
        struct(
          lit(ck.id).as("constraint_id"),
          lit(ck.field).as("field"),
          ck.detail.as("detail")
        )
      )
    }
    array_compact(array(cells: _*))
  }

  /** TRUE ⇔ the row passes every check — a pure boolean conjunction with no
    * array/struct allocation. Kept separate from [[violationsArray]] so the
    * pass/fail decision (evaluated for EVERY row) stays allocation-free and
    * the violation details (structs) materialize only under a
    * `status = invalid` filter — i.e. for the ~1% failing minority. At
    * 10^12 rows this is the difference between a scan-speed hot path and
    * one that allocates a struct array per row.
    */
  def allPass(cs: ConstraintSet): Column =
    cs.checks.map(_.passes).reduceOption(_ && _).getOrElse(lit(true))

  /** Apply default fills (row REWRITE, not read-only) then compute the
    * violations array — the single per-partition pass of the north_star.
    */
  def run(df: DataFrame, cs: ConstraintSet, violationsCol: String = "violations"): DataFrame = {
    val problems = cs.lint
    require(problems.isEmpty, s"insecure constraint set: ${problems.mkString("; ")}")
    val filled = applyFills(df, cs)
    filled.withColumn(violationsCol, violationsArray(cs))
  }

  def applyFills(df: DataFrame, cs: ConstraintSet): DataFrame =
    cs.fills.foldLeft(df)((d, f) => d.withColumn(f.field, f(col(f.field))))
}
