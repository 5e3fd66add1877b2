package graft.engine

import org.apache.spark.sql.functions.col

import graft.constraint._
import graft.functions.StringPreds

/** Constraint set v1 for the image+caption table — the engine's analog of
  * /root/reference/test/schemas/test/0.0.1 transplanted onto the image
  * schema (SURVEY.md §2.3 constraint catalog).
  */
object ImageConstraints {

  /** uuid pattern, ancestor /root/reference/test/schemas/test/0.0.1:23-24. */
  val UuidRe = "^[0-9a-f]{8}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{12}$"

  val AllowedFmts: Seq[String] = Seq("png", "jpeg")

  /** The uuid `pattern` check via the injectable-predicate escape hatch
    * (the reference's pluggable `validate`, lib/eventgate.js:157-166):
    * identical id/message/null semantics to `Pattern("image_id", UuidRe)`,
    * but evaluated by the codegen'd byte-loop [[graft.functions.UuidLike]]
    * instead of java.util.regex — the regex was ~40% of the whole validate
    * pipeline's CPU (equivalence property-tested in EngineSpec).
    */
  private val uuidPattern = Predicate(
    "image_id",
    "pattern(image_id)",
    col("image_id").isNull || StringPreds.uuidLike(col("image_id")),
    s"""should match pattern "$UuidRe""""
  )

  val v1: ConstraintSet = ConstraintSet(
    version = "image-constraints/1.0.0",
    fills = Seq(DefaultFill("fmt", "png")), // `default:` fill, test/0.0.1:37-39
    checks = Seq(
      NonNull("image_id"),
      NonNull("caption"),
      uuidPattern,
      MaxLength("image_id", 36), // bounded-length companion of the pattern
      Minimum("w", 1),
      Maximum("w", 16384),
      Minimum("h", 1),
      Maximum("h", 16384),
      IsIn("fmt", AllowedFmts),
      MinLength("caption", 1),
      MaxLength("caption", 1024)
    )
  )
}
