package graft.engine

import graft.constraint._

/** Constraint set v1 for the image+caption table — the engine's analog of
  * /root/reference/test/schemas/test/0.0.1 transplanted onto the image
  * schema (SURVEY.md §2.3 constraint catalog).
  */
object ImageConstraints {

  /** uuid pattern, ancestor /root/reference/test/schemas/test/0.0.1:23-24. */
  val UuidRe = "^[0-9a-f]{8}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{12}$"

  val AllowedFmts: Seq[String] = Seq("png", "jpeg")

  val v1: ConstraintSet = ConstraintSet(
    version = "image-constraints/1.0.0",
    fills = Seq(DefaultFill("fmt", "png")), // `default:` fill, test/0.0.1:37-39
    checks = Seq(
      NonNull("image_id"),
      NonNull("caption"),
      Pattern("image_id", UuidRe),
      MaxLength("image_id", 36), // secure-lint companion of the pattern
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
