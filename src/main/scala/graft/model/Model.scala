package graft.model

/** Core row types of the validation engine.
  *
  * The "event" of the reference (a parsed JSON object,
  * /root/reference/README.md:10-12) becomes a row of a fixed-schema
  * image+caption table (BASELINE.json `input_hint`):
  * (image_id, bytes, w, h, fmt, caption, phash).
  */
final case class ImageRow(
    image_id: String,
    bytes: Array[Byte],
    w: Int,
    h: Int,
    fmt: String,
    caption: String,
    phash: Long
)

/** One (row, violated constraint) pair — the analog of one AJV error inside
  * the reference's `ValidationError.errors` array
  * (/root/reference/lib/error.js:36-48). `detail` preserves the reference's
  * errorsText format: `'<dataPath>' <message>`
  * (/root/reference/lib/error.js:45, golden string at
  * /root/reference/test/spec.test.yaml:124).
  */
final case class ViolationRow(
    snapshot_id: String,
    partition_id: Int,
    image_id: String,
    constraint_id: String,
    field: String,
    detail: String,
    status: String // "invalid" (constraint violation) | "error" (engine failure)
)

/** Per-partition triage rollup — the batch analog of the reference's HTTP
  * status matrix (/root/reference/routes/events.js:95-144): counts per
  * status per partition, all three statuses always present
  * (/root/reference/lib/eventgate.js:230-232).
  */
final case class RollupRow(
    snapshot_id: String,
    partition_id: Int,
    n_success: Long,
    n_invalid: Long,
    n_error: Long
)

object Status {
  /** Mirrors EventStatus.STATUSES (/root/reference/lib/eventgate.js:72-76). */
  val Success = "success"
  val Invalid = "invalid"
  val Error = "error"
  val All: Seq[String] = Seq(Success, Invalid, Error)
}
