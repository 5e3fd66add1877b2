package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.constraint.{Compiler, ConstraintSet}
import graft.model.Status

/** Registry of compiled constraint sets — the batch analog of the
  * reference's validator cache (/root/reference/lib/EventValidator.js:221-258).
  *
  * `routes` maps a stream/URI value to a set version the way the AJV cache
  * maps BOTH the request URI and the schema's `$id` to one compiled
  * validator (dual-key cache, asserted at
  * /root/reference/test/features/lib/EventValidator.js:130-146): many route
  * keys may point at the same compiled set, and two sets with different
  * versions coexist without conflict
  * (/root/reference/test/features/lib/EventValidator.js:187-208).
  *
  * Route-key grammar follows the reference's stream-config semantics
  * (/root/reference/lib/event-util.js:89-97): a key wrapped in slashes
  * (`/^mediawiki\..+/`) is a regex tested unanchored; anything else is an
  * exact key. Exact beats regex; regexes match in deterministic order
  * (explicit `regexRoutes` first, in declaration order, then slash-wrapped
  * `routes` keys sorted). `baseUris`/`uriExtension` give the
  * uriGetFirstObject fallback chain
  * (/root/reference/lib/factories/default-eventgate.js:167-189): an
  * unrouted subject is resolved against each base (+extension when missing)
  * and the first registered candidate wins.
  */
final case class ConstraintRegistry(
    sets: Seq[ConstraintSet],
    routes: Map[String, String],
    regexRoutes: Seq[(String, String)] = Nil,
    baseUris: Seq[String] = Nil,
    uriExtension: String = ""
) {
  val byVersion: Map[String, ConstraintSet] = sets.map(cs => cs.version -> cs).toMap
  require(byVersion.size == sets.size, "duplicate constraint-set versions in registry")

  private def isRegexKey(k: String) = k.length >= 2 && k.startsWith("/") && k.endsWith("/")

  /** Exact-match routes (non-slash-wrapped keys). */
  val exactRoutes: Map[String, String] = routes.filterNot { case (k, _) => isRegexKey(k) }

  /** Ordered regex routes: explicit ones first, then slash-wrapped `routes`
    * keys (sorted for determinism — Map iteration order is unspecified).
    *
    * DELIBERATE ordering divergence from the reference: stream-config tests
    * regex routes in DECLARATION order, which a Scala `Map` cannot carry —
    * slash-wrapped `routes` keys are therefore ordered lexicographically.
    * A config whose regexes overlap (first-match-sensitive) must pass them
    * through `regexRoutes`, which IS declaration-ordered end-to-end and
    * always consulted before the map-sourced keys.
    */
  val allRegexRoutes: Seq[(String, String)] =
    regexRoutes ++ routes.collect { case (k, v) if isRegexKey(k) => (k.substring(1, k.length - 1), v) }.toSeq.sorted

  require(
    (exactRoutes.values ++ allRegexRoutes.map(_._2)).forall(byVersion.contains), {
      val bad = (exactRoutes.values ++ allRegexRoutes.map(_._2)).filterNot(byVersion.contains).toSet
      s"routes point at unregistered versions: $bad"
    }
  )

  /** Shared row-level resolver (driver API + codegen'd [[graft.functions.StreamRoute]]). */
  lazy val resolver: graft.functions.StreamRouteResolver =
    new graft.functions.StreamRouteResolver(exactRoutes, allRegexRoutes, baseUris, uriExtension)

  def resolve(stream: String): Option[ConstraintSet] =
    Option(resolver.resolveString(stream)).map(byVersion)
}

object ConstraintRegistry {
  /** Register sets routable by their own version ids (URI = `$id` case). */
  def of(sets: ConstraintSet*): ConstraintRegistry =
    ConstraintRegistry(sets, sets.map(cs => cs.version -> cs.version).toMap)

  /** DECLARATION-ORDERED registry — full reference parity for overlapping
    * regex routes: stream-config tests regexes in declaration order
    * (/root/reference/lib/event-util.js:89-97 over
    * test/schemas/stream-config.test.yaml), which a Scala `Map` cannot
    * carry (the case-class constructor therefore orders slash-keys
    * lexicographically, documented divergence). This factory keeps every
    * slash-wrapped key exactly where it was declared in `routes` — the
    * first matching regex wins, as in the reference.
    */
  def ordered(
      sets: Seq[ConstraintSet],
      routes: Seq[(String, String)],
      baseUris: Seq[String] = Nil,
      uriExtension: String = ""
  ): ConstraintRegistry = {
    def isRegexKey(k: String) = k.length >= 2 && k.startsWith("/") && k.endsWith("/")
    val (regex, exact) = routes.partition { case (k, _) => isRegexKey(k) }
    require(exact.map(_._1).distinct.size == exact.size,
      s"duplicate exact route keys: ${exact.map(_._1).diff(exact.map(_._1).distinct).distinct}")
    ConstraintRegistry(sets, exact.toMap,
      regex.map { case (k, v) => (k.substring(1, k.length - 1), v) }, baseUris, uriExtension)
  }

  /** Stream-name extraction + sanitization parity
    * (/root/reference/lib/factories/default-eventgate.js:132-152): prefer an
    * explicit stream field, else the schema URI with `[^A-Za-z0-9_.-]` → `_`
    * and leading underscores stripped.
    */
  def extractStream(streamField: Option[Column], schemaUri: Column): Column = {
    val sanitized =
      regexp_replace(regexp_replace(schemaUri, "[^A-Za-z0-9_.-]", "_"), "^_+", "")
    streamField.map(f => coalesce(f, sanitized)).getOrElse(sanitized)
  }
}

/** Per-stream / per-schema dispatch: a HETEROGENEOUS batch where each row
  * declares its own constraint set (the reference's core semantics — every
  * event carries `$schema`, resolved and validated per event,
  * /root/reference/lib/factories/default-eventgate.js:132-152 +
  * lib/EventValidator.js:221-258), evaluated in ONE pass.
  *
  * Spark-first shape: the registry is job config (like `schema_base_uris`),
  * so the "lookup join" against it constant-folds into a codegen'd CASE
  * chain — `when(set_id === v, <compiled predicate tree of v>)` — rather
  * than a physical broadcast join. That keeps dispatch shuffle-free and
  * row-preserving: N compiled sets evaluate in one whole-stage-codegen'd
  * projection, and Catalyst CSE dedups predicates shared between sets. (A
  * registry TABLE join would be the shape only if constraints themselves
  * were data; here, as in the reference, they're compiled config.)
  *
  * A row whose stream resolves to no set gets status `error` — the
  * EventSchemaLoadError path, which the reference classifies as error, not
  * invalid (/root/reference/lib/EventValidator.js:231-236, x-ample
  * /root/reference/test/spec.test.yaml:159-174).
  */
final class MultiStreamEngine(
    registry: ConstraintRegistry,
    opts: EngineOptions = EngineOptions(),
    streamCol: String = "stream",
    schemaUriCol: Option[String] = None,
    schemaUriCols: Seq[String] = Nil
) extends Serializable {

  /** The reference's `schema_uri_field` is a string OR an ARRAY of field
    * names — the first field present on the event wins
    * (/root/reference/lib/factories/default-eventgate.js:105-108, tested at
    * test/features/lib/factories/default-eventgate.js:18-51). Columnar
    * translation: fields absent from the frame's schema are skipped
    * entirely; among present fields, per-row "exists" = non-null, so the
    * chain is one `coalesce` (the O4 primitive, now wired into dispatch).
    * All candidates missing/null ⇒ null URI ⇒ unroutable ⇒ the
    * schema-load-error status, as when a configured single field is null.
    */
  private val uriFields: Seq[String] = schemaUriCol.toSeq ++ schemaUriCols

  def process(rawInput: DataFrame): ValidationResult = {
    registry.sets.foreach { cs =>
      val problems = cs.lint
      require(problems.isEmpty, s"insecure constraint set ${cs.version}: ${problems.mkString("; ")}")
    }

    // Effective stream: the configured stream field when present, else the
    // sanitized schema URI (makeExtractStream,
    // /root/reference/lib/factories/default-eventgate.js:132-152). The
    // resolved value OVERWRITES streamCol so routing, rollups, and
    // per-stream output all see the event's true destination.
    val input = if (uriFields.nonEmpty) {
      val present = uriFields.filter(rawInput.columns.contains)
      val uri =
        if (present.isEmpty) lit(null).cast("string")
        else coalesce(present.map(col): _*)
      rawInput.withColumn(
        streamCol,
        ConstraintRegistry.extractStream(
          if (rawInput.columns.contains(streamCol)) Some(col(streamCol)) else None,
          uri
        )
      )
    } else rawInput

    val inputCols = input.columns.toSeq
    val stream = col(streamCol)

    // Resolve stream → set version (the validator-cache lookup): one O(1)
    // codegen'd hash probe + ordered regex/base-URI fallback, null = schema
    // load failure. Replaced the O(#routes) CASE chain (+23% dispatch
    // overhead at 4 sets) in round 3.
    val setIdCol = graft.functions.StreamRoute.route(stream, registry.resolver)

    val withPart = input
      .withColumn("partition_id", opts.partitionIdCol.cast("int"))
      .withColumn("_set_id", setIdCol)
      .withColumn(
        "engine_error",
        when(
          col("_set_id").isNull,
          concat(
            lit("EventSchemaLoadError: no constraint set registered for stream '"),
            coalesce(stream, lit("null")),
            lit("'")
          )
        )
      )

    // Default fills dispatch per set (AJV useDefaults mutates the event,
    // /root/reference/lib/EventValidator.js:29-33) — per field, a CASE over
    // the sets that fill it; rows of other sets keep the raw value.
    val fillFields = registry.sets.flatMap(_.fills.map(_.field)).distinct
    val filled = fillFields.foldLeft(withPart) { (df, f) =>
      val filledCol = registry.sets.foldLeft(col(f)) { (acc, cs) =>
        cs.fills.find(_.field == f) match {
          case Some(fill) => when(col("_set_id") === cs.version, fill(col(f))).otherwise(acc)
          case None       => acc
        }
      }
      df.withColumn(f, filledCol)
    }

    // Dispatch pass/fail and violation details: one CASE per compiled set.
    // Unknown sets default to TRUE — the error status wins the triage anyway.
    val dispatchPass = registry.sets.foldRight(lit(true)) { (cs, acc) =>
      when(col("_set_id") === cs.version, Compiler.allPass(cs)).otherwise(acc)
    }
    val emptyVio = array().cast("array<struct<constraint_id:string,field:string,detail:string>>")
    val dispatchVio = registry.sets.foldRight(emptyVio) { (cs, acc) =>
      when(col("_set_id") === cs.version, Compiler.violationsArray(cs)).otherwise(acc)
    }

    val annotated = filled
      .withColumn(
        "status",
        when(col("engine_error").isNotNull, Status.Error)
          .when(!dispatchPass, Status.Invalid)
          .otherwise(Status.Success)
      )
      .withColumn("violations", when(col("status") === Status.Invalid, dispatchVio).otherwise(emptyVio))

    // Valid rows keep the stream column — the router key for per-stream
    // output (the reference produces each event to ITS stream's topic,
    // /root/reference/lib/factories/default-eventgate.js:242-278); writers
    // partition by it (writeByStream).
    val valid = annotated.filter(col("status") === Status.Success).select(inputCols.map(col): _*)

    val violations =
      MultiStreamEngine.violationRows(annotated, opts.snapshotId, opts.idField, streamCol)

    // Rollups per (stream, partition): the per-topic produce counts of the
    // reference, one hash-agg.
    val rollups = annotated
      .groupBy(stream.as("stream"), col("partition_id"))
      .agg(
        count(when(col("status") === Status.Success, 1)).as("n_success"),
        count(when(col("status") === Status.Invalid, 1)).as("n_invalid"),
        count(when(col("status") === Status.Error, 1)).as("n_error")
      )
      .select(
        lit(opts.snapshotId).as("snapshot_id"),
        col("stream"), col("partition_id"), col("n_success"), col("n_invalid"), col("n_error")
      )

    ValidationResult(annotated, valid, violations, rollups)
  }

  /** Route valid rows to per-stream directories — one commit, N streams
    * (the dual-sink fan-out of the reference under one guarantee,
    * /root/reference/lib/factories/default-eventgate.js:307-330).
    */
  def writeByStream(valid: DataFrame, path: String): Unit =
    valid
      .withColumn("streamd", col(streamCol)) // dir routing; real column stays in data
      .write.mode("overwrite").partitionBy("streamd").parquet(path)
}

object MultiStreamEngine {

  /** Multi-stream ViolationRow projection from any annotated frame (must
    * carry partition_id, _set_id, violations, engine_error, status + the id
    * and stream fields) — used by `process` and by MultiStreamValidationJob
    * when deriving violations from the written failing slice.
    */
  def violationRows(annotated: DataFrame, snapshotId: String, idField: String, streamCol: String): DataFrame = {
    val stream = col(streamCol)
    val invalidRows = annotated
      .filter(col("status") === Status.Invalid)
      .select(
        lit(snapshotId).as("snapshot_id"),
        col("partition_id"),
        stream.as("stream"),
        col("_set_id").as("constraint_version"),
        col(idField).as("row_id"),
        explode(col("violations")).as("v"),
        lit(Status.Invalid).as("status")
      )
      .select(
        col("snapshot_id"), col("partition_id"), col("stream"), col("constraint_version"),
        col("row_id"), col("v.constraint_id"), col("v.field"), col("v.detail"), col("status")
      )
    val errorRows = annotated
      .filter(col("status") === Status.Error)
      .select(
        lit(snapshotId).as("snapshot_id"),
        col("partition_id"),
        stream.as("stream"),
        col("_set_id").as("constraint_version"),
        col(idField).as("row_id"),
        lit("engine_error").as("constraint_id"),
        lit(streamCol).as("field"),
        col("engine_error").as("detail"),
        lit(Status.Error).as("status")
      )
    invalidRows.unionByName(errorRows)
  }
}
