package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** JSON event intake: the reference is literally a JSON event gate — every
  * HTTP body is parsed before validation (`bodyParser.json`,
  * /root/reference/app.js:145), and a body that fails to parse or is
  * empty is answered 400 without ever reaching schema validation
  * (/root/reference/routes/events.js:44-52).
  * Columnar translation: a string column of JSON events is decoded against
  * the expected struct schema in ONE codegen'd `from_json` projection;
  * malformed rows are NOT dropped (Spark's default FAILFAST/implicit-null
  * behaviors both lose the 400 signal) — they surface per-row with the
  * raw payload preserved, so the triage order stays parse-error >
  * validation-error > success, exactly the reference's.
  *
  * Scale: `from_json` is a per-row projection — no shuffle, no UDF; the
  * corrupt-record column rides Spark's PERMISSIVE parser rather than a
  * second parse. (`JsonToStructs` is CodegenFallback in Spark, so the
  * projection evaluates outside whole-stage codegen — the Jackson parse
  * dominates its cost either way; PlanSpec pins the no-shuffle/no-UDF
  * shape.)
  */
object JsonIntake {

  val CorruptCol = "_corrupt_json"

  /** Decode `jsonCol` against `schema`, appending:
    *  - one column per schema field (null-filled for malformed rows),
    *  - `_corrupt_json`: the raw payload for rows that failed to parse,
    *    null for rows that parsed (the 400-analog marker).
    *
    * A row whose payload is NULL is treated as malformed with an empty raw
    * payload (the reference 400s an empty body: routes/events.js:44-52).
    */
  def parse(df: DataFrame, jsonCol: String, schema: StructType): DataFrame = {
    require(!schema.fieldNames.contains(CorruptCol), s"schema may not already contain $CorruptCol")
    require(!df.columns.contains(CorruptCol) && !df.columns.contains("_parsed"),
      s"input frame may not already contain $CorruptCol or _parsed")
    val withCorrupt = StructType(schema.fields :+ StructField(CorruptCol, StringType))
    val parsed = from_json(
      col(jsonCol),
      withCorrupt,
      Map("mode" -> "PERMISSIVE", "columnNameOfCorruptRecord" -> CorruptCol)
    )
    val out = df.withColumn("_parsed", parsed)
    val fields = schema.fieldNames.toSeq
    out.select(
      (df.columns.toSeq.map(col) ++
        fields.map(f => col(s"_parsed.`$f`").as(f)) :+
        when(col("_parsed").isNull, coalesce(col(jsonCol), lit("")))
          .otherwise(col(s"_parsed.`$CorruptCol`")).as(CorruptCol)): _*
    )
  }
}
