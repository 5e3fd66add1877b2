package graft

import java.io.ByteArrayInputStream
import javax.imageio.ImageIO

import org.apache.spark.sql.functions._

import graft.constraint._
import graft.engine._
import graft.gen.SyntheticImages
import graft.model.{ImageRow, Status}

class EngineSpec extends SparkSpec {

  import ImageConstraints.UuidRe

  // ---- differential mini-oracle: independent Scala re-implementation ----

  private def oracle(r: ImageRow, decode: Boolean): (String, Set[String]) = {
    val v = scala.collection.mutable.Set[String]()
    if (r.image_id == null) v += "non_null(image_id)"
    else {
      if (!r.image_id.matches(UuidRe)) v += "pattern(image_id)"
      if (r.image_id.length > 36) v += "max_length(image_id)"
    }
    val fmtFilled = if (r.fmt == null) "png" else r.fmt
    if (!ImageConstraints.AllowedFmts.contains(fmtFilled)) v += "whitelist(fmt)"
    if (r.caption == null) v += "non_null(caption)"
    else {
      if (r.caption.isEmpty) v += "min_length(caption)"
      if (r.caption.length > 1024) v += "max_length(caption)"
    }
    if (r.w < 1) v += "min(w)"
    if (r.w > 16384) v += "max(w)"
    if (r.h < 1) v += "min(h)"
    if (r.h > 16384) v += "max(h)"
    var isError = false
    if (decode) {
      val img = try ImageIO.read(new ByteArrayInputStream(r.bytes)) catch { case _: Exception => null }
      if (img == null) isError = true
      else {
        if (r.w != img.getWidth || r.h != img.getHeight) v += "dims_match(w,h)"
        if (fmtFilled == "jpeg") {
          SyntheticImages.indexOf(r.image_id).foreach { idx =>
            var sse = 0.0
            for (y <- 0 until img.getHeight; x <- 0 until img.getWidth; k <- 0 until 3) {
              val d = ((img.getRGB(x, y) >> (k * 8)) & 0xff) -
                ((SyntheticImages.pixelAt(idx, img.getWidth, img.getHeight, x, y) >> (k * 8)) & 0xff)
              sse += d.toDouble * d
            }
            val psnr =
              if (sse == 0) Double.PositiveInfinity
              else 10.0 * math.log10(255.0 * 255.0 * (img.getWidth.toLong * img.getHeight * 3) / sse)
            if (psnr < 40.0) v += "pixel_invariant(bytes)"
          }
        }
      }
    }
    // error preempts validation detail: the reference's non-ValidationError
    // path never reports a violations list (lib/eventgate.js:199-205 — the
    // catch produces a bare error status), so error rows carry an empty set.
    val status = if (isError) Status.Error else if (v.nonEmpty) Status.Invalid else Status.Success
    (status, if (isError) Set.empty[String] else v.toSet)
  }

  private def runEngine(n: Long, decode: Boolean) = {
    import spark.implicits._
    val df = SyntheticImages.images(spark, n, 4).toDF()
    val opts = EngineOptions(
      snapshotId = "test",
      pixelChecks = if (decode) Some(PixelChecks()) else None
    )
    new ValidationEngine(ImageConstraints.v1, opts).process(df)
  }

  test("engine matches the differential oracle per row (no decode)") {
    val n = 2500L
    val res = runEngine(n, decode = false)
    val got = res.annotated
      .select(col("image_id"), col("status"), col("violations.constraint_id").as("cids"))
      .collect()
      .map(r => (Option(r.getString(0)), r.getString(1), r.getSeq[String](2).toSet))
    assert(got.length == n)
    // group expected by the same key shape (ids may be null/dup — compare multisets)
    val expected = (0L until n).map { i =>
      val row = SyntheticImages.rowOf(i, drift = false, contentPool = 0)
      val (st, v) = oracle(row, decode = false)
      (Option(row.image_id), st, v)
    }
    assert(got.sortBy(_.toString).sameElements(expected.sortBy(_.toString)))
  }

  test("engine matches the differential oracle per row (with decode)") {
    val n = 1200L
    val res = runEngine(n, decode = true)
    val got = res.annotated
      .select(col("image_id"), col("status"), col("violations.constraint_id").as("cids"))
      .collect()
      .map(r => (Option(r.getString(0)), r.getString(1), r.getSeq[String](2).toSet))
    val expected = (0L until n).map { i =>
      val row = SyntheticImages.rowOf(i, drift = false, contentPool = 0)
      val (st, v) = oracle(row, decode = true)
      (Option(row.image_id), st, v)
    }
    assert(got.sortBy(_.toString).sameElements(expected.sortBy(_.toString)))
  }

  test("rollups partition the input; statuses sum to n; frames are consistent") {
    val n = 2000L
    val res = runEngine(n, decode = true)
    val roll = res.rollups.collect()
    val nS = roll.map(_.getAs[Long]("n_success")).sum
    val nI = roll.map(_.getAs[Long]("n_invalid")).sum
    val nE = roll.map(_.getAs[Long]("n_error")).sum
    assert(nS + nI + nE == n)
    assert(res.valid.count() == nS)
    assert(res.violations.filter(col("status") === Status.Error).count() == nE)
    // every invalid row contributes >= 1 violation row
    val distinctInvalid = res.violations
      .filter(col("status") === Status.Invalid)
      .select("image_id", "constraint_id")
      .count()
    assert(distinctInvalid >= nI)
    assert(nI > 0 && nE > 0 && nS > 0)
  }

  test("errorsText parity: golden string \"'.test' should be string\" (spec.test.yaml:120-124)") {
    import spark.implicits._
    // the reference's canonical valid/invalid events, verbatim (FIXTURES.md A.2)
    val events = Seq(
      """{"$schema":"/test/0.0.1","meta":{"stream":"test.event","id":"5e1dd101-641c-11e8-ab6c-b083fecf1287"},"test":"test_value_0"}""",
      """{"$schema":"/test/0.0.1","meta":{"stream":"test.event","id":"5e1dd101-641c-11e8-ab6c-b083fecf1289"},"test":1234}"""
    ).toDF("raw")
    val cs = ConstraintSet(
      "test/0.0.1",
      fills = Seq.empty,
      checks = Seq(
        JsonTypeIs("test", "string", "raw"),
        Predicate(
          "meta.stream",
          "non_null(meta.stream)",
          try_variant_get(try_parse_json(col("raw")), "$.meta.stream", "string").isNotNull,
          "should have required property 'stream'"
        )
      )
    )
    val out = Compiler.run(events, cs).select(col("raw"), col("violations.detail").as("details")).collect()
    val valid = out.find(_.getString(0).contains("test_value_0")).get
    val invalid = out.find(_.getString(0).contains("1234")).get
    assert(valid.getSeq[String](1).isEmpty)
    assert(invalid.getSeq[String](1) == Seq("'.test' should be string"))
  }

  test("default fill mutates the row (useDefaults parity, EventValidator.js:29-33)") {
    import spark.implicits._
    val df = Seq((1, null: String), (2, "explicit")).toDF("k", "test_default")
    val cs = ConstraintSet("t", Seq(DefaultFill("test_default", "default_value")), Seq(NonNull("test_default")))
    val out = Compiler.run(df, cs).orderBy("k").collect()
    assert(out(0).getAs[String]("test_default") == "default_value")
    assert(out(1).getAs[String]("test_default") == "explicit")
    assert(out.forall(_.getSeq[org.apache.spark.sql.Row](2).isEmpty))
  }

  test("status matrix parity with routes/events.js:95-144 x-amples") {
    import ValidationEngine.statusMatrix
    assert(statusMatrix(1, 0, 0) == 201) // single valid
    assert(statusMatrix(2, 0, 0) == 201) // batch valid
    assert(statusMatrix(0, 1, 0) == 400) // single invalid
    assert(statusMatrix(0, 2, 0) == 400) // all invalid
    assert(statusMatrix(1, 1, 0) == 207) // mixed valid+invalid
    assert(statusMatrix(1, 1, 1) == 207) // valid+invalid+error
    assert(statusMatrix(0, 0, 2) == 500) // all errored
    assert(statusMatrix(0, 1, 1) == 500) // all failed, >=1 error
    assert(statusMatrix(0, 0, 0) == 400) // empty body
  }

  test("secure lint rejects pattern without maxLength (EventValidator.js:188-195)") {
    val insecure = ConstraintSet("bad", Seq.empty, Seq(Pattern("image_id", UuidRe)))
    assert(insecure.lint.nonEmpty)
    assertThrows[IllegalArgumentException] {
      Compiler.run(spark.range(1).toDF(), insecure.copy(checks = Seq(Pattern("id", ".*"))))
    }
  }

  test("UuidLike ≡ rlike(UuidRe) on adversarial and random strings") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val hexish = "0123456789abcdefg-ABCDEF_ñ中"
    val cases = Seq(
      "01234567-89ab-cdef-0123-456789abcdef", // valid
      "01234567-89AB-cdef-0123-456789abcdef", // uppercase
      "01234567-89ab-cdef-0123-456789abcde", // 35 chars
      "01234567-89ab-cdef-0123-456789abcdeff", // 37 chars
      "0123456789ab-cdef-0123-456789abcdef-", // dashes misplaced
      "01234567-89ab-cdef-0123-456789abcdeñ", // multibyte tail
      "", "-", null
    ) ++ (0 until 500).map(_ => (0 until (30 + rnd.nextInt(10))).map(_ => hexish(rnd.nextInt(hexish.length))).mkString)
    val df = cases.toDF("s")
    val got = df.select(
      col("s"),
      graft.functions.StringPreds.uuidLike(col("s")).as("fast"),
      col("s").rlike(UuidRe).as("re")
    ).collect()
    got.foreach { r =>
      assert(r.isNullAt(1) == r.isNullAt(2), s"null mismatch on '${r.get(0)}'")
      if (!r.isNullAt(1)) assert(r.getBoolean(1) == r.getBoolean(2), s"mismatch on '${r.get(0)}'")
    }
  }

  test("column pruning: no-decode plan never reads bytes (SURVEY §7.4.3)") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_prune").toString
    SyntheticImages.images(spark, 200, 2).toDF().write.mode("overwrite").parquet(dir)
    val df = spark.read.parquet(dir)
    val res = new ValidationEngine(ImageConstraints.v1, EngineOptions()).process(df)
    val plan = res.rollups.queryExecution.executedPlan.toString
    val scanLine = plan.linesIterator.filter(_.contains("ReadSchema")).mkString("\n")
    assert(!scanLine.contains("bytes"), s"bytes not pruned from scan:\n$scanLine")
  }
}
