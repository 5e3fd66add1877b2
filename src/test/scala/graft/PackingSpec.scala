package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ops.{Packing, PrefixScan, Sampling, TextOps}

/** The corpus-layout family: [[PrefixScan]] (distributed running total),
  * [[Packing]] (sequence-packing offsets), [[TextOps.docChunks]] /
  * [[TextOps.vocabCoverage]], and [[Sampling.mixtureSqrtRates]].
  */
class PackingSpec extends SparkSpec {
  import spark.implicits._

  test("PrefixScan.runningTotal matches the single-window global scan with buckets engaged") {
    // 2000 rows, deterministic pseudo-random values; buckets = 8 forces the
    // boundary sample + per-bucket offset machinery to do real work.
    val df = spark.range(2000)
      .select(col("id"), (pmod(col("id") * 2654435761L, lit(1000))).as("v"))
    val got = PrefixScan.runningTotal(df, Seq("id" -> true), "v", buckets = 8, sampleSize = 256)
      .select("id", "running")
    val w = Window.orderBy("id").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val exp = df.select(col("id"), sum(col("v")).over(w).as("running"))
    assert(got.exceptAll(exp).isEmpty && exp.exceptAll(got).isEmpty,
      "bucketed prefix scan must equal the global window scan")
    // bucket column must not leak
    assert(got.columns.toSeq == Seq("id", "running"))
  }

  test("PrefixScan.runningTotal honours descending + tie-broken multi-column order") {
    val df = Seq(("b", 1L, 10L), ("a", 1L, 20L), ("c", 2L, 30L), ("d", 2L, 40L))
      .toDF("k", "grp", "v")
    // order: grp desc, k asc -> c(30), d(40), a(20), b(10)
    val got = PrefixScan.runningTotal(df, Seq("grp" -> false, "k" -> true), "v", buckets = 2)
      .select("k", "running").as[(String, Long)].collect().toMap
    assert(got == Map("c" -> 30L, "d" -> 70L, "a" -> 90L, "b" -> 100L), s"$got")
  }

  test("PrefixScan.runningTotal survives sparse samples, duplicate boundaries, signed values") {
    // 1000 rows with only 11 distinct leading key values (boundary sample
    // mostly duplicates -> distinct/take path), a tie-breaking second key,
    // signed values, and more buckets than surviving boundaries.
    val df = spark.range(1000).select(
      (col("id") % 11).as("a"), col("id").as("b"),
      (col("id") % 7 - lit(3)).as("v"))
    val got = PrefixScan.runningTotal(df, Seq("a" -> true, "b" -> false), "v",
      buckets = 64, sampleSize = 32).select("a", "b", "running")
    val w = Window.orderBy(col("a").asc, col("b").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val exp = df.select(col("a"), col("b"), sum(col("v")).over(w).as("running"))
    assert(got.exceptAll(exp).isEmpty && exp.exceptAll(got).isEmpty,
      "sparse-sample bucketed scan must equal the global window scan")
  }

  test("PrefixScan.runningTotal treats null values as 0, never null, boundary-independent") {
    // ids 50..149 null-valued: the null run spans bucket boundaries, so a
    // bare window sum would null out the head of a non-first bucket and
    // the answer would depend on where sampled boundaries land; the op
    // coalesces VALUES to 0, so the running total is never null
    val df = spark.range(200).select(col("id"),
      when(col("id").between(50, 149), lit(null).cast("long")).otherwise(col("id")).as("v"))
    for (buckets <- Seq(1, 4, 16)) {
      val rows = PrefixScan.runningTotal(df, Seq("id" -> true), "v",
        buckets = buckets, sampleSize = 64)
        .select("id", "running").as[(Long, Option[Long])].collect().toMap
      assert(rows.values.forall(_.isDefined), s"null running value at buckets=$buckets")
      assert(rows(100L) == Some((0L to 49L).sum), s"buckets=$buckets: ${rows(100L)}")
      assert(rows(199L) == Some((0L to 49L).sum + (150L to 199L).sum),
        s"buckets=$buckets: ${rows(199L)}")
    }
  }

  test("PrefixScan.runningTotal on empty input yields the result column, zero rows") {
    val df = spark.range(0).select(col("id"), col("id").as("v"))
    val got = PrefixScan.runningTotal(df, Seq("id" -> true), "v")
    assert(got.columns.contains("running") && got.count() == 0L)
  }

  test("groupedRunningTotal: per-group scan matches the partitioned window, incl. numeric groups") {
    // groups 2 and 10 as INTEGERS: a stringified driver-side sort would
    // order "10" < "2" and corrupt every offset — the regression this
    // test pins
    val df = Seq((10, "a", 5L), (2, "b", 7L), (10, "b", 3L), (2, "a", 1L), (7, "z", 2L))
      .toDF("grp", "k", "v")
    val got = PrefixScan.groupedRunningTotal(df, Seq("grp"), Seq("k" -> true), "v", buckets = 2)
      .select("grp", "k", "running").as[(Int, String, Long)].collect().toSet
    assert(got == Set((2, "a", 1L), (2, "b", 8L), (7, "z", 2L), (10, "a", 5L), (10, "b", 8L)),
      s"$got")
  }

  test("tokenBudgetKeep: greedy fill in priority order; straddling doc kept, later docs cut") {
    val docs = Seq(
      (1L, "a b c d e", "s1"),      // 5 tokens
      (2L, "f g h", "s1"),          // 3 tokens
      (3L, "i j", "s1"),            // 2 tokens
      (4L, "k", "s2")               // 1 token
    ).toDF("doc_id", "text", "source")
    // priority: long first. s1 budget 7: doc1 (before 0) kept, doc2
    // (before 5 < 7) kept and straddles, doc3 (before 8) cut. s2: doc4 kept.
    val got = Packing.tokenBudgetKeep(docs, "doc_id", "text", "source", budgetTokens = 7L,
      orderCols = Seq("n_tokens" -> false, "doc_id" -> true), buckets = 2)
      .select("doc_id", "source", "n_tokens", "tok_before")
      .as[(Long, String, Long, Long)].collect().sortBy(_._1).toSeq
    assert(got == Seq((1L, "s1", 5L, 0L), (2L, "s1", 3L, 5L), (4L, "s2", 1L, 0L)), s"$got")
  }

  test("tokenBudgetKeep matches a driver-side reference over generated sources") {
    // 300 docs, 5 sources, token counts 1..13 from a deterministic formula
    val docs = (1L to 300L).map { i =>
      val n = (i * 7 % 13 + 1).toInt
      (i, (1 to n).map(j => s"w$j").mkString(" "), s"s${i % 5}")
    }
    val df = docs.toDF("doc_id", "text", "source")
    val got = graft.ops.Packing.tokenBudgetKeep(df, "doc_id", "text", "source",
      budgetTokens = 100L, orderCols = Seq("n_tokens" -> false, "doc_id" -> true), buckets = 8)
      .select("doc_id", "tok_before").as[(Long, Long)].collect().toMap
    // independent reference: per source, sort by (tokens desc, id asc),
    // keep while the running total before the doc is under budget
    val expected = docs.map { case (id, text, src) => (id, text.split(" ").length.toLong, src) }
      .groupBy(_._3).values.flatMap { grp =>
        val ordered = grp.sortBy { case (id, n, _) => (-n, id) }
        ordered.scanLeft((0L, 0L, false)) { case ((cum, _, _), (id, n, _)) =>
          (cum + n, id, cum < 100L)
        }.tail.collect { case (cumAfter, id, true) =>
          id -> (cumAfter - ordered.find(_._1 == id).get._2)
        }
      }.toMap
    assert(got == expected,
      s"diff kept: ${(got.keySet diff expected.keySet, expected.keySet diff got.keySet)}")
  }

  test("packOffsets: exclusive offsets and bin span, including a bin-crossing document") {
    val docs = Seq(
      (1L, "a b c"),          // 3 tokens, offset 0, bins 0-0
      (2L, "d e f g"),        // 4 tokens, offset 3, crosses the 5-boundary: bins 0-1
      (3L, "   "),            // blank: filtered
      (4L, "h i j k l m")     // 6 tokens, offset 7, bins 1-2
    ).toDF("doc_id", "text")
    val got = Packing.packOffsets(docs, "doc_id", "text", contextLen = 5, buckets = 2)
      .select("doc_id", "n_tokens", "tok_offset", "bin_first", "bin_last")
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(got == Seq((1L, 3L, 0L, 0L, 0L), (2L, 4L, 3L, 0L, 1L), (4L, 6L, 7L, 1L, 2L)), s"$got")
  }

  test("docChunks: sliding windows with stride overlap, no contained duplicate tail") {
    val docs = Seq((7L, "t0 t1 t2 t3 t4"), (8L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val got = TextOps.docChunks(docs, "doc_id", "text", window = 3, stride = 2)
      .select("id", "chunk_idx", "n_chunk_tokens", "chunk_text")
      .as[(Long, Long, Long, String)].collect().sortBy(r => (r._1, r._2)).toSeq
    // starts stop at len - window + stride = 4: chunk "t4" alone would be
    // wholly contained in chunk 1 — a duplicate-text tail
    assert(got == Seq(
      (7L, 0L, 3L, "t0 t1 t2"),
      (7L, 1L, 3L, "t2 t3 t4")), s"$got")
    // a 6-token doc's tail chunk is a true remainder (token t5 is new)
    val six = Seq((9L, "t0 t1 t2 t3 t4 t5")).toDF("doc_id", "text")
    val got6 = TextOps.docChunks(six, "doc_id", "text", window = 3, stride = 2)
      .select("chunk_idx", "chunk_text").as[(Long, String)].collect().sortBy(_._1).toSeq
    assert(got6 == Seq((0L, "t0 t1 t2"), (1L, "t2 t3 t4"), (2L, "t4 t5")), s"$got6")
    // shorter than a window: one chunk, whole doc
    val short = Seq((10L, "a b")).toDF("doc_id", "text")
    val gotS = TextOps.docChunks(short, "doc_id", "text", window = 3, stride = 2)
      .select("n_chunk_tokens", "chunk_text").as[(Long, String)].collect().toSeq
    assert(gotS == Seq((2L, "a b")), s"$gotS")
  }

  test("vocabCoverage: minCount filter and inclusive cumulative mass in (cnt desc, word) order") {
    val docs = Seq((1L, "Apple apple BANANA"), (2L, "apple banana cherry")).toDF("doc_id", "text")
    val got = TextOps.vocabCoverage(docs, "text", minCount = 2L, buckets = 2)
      .select("word", "cnt", "cum_cnt")
      .as[(String, Long, Long)].collect().sortBy(r => (-r._2, r._1)).toSeq
    // apple 3, banana 2; cherry (cnt 1) filtered
    assert(got == Seq(("apple", 3L, 3L), ("banana", 2L, 5L)), s"$got")
  }

  test("mixtureSqrtRates: exact sqrt-temperature rates with the min-1 clamp") {
    val df = (Seq.fill(100)("big") ++ Seq.fill(4)("small") ++ Seq("tiny"))
      .zipWithIndex.map { case (s, i) => (i.toLong, s) }.toDF("doc_id", "source")
    // isq: big 10, small 2, tiny 1 -> total 13
    val rates = Sampling.mixtureSqrtRates(df, "source", targetRows = 26L)
    assert(rates("big") == math.min(1.0, 26.0 * 10.0 / (13.0 * 100.0)), s"$rates")
    assert(rates("small") == 1.0, s"small must clamp at 1: $rates")   // 26*2/(13*4) = 1.0
    assert(rates("tiny") == 1.0, s"tiny must clamp at 1: $rates")     // 26*1/(13*1) = 2 -> 1
    // expected kept mass before clamping = target: sum n_s * unclamped rate
    val unclampedBig = 26.0 * 10.0 / (13.0 * 100.0)
    assert(math.abs(100 * unclampedBig + 4 * (26.0 * 2 / (13.0 * 4)) + 1 * (26.0 / 13.0) - 26.0) < 1e-9)
  }

  test("mixtureSqrtSample is deterministic and respects per-source membership") {
    val df = (1L to 400L).map(i => (i, if (i % 4 == 0L) "a" else "b")).toDF("doc_id", "source")
    val s1 = Sampling.mixtureSqrtSample(df, "doc_id", "source", targetRows = 80L, salt = "t")
      .as[(Long, String)].collect().toSet
    val s2 = Sampling.mixtureSqrtSample(df, "doc_id", "source", targetRows = 80L, salt = "t")
      .as[(Long, String)].collect().toSet
    assert(s1 == s2, "hash sample must be rerun-stable")
    assert(s1.nonEmpty && s1.size < 400, s"sample must thin the input: ${s1.size}")
    // membership must be a pure function of (key, salt, source rate): a row's
    // presence is unchanged when unrelated rows are dropped from the SAME source
    val rates = Sampling.mixtureSqrtRates(df, "source", targetRows = 80L)
    val manual = df.as[(Long, String)].collect().filter { case (id, src) =>
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest((id.toString + "t").getBytes("UTF-8"))
        .take(4).map(b => f"$b%02x").mkString
      java.lang.Long.parseLong(hex, 16) < math.min((rates(src) * 4294967296.0).toLong, 4294967295L)
    }.toSet
    assert(s1 == manual, s"Spark membership must equal the closed-form md5 predicate")
  }
}
