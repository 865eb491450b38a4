package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Corpus-curation operators: stratified sampling, n-gram
  * decontamination, PII scrubbing, repetition metrics, vocabulary.
  */
class CurationSpec extends SparkSpec {
  import spark.implicits._

  test("observe counters ride the pipeline's own pass and match recounts") {
    val docs = graft.sources.Tables(spark, sf("sf0.001")).documents
    val enriched = docs.select(col("doc_id"), col("source"), col("text"),
      TextOps.tokenCount(col("text")).as("n_tokens"))
    val (kept, obsIn, obsKept) = ObserveOps.observedFilter(
      enriched, col("n_tokens") >= 40, "len_filter", "text")
    // ONE terminal action drives the pipeline AND delivers every counter
    val grouped = kept.groupBy(col("source")).count().collect()
    assert(grouped.nonEmpty)
    val inRow = obsIn.get
    val keptRow = obsKept.get
    // independently recomputed ground truth (the second scan the
    // production pipeline avoids)
    val nIn = docs.count()
    val keptDf = enriched.filter(col("n_tokens") >= 40)
    val nKept = keptDf.count()
    val charsKept = keptDf.agg(sum(length(col("text")))).head().getLong(0)
    val charsIn = docs.agg(sum(length(col("text")))).head().getLong(0)
    val emptyIn = docs.filter(length(trim(col("text"))) === 0).count()
    assert(inRow("rows") == nIn)
    assert(inRow("chars") == charsIn)
    assert(inRow("empty_docs") == emptyIn)
    assert(keptRow("rows") == nKept)
    assert(keptRow("chars") == charsKept)
    assert(nKept < nIn) // the filter actually drops rows at this SF
  }

  test("stratifiedSample keeps per-stratum fractions and is deterministic") {
    val docs = (1 to 4000).map(i =>
      (i.toLong, if (i % 2 == 0) "en" else "fr")).toDF("id", "lang")
    val kept = docs.filter(SamplingOps.stratifiedSample(
      col("lang"), col("id"), Map("en" -> 0.5, "fr" -> 0.1), 0.0))
    val byLang = kept.groupBy("lang").count().as[(String, Long)]
      .collect().toMap
    // 2000 per stratum; binomial sd ≈ 22 (en) / 13 (fr) — 5σ bounds
    assert(byLang("en") > 880 && byLang("en") < 1120, byLang)
    assert(byLang("fr") > 130 && byLang("fr") < 270, byLang)
    // rerun is identical (pure function of the id)
    val again = docs.filter(SamplingOps.stratifiedSample(
      col("lang"), col("id"), Map("en" -> 0.5, "fr" -> 0.1), 0.0))
    assert(kept.select("id").except(again.select("id")).isEmpty)
    assert(again.select("id").except(kept.select("id")).isEmpty)
  }

  test("stratifiedSample default fraction applies to unlisted strata") {
    val docs = (1 to 1000).map(i => (i.toLong, "zh")).toDF("id", "lang")
    val none = docs.filter(SamplingOps.stratifiedSample(
      col("lang"), col("id"), Map("en" -> 1.0), 0.0))
    assert(none.isEmpty)
    val all = docs.filter(SamplingOps.stratifiedSample(
      col("lang"), col("id"), Map("en" -> 0.0), 1.0))
    assert(all.count() === 1000L)
    intercept[IllegalArgumentException] {
      SamplingOps.stratifiedSample(col("lang"), col("id"),
        Map("en" -> 1.5), 0.1)
    }
  }

  test("ngramContamination counts shared distinct n-grams per eval doc") {
    val train = Seq((1L, "a b c d")).toDF("doc_id", "text")
    val eval = Seq(
      (10L, "a b c x y"),   // shingles: "a b c","b c x","c x y" — 1 hit
      (11L, "p q r s"),     // no overlap
      (12L, "b c d")        // single shingle "b c d" — full hit
    ).toDF("doc_id", "text")
    val out = DedupOps.ngramContamination(eval, train, "doc_id", "text")
      .orderBy("doc_id")
      .select("doc_id", "n_shingles", "n_contaminated", "contamination")
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(out === Seq(
      (10L, 3L, 1L, 0.3333),
      (11L, 2L, 0L, 0.0),
      (12L, 1L, 1L, 1.0)))
  }

  test("piiRedact replaces emails then long digit runs, counts match") {
    val df = Seq(
      (1L, "mail me at jo.doe+x@mail.example.org or call 12345"),
      (2L, "no pii here, just 123 and 9.99"),
      (3L, "two mails a@b.co c@d.io and 55556666")
    ).toDF("id", "text")
    val out = df.select(col("id"),
        TextOps.emailCount(col("text")).as("e"),
        TextOps.longNumberCount(col("text")).as("n"),
        TextOps.piiRedact(col("text")).as("r"))
      .orderBy("id").as[(Long, Long, Long, String)].collect().toSeq
    assert(out(0) === ((1L, 1L, 1L, "mail me at <EMAIL> or call <NUM>")))
    assert(out(1) === ((2L, 0L, 0L, "no pii here, just 123 and 9.99")))
    assert(out(2) === ((3L, 2L, 1L, "two mails <EMAIL> <EMAIL> and <NUM>")))
  }

  test("truncateTokens caps at n tokens, preserving whitespace") {
    val df = Seq(
      (1L, "a b  c d e"), (2L, "  one two  "), (3L, "solo")
    ).toDF("id", "text")
    val out = df.select(col("id"),
        TextOps.truncateTokens(col("text"), 3).as("t"))
      .orderBy("id").as[(Long, String)].collect().toSeq
    assert(out === Seq((1L, "a b  c"), (2L, "one two"), (3L, "solo")))
    intercept[IllegalArgumentException] {
      TextOps.truncateTokens(col("text"), 0)
    }
  }

  test("stratifiedTopK keeps exactly k per stratum, deterministically") {
    val docs = (1 to 500).map(i =>
      (i.toLong, if (i % 2 == 0) "en" else "fr")).toDF("id", "lang")
    val kept = SamplingOps.stratifiedTopK(docs, "lang", "id", 7)
    val byLang = kept.groupBy("lang").count().as[(String, Long)]
      .collect().toMap
    assert(byLang === Map("en" -> 7L, "fr" -> 7L))
    val again = SamplingOps.stratifiedTopK(docs, "lang", "id", 7)
      .select("id").as[Long].collect().toSet
    assert(again === kept.select("id").as[Long].collect().toSet)
  }

  test("weightedTopK matches a local E-S recomputation exactly") {
    val docs = (1L to 2000L).map(i => (i, ((i % 4) + 1)))
      .toDF("id", "w")
    val got = SamplingOps.weightedTopK(docs, "id", "w", k = 50,
        classes = Seq(1, 2, 3, 4))
      .select("id").as[Long].collect().toSeq
    // local recomputation with the same md5-prefix u and multiply chains
    def key(id: Long, w: Long): Double = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(8)
      val u = (java.lang.Long.parseLong(hex, 16).toDouble + 1) /
        4294967296.0
      val e = 12 / w.toInt // lcm(1,2,3,4)=12
      (2 to e).foldLeft(u)((acc, _) => acc * u)
    }
    val expect = (1L to 2000L).map(i => (i, ((i % 4) + 1)))
      .map { case (i, w) => (i, key(i, w)) }
      .sortBy { case (i, k) => (-k, i) }.take(50).map(_._1)
    assert(got === expect)
  }

  test("weightedTopK inclusion rate is monotone in the weight class") {
    val docs = (1L to 8000L).map(i => (i, ((i % 4) + 1))).toDF("id", "w")
    val rates = SamplingOps.weightedTopK(docs, "id", "w", k = 2000,
        classes = Seq(1, 2, 3, 4))
      .groupBy("w").count().as[(Long, Long)].collect().toMap
    // 2000 ids per class; E-S keeps higher-weight items more often
    assert(rates(4L) > rates(3L) && rates(3L) > rates(2L) &&
      rates(2L) > rates(1L), rates)
    // rows with a weight outside the classes never sample
    val bad = (1L to 100L).map(i => (i, 7L)).toDF("id", "w")
    assert(SamplingOps.weightedTopK(bad, "id", "w", 10,
      Seq(1, 2, 3, 4)).filter(col("__wkey").isNotNull).isEmpty)
  }

  test("mixToTarget shifts the output mix toward the weights") {
    import spark.implicits._
    // 800 "web" rows vs 200 "books": weighting books 4× at a 50% budget
    // must raise books' share well above its 20% input share
    val docs = (1 to 1000).map(i =>
      (i.toLong, if (i <= 800) "web" else "books")).toDF("id", "src")
    val out = SamplingOps.mixToTarget(docs, "src", "id",
      Map("web" -> 1.0, "books" -> 4.0), budgetFrac = 0.5)
    val byS = out.groupBy("src").count().as[(String, Long)]
      .collect().toMap
    // desired: books 0.5*1000*0.8=400 > 200 available → frac 1 (all 200)
    assert(byS("books") == 200L)
    // web desired 0.5*1000*0.2=100 of 800 → ~12.5% Bernoulli draw
    assert(byS("web") > 50L && byS("web") < 160L)
    // deterministic: the same call keeps the same ids
    val again = SamplingOps.mixToTarget(docs, "src", "id",
      Map("web" -> 1.0, "books" -> 4.0), 0.5)
      .select("id").as[Long].collect().toSet
    assert(again == out.select("id").as[Long].collect().toSet)
  }

  test("fuzzyPairs finds exactly the distance<=1 pairs (pigeonhole)") {
    import spark.implicits._
    val rows = Seq(
      (1L, "market"), (2L, "markets"),  // insert at end → 1
      (3L, "marker"),                   // substitution vs 1 → 1
      (4L, "narket"),                   // substitution at pos 0 → 1
      (5L, "arket"),                    // deletion at pos 0 → 1 vs market
      (6L, "garden"),                   // unrelated
      (7L, "market")                    // exact dup → 0
    ).toDF("id", "s")
    val got = TextOps.fuzzyPairs(rows, "id", "s")
      .as[(Long, Long, Long)].collect().toSet
    // brute-force truth
    val data = Seq(1L -> "market", 2L -> "markets", 3L -> "marker",
      4L -> "narket", 5L -> "arket", 6L -> "garden", 7L -> "market")
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) =>
        if (i == 0) j else if (j == 0) i else 0)
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val want = (for {
      (i1, s1) <- data; (i2, s2) <- data
      if i1 < i2 && lev(s1, s2) <= 1
    } yield (i1, i2, lev(s1, s2).toLong)).toSet
    assert(got == want)
    assert(got.contains((1L, 7L, 0L)) && got.contains((1L, 5L, 1L)))
    assert(!got.exists(p => p._1 == 6L || p._2 == 6L))
  }

  test("dupNgramFraction measures repeated n-grams") {
    val df = Seq(
      (1L, "x x x x"),        // 2-grams: 3 total, 1 distinct → 0.6666
      (2L, "a b c d"),        // all distinct → 0.0
      (3L, "w")               // < n words → 0.0
    ).toDF("id", "text")
    val out = df.select(col("id"),
        TextOps.dupNgramFraction(col("text"), 2).as("d2"))
      .orderBy("id").as[(Long, Double)].collect().toSeq
    assert(out === Seq((1L, 0.6666), (2L, 0.0), (3L, 0.0)))
  }

  test("encoding-artifact counters: planted artifacts found, clean text clean") {
    val df = Seq(
      (1L, "plain ascii text"),
      (2L, "bad � decode �"),
      (3L, "bellandjunk, tab\tand\nnewline ok"),
      (4L, "cafÃ© and â€œquotedâ€"),
      (5L, "café résumé"),  // real accents, NOT mojibake
      (6L, "truncated cafÃ")  // marker at end-of-string still counts
    ).toDF("id", "text")
    val out = df.select(col("id"),
        TextOps.replacementCharCount(col("text")).as("r"),
        TextOps.controlCharCount(col("text")).as("c"),
        TextOps.mojibakeMarkerCount(col("text")).as("m"))
      .orderBy("id").as[(Long, Long, Long, Long)].collect().toSeq
    assert(out(0) == ((1L, 0L, 0L, 0L)))
    assert(out(1) == ((2L, 2L, 0L, 0L)))
    assert(out(2) == ((3L, 0L, 2L, 0L)))  // \t and \n not counted
    assert(out(3)._2 == 0L && out(3)._3 == 0L && out(3)._4 == 3L)
    assert(out(4) == ((5L, 0L, 0L, 0L)))  // no false positive on accents
    assert(out(5) == ((6L, 0L, 0L, 1L)))  // truncated trailing marker
  }

  test("contextChunks: stride windows cover all tokens, short tail") {
    import spark.implicits._
    val docs = Seq(
      (1L, (1 to 10).map(i => s"w$i").mkString(" ")), // 10 toks
      (2L, "a b c d"),                                // exactly one window
      (3L, "a b c d e")                               // 5 toks -> short tail
    ).toDF("doc_id", "text")
    val out = TextOps.contextChunks(docs, "doc_id", "text",
        chunkSize = 4, stride = 3)
      .orderBy("doc_id", "chunk_no")
      .as[(Long, Long, Long, Long, String)].collect().toSeq
    // doc 1: n=10, nc = 1 + ceil(6/3) = 3
    assert(out.filter(_._1 == 1L) == Seq(
      (1L, 0L, 0L, 4L, "w1 w2 w3 w4"),
      (1L, 1L, 3L, 4L, "w4 w5 w6 w7"),
      (1L, 2L, 6L, 4L, "w7 w8 w9 w10")))
    // doc 2: n=4 <= chunkSize -> single full window
    assert(out.filter(_._1 == 2L) == Seq((2L, 0L, 0L, 4L, "a b c d")))
    // doc 3: n=5 -> second window is the 2-token tail
    assert(out.filter(_._1 == 3L) == Seq(
      (3L, 0L, 0L, 4L, "a b c d"), (3L, 1L, 3L, 2L, "d e")))
    // no token is dropped: every token index < n appears in >= 1 window
    for ((_, k, st, nt, _) <- out) assert(st == k * 3 && nt >= 1)
  }
}
