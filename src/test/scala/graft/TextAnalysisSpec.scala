package graft

import graft.operators.TextAnalysis
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TextAnalysisSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._
  graft.functions.GraftFunctions.register(SparkTestBase.spark)

  private def one[T](c: org.apache.spark.sql.Column, text: String)(implicit e: org.apache.spark.sql.Encoder[T]): T =
    Seq(text).toDF("text").select(c.as("v")).as[T].head()

  test("tokenCount splits on whitespace") {
    assert(one[Int](TextAnalysis.tokenCount($"text"), "one two  three\tfour") == 4)
    assert(one[Int](TextAnalysis.tokenCount($"text"), "  padded  ") == 1)
  }

  test("stopwordRatio counts exact stopword tokens") {
    assert(one[Double](TextAnalysis.stopwordRatio($"text"), "the cat and the dog") == 0.6)
    assert(one[Double](TextAnalysis.stopwordRatio($"text"), "zebra quark") == 0.0)
  }

  test("punctRatio and meanWordLen") {
    assert(one[Double](TextAnalysis.punctRatio($"text"), "ab,cd!") == 2.0 / 6)
    assert(one[Double](TextAnalysis.meanWordLen($"text"), "ab cdef") == 3.0)
  }

  test("bpeTokenEstimate: ceil(len/4) per word") {
    // "spark"(2) "a"(1) "streaming"(3)
    assert(one[Long](TextAnalysis.bpeTokenEstimate($"text"), "spark a streaming") == 6L)
  }

  test("langId picks language with most marker hits, und fallback") {
    assert(one[String](TextAnalysis.langId($"text"), "the cat is in the house and it sleeps") == "en")
    assert(one[String](TextAnalysis.langId($"text"), "el perro y la casa de los gatos") == "es")
    assert(one[String](TextAnalysis.langId($"text"), "zzz qqq xxx") == "und")
  }

  test("fingerprint is case/punct/whitespace insensitive") {
    val f1 = one[String](TextAnalysis.fingerprint($"text"), "Hello, World!")
    val f2 = one[String](TextAnalysis.fingerprint($"text"), "hello world")
    val f3 = one[String](TextAnalysis.fingerprint($"text"), "hello worlds")
    assert(f1 == f2 && f1 != f3)
  }

  test("qualityScore within [0,1] and favors natural text") {
    val natural = ("the quick brown fox jumps over the lazy dog and runs to the house " * 10)
    val junk = "!!! ??? ### $$$ %%% ^^^ &&& *** ((( )))"
    val qn = one[Double](TextAnalysis.qualityScore($"text"), natural)
    val qj = one[Double](TextAnalysis.qualityScore($"text"), junk)
    assert(qn > qj)
    assert(qn >= 0.0 && qn <= 1.0 && qj >= 0.0 && qj <= 1.0)
  }

  test("redactPii scrubs emails, phones, and IPs into typed tokens") {
    import org.apache.spark.sql.functions.col
    val clean = one[String](TextAnalysis.redactPii(col("text")),
      "mail a.b+c@sub.example.org or call 555-123-4567, host 10.0.0.1 stays scrubbed")
    assert(clean ==
      "mail <EMAIL> or call <PHONE>, host <IP> stays scrubbed")
    // non-PII lookalikes survive: version strings, short digit runs
    val keep = one[String](TextAnalysis.redactPii(col("text")),
      "v1.2 released; 12-34 range; not-an-email@ nothing")
    assert(keep == "v1.2 released; 12-34 range; not-an-email@ nothing")
    // audit counts match the redactions
    val counts = Seq("a@b.co and c@d.org, dial 555-123-4567").toDF("text")
      .select(TextAnalysis.piiCounts(col("text")).map { case (n, c) => c.as(n) }: _*)
      .collect()(0)
    assert((counts.getLong(0), counts.getLong(1), counts.getLong(2)) == ((2L, 1L, 0L)))
    // sequential audit semantics: the email pass consumes the digits, so
    // no <PHONE> token appears and the audit must agree (n_phone = 0)
    val overlap = Seq("reach 555-123-4567@example.com today").toDF("text")
      .select(TextAnalysis.redactPii(col("text")).as("clean") +:
        TextAnalysis.piiCounts(col("text")).map { case (n, c) => c.as(n) }: _*)
      .collect()(0)
    assert(overlap.getString(0) == "reach <EMAIL> today")
    assert((overlap.getLong(1), overlap.getLong(2), overlap.getLong(3)) == ((1L, 0L, 0L)))
  }

  test("topBigramFraction: run-length fold equals brute-force counting") {
    import org.apache.spark.sql.functions.col
    // "a b a b a" -> bigrams: a b, b a, a b, b a -> top 2/4 = 0.5
    assert(one[Double](TextAnalysis.topBigramFraction(col("text")), "a b a b a") == 0.5)
    // all-identical tokens: one distinct bigram -> 1.0
    assert(one[Double](TextAnalysis.topBigramFraction(col("text")), "x x x x") == 1.0)
    // all-distinct bigrams -> 1/n
    assert(one[Double](TextAnalysis.topBigramFraction(col("text")), "a b c d e") == 0.25)
    // fewer than 2 tokens -> 0.0, and bigramCount agrees
    assert(one[Double](TextAnalysis.topBigramFraction(col("text")), "solo") == 0.0)
    assert(one[Long](TextAnalysis.bigramCount(col("text")), "solo") == 0L)
    assert(one[Long](TextAnalysis.bigramCount(col("text")), "a b c") == 2L)
    // property: fold equals brute force on random token strings
    val r = new scala.util.Random(13)
    (0 until 30).foreach { _ =>
      val toks = (0 until 2 + r.nextInt(30)).map(_ => s"t${r.nextInt(5)}")
      val expected = {
        val bgs = toks.sliding(2).map(_.mkString(" ")).toSeq
        math.rint(bgs.groupBy(identity).values.map(_.size).max.toDouble / bgs.size * 1e4) / 1e4
      }
      assert(one[Double](TextAnalysis.topBigramFraction(col("text")), toks.mkString(" ")) == expected)
    }
  }

  test("domain blocklist: extraction, case-folding, filter/flag duality") {
    import org.apache.spark.sql.functions.col
    val docs = Seq(
      (1L, "plain text, no urls"),
      (2L, "see https://Bad.Example.com/x and http://good.org/y"),
      (3L, "twice https://bad.example.com/a https://bad.example.com/b"),
      (4L, "http://good.org/only")
    ).toDF("doc_id", "text")
    val block = Seq("bad.example.com").toDF("domain")

    val hosts = docs.filter(col("doc_id") === 2)
      .select(TextAnalysis.extractDomains(col("text")))
      .collect()(0).getSeq[String](0).toSet
    assert(hosts == Set("bad.example.com", "good.org"))

    def hostsOf(text: String): Set[String] =
      Seq((1L, text)).toDF("doc_id", "text")
        .select(TextAnalysis.extractDomains(col("text")))
        .collect()(0).getSeq[String](0).toSet
    // userinfo URLs yield the HOST, not the credentials (real crawl form)
    assert(hostsOf("login https://user:pw@Host.Example/a") == Set("host.example"))
    assert(hostsOf("https://bob@mail.example/x") == Set("mail.example"))
    // scheme-less www hosts are extracted; embedded 'www' inside a word is not
    assert(hostsOf("deals at www.Shop.example/sale today") == Set("www.shop.example"))
    assert(hostsOf("awww.not-a-host oh") == Set.empty[String])
    // a schemed www URL is one host, not two
    assert(hostsOf("see https://www.both.example/p") == Set("www.both.example"))

    val kept = TextAnalysis.filterByDomainBlocklist(docs, block)
      .select("doc_id").as[Long].collect().toSet
    val flagged = TextAnalysis.flaggedByDomainBlocklist(docs, block)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(1L, 4L))
    assert(flagged == Set(2L, 3L))         // distinct hosts: 3 flags once
    assert(TextAnalysis.flaggedByDomainBlocklist(docs, block).count() == 2L)

    // Plans: both sides broadcast — the corpus is never shuffled for a
    // screening pass; the flag side must be the HASH join (scales to
    // huge blocklists), the filter side the anti nested-loop.
    val flagPlan = TextAnalysis.flaggedByDomainBlocklist(docs, block)
      .queryExecution.executedPlan.toString
    assert(flagPlan.contains("BroadcastHashJoin"), s"flag side must hash-join:\n$flagPlan")
    val filterPlan = TextAnalysis.filterByDomainBlocklist(docs, block)
      .queryExecution.executedPlan.toString
    assert(filterPlan.contains("BroadcastNestedLoopJoin"),
      s"filter side must broadcast:\n$filterPlan")
    Seq(flagPlan, filterPlan).foreach { p =>
      assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"))
    }
  }

  test("dupLineStats counts repeated lines and their character mass") {
    import org.apache.spark.sql.functions.col
    def stats(text: String): (Long, Long, Double, Double) = {
      val r = Seq(text).toDF("text")
        .select(TextAnalysis.dupLineStats(col("text")).as("d"))
        .select("d.n_lines", "d.n_unique", "d.dup_line_frac", "d.dup_char_frac")
        .collect()(0)
      (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3))
    }
    // "aaaa" twice + "bb": 3 lines, 2 unique, 1/3 dup lines,
    // dup chars = 4 of 10.
    assert(stats("aaaa\nbb\naaaa") == ((3L, 2L, 0.3333, 0.4)))
    // blank/whitespace lines don't count
    assert(stats("x\n\n   \nx") == ((2L, 1L, 0.5, 0.5)))
    // all distinct -> zeros
    assert(stats("a\nb\nc") == ((3L, 3L, 0.0, 0.0)))
    // no non-empty lines -> zeros, no division blowup
    assert(stats("  \n ") == ((0L, 0L, 0.0, 0.0)))
    // NULL text -> zeros too (not -1 counts / NULL fractions from
    // Spark's legacy size(null) = -1)
    val nr = Seq((1L, null: String)).toDF("id", "text")
      .select(TextAnalysis.dupLineStats(col("text")).as("d"))
      .select("d.n_lines", "d.n_unique", "d.dup_line_frac", "d.dup_char_frac")
      .collect()(0)
    assert((nr.getLong(0), nr.getLong(1), nr.getDouble(2), nr.getDouble(3)) ==
      ((0L, 0L, 0.0, 0.0)))
  }

  test("c4Signals: line rules, page flags, keep verdict") {
    def sig(text: String): (String, Long, Long, Boolean, Boolean, Boolean) = {
      val r = Seq(text).toDF("text")
        .select(TextAnalysis.c4Signals(col("text"), minLineWords = 3,
          minSentences = 2).as("c"))
        .select("c.text_c4", "c.n_kept_lines", "c.n_sentences",
          "c.has_lorem", "c.has_brace", "c.keep")
        .collect()(0)
      (r.getString(0), r.getLong(1), r.getLong(2),
        r.getBoolean(3), r.getBoolean(4), r.getBoolean(5))
    }
    // good page: two sentences survive, short/unpunctuated/js lines drop
    val good = sig("A first full sentence here.\nshort line\n" +
      "no terminal punctuation on this line\n" +
      "Enable javascript to proceed please.\nA second one closes it!")
    assert(good == (("A first full sentence here.\nA second one closes it!",
      2L, 2L, false, false, true)))
    // closing-quote terminal punctuation counts
    assert(sig("He said \"stop right there.\"\nAnd then it truly ended.")._6)
    // lorem ipsum / brace pages are flagged and dropped page-level
    assert(sig("Nice sentence one.\nlorem ipsum filler text.\nNice sentence two.") ==
      (("Nice sentence one.\nlorem ipsum filler text.\nNice sentence two.",
        3L, 3L, true, false, false)))
    assert(!sig("Object { nested } stuff.\nSecond sentence here.")._6)
    // sentence floor: one kept sentence < 2 -> dropped
    assert(!sig("Only one good sentence lives here.")._6)
    // null-safe
    assert(sig(null.asInstanceOf[String]) == (("", 0L, 0L, false, false, false)))
  }

  test("analyze attaches all columns") {
    val df = TextAnalysis.analyze(Seq((1L, "the small test text")).toDF("doc_id", "text"))
    val cols = df.columns.toSet
    assert(Set("n_tokens", "n_tokens_bpe", "punct_ratio", "stopword_ratio",
      "mean_word_len", "quality", "lang_pred", "fingerprint").subsetOf(cols))
    assert(df.count() == 1)
  }

  test("regexTokens: contractions, letter/digit/punct runs, bare apostrophe") {
    val toks = Seq((1L, "It's 42 well-known... don't 'x' y")).toDF("doc_id", "text")
      .select(TextAnalysis.regexTokens(col("text")).as("t"))
      .as[Seq[String]].collect()(0)
    // lowered; contraction suffixes split; digits grouped; punctuation
    // runs grouped (space-free); bare apostrophes stand alone
    assert(toks == Seq("it", "'s", "42", "well", "-", "known", "...",
      "don", "'t", "'", "x", "'", "y"))
  }

  test("token_tf kernel ≡ composed regexTokens counts; vocabulary plan has ONE exchange") {
    import graft.functions.GraftFunctions
    GraftFunctions.register(spark)
    val docs = Seq(
      (1L, "It's 42 well-known... don't 'x' aa AA"),
      (2L, ""),
      (3L, "aa bb aa bb aa")
    ).toDF("doc_id", "text")
    // kernel per-doc counts == explode+groupBy of the composed tokens
    val kern = docs
      .select(col("doc_id"), explode(GraftFunctions.tokenTf(col("text"))).as("e"))
      .select(col("doc_id"), col("e.token"), col("e.tf"))
      .as[(Long, String, Long)].collect().toSet
    val composed = docs
      .select(col("doc_id"), explode(TextAnalysis.regexTokens(col("text"))).as("token"))
      .groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))
      .as[(Long, String, Long)].collect().toSet
    assert(kern == composed)
    // the empty doc contributes no entries
    assert(!kern.exists(_._1 == 2L))
    // one Exchange total: per-doc vocabularies shuffle once, never twice.
    // Write to parquet first (ConvertToLocalRelation folds local frames).
    val dir = java.nio.file.Files.createTempDirectory("ttf").toString
    docs.write.parquet(s"$dir/docs")
    val stored = spark.read.parquet(s"$dir/docs")
    val plan = TextAnalysis.tokenVocabulary(stored, topK = 5)
      .queryExecution.executedPlan.toString
    assert(plan.split("Exchange").length - 1 == 1,
      s"expected exactly one exchange:\n$plan")
  }

  test("tokenVocabulary: occurrence + doc frequencies, deterministic top-k") {
    val docs = Seq(
      (1L, "aa bb aa"),
      (2L, "aa cc"),
      (3L, "bb! bb")
    ).toDF("doc_id", "text")
    val v = TextAnalysis.tokenVocabulary(docs, topK = 3)
      .as[(String, Long, Long)].collect()
    // counts: aa=3(2 docs) bb=3(2 docs) !=1 cc=1; tie aa/bb breaks token asc
    assert(v.toSeq == Seq(("aa", 3L, 2L), ("bb", 3L, 2L), ("!", 1L, 1L)))
  }

  test("normalizeText: NFC composition, line endings, controls, runs, trim") {
    import graft.functions.GraftFunctions
    GraftFunctions.register(spark)
    def norm(s: String): String =
      Seq((1L, s)).toDF("doc_id", "text")
        .select(TextAnalysis.normalizeText(col("text")).as("n"))
        .as[String].collect()(0)
    // decomposed e + combining acute (U+0301) composes to U+00E9
    assert(norm("cafe\u0301") == "caf\u00e9")
    // already-composed unchanged
    assert(norm("caf\u00e9") == "caf\u00e9")
    // CRLF and lone CR become LF; newline survives the control strip
    assert(norm("a\r\nb\rc") == "a\nb\nc")
    // C0 controls and DEL stripped, tab/space runs collapse, outer trim
    assert(norm("  a\u0001b \t  c\u007fd  ") == "ab cd")
    // idempotent
    assert(norm(norm("  x\r\n\ty  ")) == norm("  x\r\n\ty  "))
  }

  test("trainBpe: the Sennrich fixture merges in the expected order") {
    // low×5, lower×2, newest×6, widest×3 — the BPE paper's running
    // example. Pair counts at iteration 0: (e,s)=(s,t)=(t,</w>)=9,
    // tie → lexicographic lhs picks (e,s); then the merged symbol
    // cascades: (es,t), (est,</w>), then the l-o-w cluster at 7.
    val docs = Seq.tabulate(5)(i => (i.toLong, "low"))
      .++(Seq.tabulate(2)(i => (100L + i, "lower")))
      .++(Seq.tabulate(6)(i => (200L + i, "newest")))
      .++(Seq.tabulate(3)(i => (300L + i, "widest")))
      .toDF("doc_id", "text")
    val merges = TextAnalysis.trainBpe(docs, nMerges = 5)
    assert(merges.map(m => (m.lhs, m.rhs, m.n)) == Seq(
      ("e", "s", 9L), ("es", "t", 9L), ("est", "</w>", 9L),
      ("l", "o", 7L), ("lo", "w", 7L)))
    assert(merges.map(_.rank) == Seq(1, 2, 3, 4, 5))
    // pair-count surface agrees with the trainer's iteration 0
    val top = TextAnalysis.bpePairCounts(docs, maxWords = 10, topK = 3)
      .as[(String, String, Long)].collect().toSeq
    assert(top == Seq(("e", "s", 9L), ("s", "t", 9L), ("t", "</w>", 9L)))
    // merge exhaustion: more merges than pairs terminates cleanly
    val tiny = Seq((1L, "ab")).toDF("doc_id", "text")
    val all = TextAnalysis.trainBpe(tiny, nMerges = 10)
    assert(all.size <= 10 && all.nonEmpty)
    assert(all.last.lhs + all.last.rhs == "ab</w>")
  }

  test("unigram vocab: ML log-probs, deterministic top-k cut, global total") {
    val docs = Seq(
      (1L, "a a a b b c"),
      (2L, "a b z")
    ).toDF("doc_id", "text")
    val v = TextAnalysis.unigramVocab(docs, k = 3)
      .as[(String, Long, Long, Double)].collect()
    // counts: a=4 b=3 c=1 z=1, total=9; tie at cnt=1 breaks by token asc
    assert(v.map(x => (x._1, x._2, x._3)).toSeq ==
      Seq(("a", 4L, 9L), ("b", 3L, 9L), ("c", 1L, 9L)))
    assert(math.abs(v(0)._4 - math.log(4.0 / 9.0)) < 1e-12)
  }

  test("lmScore: mean sorted-order ln-prob, OOV floor, empty doc -> zeros") {
    val docs = Seq(
      (1L, "a a b"),
      (2L, "z a"),
      (3L, "   ")
    ).toDF("doc_id", "text")
    val vocab = TextAnalysis.unigramVocab(docs, k = 2) // keeps a, b; z is OOV
    val got = TextAnalysis.lmScore(docs, vocab)
      .orderBy("doc_id").as[(Long, Double, Long, Long)].collect()
    val total = 5.0
    val lpa = math.log(3.0 / total); val lpb = math.log(1.0 / total)
    val oov = math.log(1.0 / (total + 1.0))
    def r4(x: Double) = BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got(0) == ((1L, r4((lpa + lpa + lpb) / 3.0), 3L, 0L)))
    // sorted fold: a then z
    assert(got(1) == ((2L, r4((lpa + oov) / 2.0), 2L, 1L)))
    assert(got(2) == ((3L, 0.0, 0L, 0L)))
  }

  test("lmScore scoring pass: no join, no shuffle — one kernel projection") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    // parquet round-trip: ConvertToLocalRelation folds a local fixture
    // into LocalTableScan before the kernel is visible (SKILL.md gotcha)
    val dir = java.nio.file.Files.createTempDirectory("lmplan").toString
    Seq((1L, "a b"), (2L, "b c")).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(dir)
    val docs = spark.read.parquet(dir)
    val scored = TextAnalysis.lmScore(docs,
      TextAnalysis.unigramVocab(docs, k = 2))
    val plan = scored.queryExecution.executedPlan
    // vocab is baked into the lm_score literal (model-table collect),
    // so the scoring pass is a bare projection over the corpus: any
    // join or exchange would mean the old broadcast-map shape came back
    assert(plan.collect { case e: ShuffleExchangeLike => e }.isEmpty,
      s"lmScore shuffled the corpus:\n$plan")
    assert(!plan.toString.contains("Join"), s"lmScore joined the vocab:\n$plan")
    assert(plan.toString.contains("lm_score"), s"kernel missing:\n$plan")
  }

  test("gopherFlags: each rule fires alone; a good doc passes all") {
    val good = (("the quick brown fox jumps over the lazy dog and runs away " +
      "to be free of all that has been with them here today now then ") * 4).trim
    def flags(t: String) = {
      val r = Seq(Tuple1(t)).toDF("text")
        .select(TextAnalysis.gopherFlags(col("text")).as("g"))
        .select("g.*").collect()(0)
      (r.getLong(0), r.getDouble(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5), r.getLong(6), r.getBoolean(7))
    }
    val g = flags(good)
    assert(g._8, s"good doc should pass: $g")
    // Word count floor.
    assert(!flags("too few words here the and of that")._8)
    // Bullet domination (10 bullets, 1 prose line).
    val bullets = good + "\n" + (1 to 10).map(i => s"- b $i").mkString("\n")
    val gb = flags(bullets)
    assert(gb._4 > 0.9 - 1e-9 && !gb._8)
    // Ellipsis-ended lines over 30%.
    val ell = good + "\nRead on...\nMore...\nAgain...\nAnd..."
    assert(flags(ell)._5 > 0.3 && !flags(ell)._8)
    // Symbol burst.
    val sym = good + " " + ("# " * 15).trim
    assert(flags(sym)._3 > 0.1 && !flags(sym)._8)
    // All digits: alpha fraction + stop words both fail.
    val digits = flags(("1234 5678 " * 30).trim)
    assert(digits._6 == 0.0 && digits._7 == 0L && !digits._8)
    // NULL text -> zero struct, not NULLs.
    val nullRow = Seq(Tuple1(null.asInstanceOf[String])).toDF("text")
      .select(TextAnalysis.gopherFlags(col("text")).as("g"))
      .select("g.n_words", "g.keep").collect()(0)
    assert(nullRow.getLong(0) == 0L && !nullRow.getBoolean(1))
  }

  test("canonicalizeUrl: every rule, and the ones that must NOT fire") {
    val cases = Seq(
      // host case + default port + www + trailing slash + tracking param
      "https://WWW.Example.com:443/a/b/?utm_source=feed&x=1" -> "https://example.com/a/b?x=1",
      // userinfo + :80 + fragment
      "http://user:pw@example.com:80/a/b#frag" -> "http://example.com/a/b",
      // adjacent tracking params collapse in one pass (the HOF, not regex iteration)
      "https://example.com/p?utm_a=1&utm_b=2&gclid=z&keep=3" -> "https://example.com/p?keep=3",
      // all params tracking -> no dangling '?'
      "https://example.com/p?utm_a=1&fbclid=2" -> "https://example.com/p",
      // root slash stripped; scheme lowercased
      "HTTPS://EXAMPLE.COM/" -> "https://example.com",
      // non-default port kept; path case kept
      "https://example.com:8443/CaseSensitive/Path" -> "https://example.com:8443/CaseSensitive/Path",
      // scheme-less: only frag/query/slash cleanup, www kept, case kept
      "www.Example.com/a/?utm_x=1#f" -> "www.Example.com/a",
      // non-http scheme: www NOT stripped (policy is https? only)
      "ftp://www.example.com/f" -> "ftp://www.example.com/f")
    val got = cases.map(_._1).toDF("url")
      .select(TextAnalysis.canonicalizeUrl(col("url"))).as[String].collect()
    cases.map(_._2).zip(got).foreach { case (want, g) => assert(g == want) }
  }

  test("urlResolution keeps min id per canonical url") {
    val docs = Seq(
      (5L, "https://A.com/x/"), (3L, "https://a.com/x"), (9L, "https://b.com/y")
    ).toDF("doc_id", "url")
    val res = TextAnalysis.urlResolution(docs, "url")
      .as[(Long, String, Boolean)].collect().toSet
    assert(res == Set((3L, "https://a.com/x", true), (5L, "https://a.com/x", false),
      (9L, "https://b.com/y", true)))
  }

  private def encodeOne(word: String, merges: Seq[(String, String)]): Seq[String] =
    Seq(word).toDF("w")
      .select(graft.functions.GraftFunctions.bpeEncode(col("w"), merges).as("s"))
      .as[Seq[String]].head()

  test("bpe_encode: trained Sennrich merges segment seen and unseen words") {
    val docs = Seq.tabulate(5)(i => (i.toLong, "low"))
      .++(Seq.tabulate(2)(i => (100L + i, "lower")))
      .++(Seq.tabulate(6)(i => (200L + i, "newest")))
      .++(Seq.tabulate(3)(i => (300L + i, "widest")))
      .toDF("doc_id", "text")
    val merges = TextAnalysis.trainBpe(docs, nMerges = 5)
      .map(m => (m.lhs, m.rhs))
    // merges: (e,s)(es,t)(est,</w>)(l,o)(lo,w)
    assert(encodeOne("lowest", merges) == Seq("low", "est</w>"))
    assert(encodeOne("newest", merges) == Seq("n", "e", "w", "est</w>"))
    // unseen word falls back to codepoints
    assert(encodeOne("stew", merges) == Seq("s", "t", "e", "w", "</w>"))
    // empty merge list = plain codepoint split
    assert(encodeOne("ab", Nil) == Seq("a", "b", "</w>"))
    // surrogate pairs stay one symbol (the regexp '.' rule)
    assert(encodeOne("𝄞x", Nil) == Seq("𝄞", "x", "</w>"))
  }

  test("bpe_encode: kernel pass is equivalent to the oracle's fold replay") {
    // The DuckDB oracle replays each merge as a left fold: last(acc)==lhs
    // and incoming==rhs collapse to lhs+rhs. Pin the equivalence with the
    // kernel's left-to-right non-overlapping pass on adversarial alphabets
    // (overlapping pairs like (a,a) and multi-char symbols like (aa,a)).
    def foldPass(syms: Seq[String], l: String, r: String): Seq[String] =
      syms.foldLeft(Vector.empty[String]) { (acc, x) =>
        if (acc.nonEmpty && acc.last == l && x == r) acc.init :+ (l + r)
        else acc :+ x
      }
    val rnd = new scala.util.Random(42)
    val words = Seq.tabulate(120)(_ =>
      Seq.fill(rnd.nextInt(9))("ab".charAt(rnd.nextInt(2)).toString).mkString)
    val pool = Seq("a", "b", "aa", "ab", "ba", "</w>", "aab")
    val mergeSets = Seq.tabulate(40)(_ =>
      Seq.fill(1 + rnd.nextInt(4))((pool(rnd.nextInt(5)), pool(rnd.nextInt(pool.size)))))
    for (ms <- mergeSets) {
      val got = words.toDF("w")
        .select(col("w"), graft.functions.GraftFunctions.bpeEncode(col("w"), ms).as("s"))
        .as[(String, Seq[String])].collect().toMap
      for (w <- words) {
        val exp = ms.foldLeft((w.map(_.toString) :+ "</w>"): Seq[String]) {
          case (syms, (l, r)) => foldPass(syms, l, r)
        }
        assert(got(w) == exp, s"word=$w merges=$ms")
      }
    }
  }

  test("bpe merges artifact: save/load round trip incl. apostrophes") {
    val dir = java.nio.file.Files.createTempDirectory("bpe-artifact")
    val path = s"$dir/merges.txt"
    val merges = Seq(
      TextAnalysis.BpeMerge(1, "'", "s", 42L),
      TextAnalysis.BpeMerge(2, "'s", "</w>", 17L),
      TextAnalysis.BpeMerge(3, "é", "e", 3L))
    TextAnalysis.saveBpe(path, merges)
    assert(TextAnalysis.loadBpe(path) == merges)
  }

  test("bpeTokenCountPerDoc: per-doc budget fold, empty doc = 0/0") {
    val docs = Seq((1L, "low low lower"), (2L, ""), (3L, "low")).toDF("doc_id", "text")
    val merges = Seq(
      TextAnalysis.BpeMerge(1, "l", "o", 0L), TextAnalysis.BpeMerge(2, "lo", "w", 0L))
    val got = TextAnalysis.bpeTokenCountPerDoc(docs, merges)
      .orderBy("doc_id").as[(Long, Long, Long)].collect().toSeq
    // low → [low </w>] (2 syms); lower → [low e r </w>] (4 syms)
    assert(got == Seq((1L, 3L, 8L), (2L, 0L, 0L), (3L, 1L, 2L)))
  }

  test("bpeTokenCountPerDoc: NULL text reports 0/0 like the oracle, never NULL") {
    // token_tf null-propagates on null input; the counts must coalesce to
    // 0/0 (the generated oracle's LEFT JOIN + coalesce posture) — a NULL
    // cost reaching assignBinsByCost would poison a whole bin.
    val docs = Seq((1L, "low low"), (2L, null: String)).toDF("doc_id", "text")
    val merges = Seq(TextAnalysis.BpeMerge(1, "l", "o", 0L))
    val got = TextAnalysis.bpeTokenCountPerDoc(docs, merges)
      .orderBy("doc_id").as[(Long, Long, Long)].collect().toSeq
    assert(got == Seq((1L, 2L, 6L), (2L, 0L, 0L)))
  }

  test("bpeRoundtripPerDoc: decode∘encode ≡ pre-token identity, even on marker-shaped text") {
    // Doc 2 contains the literal text "</w>" — its pre-tokens include
    // symbols that can merge INTO marker-looking strings, so only the
    // one TRAILING marker may be stripped. Doc 3: apostrophe splits.
    val docs = Seq(
      (1L, "low lower lowest"),
      (2L, "tag </w> end"),
      (3L, "it's O'Neil's")).toDF("doc_id", "text")
    val merges = Seq(
      TextAnalysis.BpeMerge(1, "l", "o", 0L),
      TextAnalysis.BpeMerge(2, "lo", "w", 0L),
      TextAnalysis.BpeMerge(3, "low", "</w>", 0L), // merges INTO the marker
      TextAnalysis.BpeMerge(4, "<", "/", 0L))
    val got = TextAnalysis.bpeRoundtripPerDoc(docs, merges)
      .orderBy("doc_id").as[(Long, Long, String)].collect().toSeq
    // Expected = the identity computed INDEPENDENTLY (Java regex
    // pre-tokenize, join with spaces, md5) — no Spark, no BPE.
    def fp(s: String) = {
      val md = java.security.MessageDigest.getInstance("MD5")
      md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    }
    val pat = java.util.regex.Pattern.compile(TextAnalysis.BpeTokenPattern)
    def pretoks(s: String): Seq[String] = {
      val m = pat.matcher(s.toLowerCase)
      val b = Seq.newBuilder[String]
      while (m.find()) b += m.group()
      b.result()
    }
    val want = Seq((1L, "low lower lowest"), (2L, "tag </w> end"),
      (3L, "it's O'Neil's")).map { case (id, txt) =>
      val ts = pretoks(txt)
      (id, ts.size.toLong, fp(ts.mkString(" ")))
    }
    assert(got == want, s"roundtrip diverged:\n got=$got\nwant=$want")
    // Sanity on the fixture shape: the marker-text doc splits into 5
    // pre-tokens (tag, </, w, >, end) — the merge INTO "</w" must not
    // let the strip eat interior marker-shaped text.
    assert(got(1)._2 == 5L)
  }

  test("bpeTokenCounts: symbol frequencies under an explicit merge list") {
    val docs = Seq((1L, "low low lower")).toDF("doc_id", "text")
    val merges = Seq(
      TextAnalysis.BpeMerge(1, "l", "o", 0L), TextAnalysis.BpeMerge(2, "lo", "w", 0L))
    val got = TextAnalysis.bpeTokenCounts(docs, merges, topK = 10)
      .as[(String, Long)].collect().toSeq
    // low×2 → [low </w>]; lower → [low e r </w>]; ties break sym-ascending
    assert(got == Seq(("</w>", 3L), ("low", 3L), ("e", 1L), ("r", 1L)))
  }

  test("tokenizerFertility: per-language rollup, ratios of sums, nb >= np") {
    val docs = Seq(
      (1L, "the quick fox and the lazy dog with some words", 47L),
      (2L, "the cat and the hat are on the mat for the win", 47L),
      (3L, "der hund und die katze sind auf der matte mit der zeit", 55L),
      (4L, "zzz qqq xxx", 11L) // no markers -> und
    ).toDF("doc_id", "text", "n_chars")
    val merges = Seq(TextAnalysis.BpeMerge(1, "t", "h", 0L),
      TextAnalysis.BpeMerge(2, "th", "e", 0L))
    val got = TextAnalysis.tokenizerFertility(docs, merges)
      .orderBy("lang_pred")
      .as[(String, Long, Long, Long, Long, Double, Double)].collect()
    val langs = got.map(_._1).toSeq
    assert(langs == Seq("de", "en", "und"))
    assert(got.map(_._2).sum == 4L)
    got.foreach { case (_, _, np, nb, nc, fert, cpt) =>
      assert(nb >= np, "every pre-token encodes to >= 1 symbol")
      assert(math.abs(fert - (nb.toDouble / np)) < 5e-5)
      assert(math.abs(cpt - (nc.toDouble / nb)) < 5e-5)
    }
    // 'the' merges fully for en docs -> en fertility strictly below de's
    val byLang = got.map(r => r._1 -> r._6).toMap
    assert(byLang("en") < byLang("de"))
  }

  test("unigramDrift: exact cross-multiplied ranking, absent terms filled") {
    // old: aa=2 bb=1 cc=1 (A=4); new: aa=1 bb=2 dd=2 (B=5)
    // drift |tf_new*A - tf_old*B|: dd=8, aa=6, cc=5, bb=3
    val old = Seq((1L, "aa bb"), (2L, "aa cc")).toDF("doc_id", "text")
    val nw = Seq((1L, "aa bb"), (2L, "bb dd dd")).toDF("doc_id", "text")
    val d = TextAnalysis.unigramDrift(old, nw, topK = 10)
      .as[(String, Long, Long, Long, Double, Double)].collect()
    assert(d.map(r => (r._1, r._2, r._3, r._4)).toSeq ==
      Seq(("dd", 0L, 2L, 8L), ("aa", 2L, 1L, 6L),
        ("cc", 1L, 0L, 5L), ("bb", 1L, 2L, 3L)))
    val aa = d.find(_._1 == "aa").get
    assert(aa._5 == 0.5 && aa._6 == 0.2)
    // topK truncates on the total (drift DESC, token ASC) order
    val top2 = TextAnalysis.unigramDrift(old, nw, topK = 2)
      .as[(String, Long, Long, Long, Double, Double)].collect().map(_._1).toSeq
    assert(top2 == Seq("dd", "aa"))
  }
}
