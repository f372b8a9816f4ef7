package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{TextAnalysis => TA}
import graft.queries.TextQueries

/** Repetition signals (Gopher-style) and PII scrubbing — SURVEY.md §2
  * rows 55/56. Handcrafted-value unit checks plus endpoint checks of the
  * injected-corpus queries.
  */
class TextAnalysisSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("native token counters: bit parity with split/regexp_count on adversarial strings") {
    val fixtures = Seq(
      "", " ", "  ", "a", "a b", "a  b", " a b ", "abc123def", "ABC",
      "Hello, World!  42x", "a\tb\nc", "tab\tafter", "line1\nline2\n",
      "héllo wörld", "日本語 テスト", "emoji 👍🏽 pair", "mixed ÅB9c déf",
      "a1b2c3", "...", "a,b.c;d", "  leading", "trailing  ",
      "unicode space", "zz99  !!", "ínterior-dash_und"
    )
    val df = fixtures.zipWithIndex.map { case (s, i) => (i.toLong, s) }.toDF("id", "text")
    val cmp = df.select(
      TA.wsTokenCount($"text").as("ws_native"),
      size(split($"text", " ")).as("ws_decl"),
      TA.regexTokenCount($"text").as("lex_native"),
      regexp_count($"text", lit("[a-z]+|[0-9]+|[^a-z0-9 ]")).as("lex_decl"),
      $"text").collect()
    cmp.foreach { r =>
      assert(r.getInt(0) == r.getInt(1), s"ws mismatch on '${r.getString(4)}'")
      assert(r.getInt(2) == r.getInt(3), s"lex mismatch on '${r.getString(4)}'")
    }
    // null text propagates null through both counters
    val nulls = Seq((1L, null: String)).toDF("id", "text")
      .select(TA.wsTokenCount($"text"), TA.regexTokenCount($"text")).head()
    assert(nulls.isNullAt(0) && nulls.isNullAt(1))
  }

  test("readability: hand-computed counts and Flesch score; sentence floor") {
    val df = Seq(
      (1L, "the cat sat. the dog ran! was it fun?"), // 3 sents, 9 words
      (2L, "no terminal punctuation here")           // floored to 1 sentence
    ).toDF("doc_id", "text")
    val out = df.select($"doc_id",
      TA.sentenceCount($"text").as("s"),
      TA.wsTokenCount($"text").as("w"),
      TA.syllableProxy($"text").as("y"),
      TA.fleschScore($"text").as("f")).orderBy($"doc_id").collect()
    assert(out(0).getInt(1) == 3)
    assert(out(0).getInt(2) == 9)
    // vowel groups: e,a,a,e,o,a,a,i,u -> "the"=1,"cat"=1,"sat."=1,
    // "the"=1,"dog"=1,"ran!"=1,"was"=1,"it"=1,"fun?"=1 = 9
    assert(out(0).getInt(3) == 9)
    val f0 = 206.835 - 1.015 * (9.0 / 3.0) - 84.6 * (9.0 / 9.0)
    assert(out(0).getDouble(4) == f0)
    assert(out(1).getInt(1) == 1) // floor
  }

  test("dupLineFrac: duplicate and blank lines handled; line-less text is 0") {
    val df = Seq(
      (1L, "alpha\nbeta\nalpha"),       // 3 lines, 2 distinct -> 1/3
      (2L, "alpha\n\n  \nbeta"),        // blanks dropped -> 0.0
      (3L, ""),                         // no non-blank lines -> 0.0
      (4L, "same\nsame\nsame\nsame")    // 4 lines, 1 distinct -> 0.75
    ).toDF("doc_id", "text")
    val out = df.select($"doc_id", TA.dupLineFrac($"text").as("f"),
        size(TA.nonBlankLines($"text")).as("n"))
      .orderBy($"doc_id").collect()
    assert(out(0).getDouble(1) === 1.0 - 2.0 / 3.0)
    assert(out(1).getDouble(1) == 0.0 && out(1).getInt(2) == 2)
    assert(out(2).getDouble(1) == 0.0 && out(2).getInt(2) == 0)
    assert(out(3).getDouble(1) == 0.75)
  }

  test("dedupLinesWithin: first occurrence kept in order; empty/all-dup edges") {
    val df = Seq(
      (1L, "a\nb\na\nc\nb"),   // -> a b c
      (2L, "same\nsame\nsame"), // -> same
      (3L, ""),                 // single empty line survives
      (4L, "only")              // untouched
    ).toDF("doc_id", "text")
    val out = df.select($"doc_id", TA.dedupLinesWithin($"text").as("t"))
      .orderBy($"doc_id").collect().map(_.getString(1)).toSeq
    assert(out == Seq("a\nb\nc", "same", "", "only"))
  }

  test("dupNgramFrac: repeated n-grams counted; short docs are 0") {
    val df = Seq(
      (1L, "x y x y x"), // 2-grams: [x y, y x, x y, y x] -> 1 - 2/4 = 0.5
      (2L, "a b c d"),   // all distinct -> 0.0
      (3L, "solo")       // fewer than 2 tokens -> 0.0
    ).toDF("doc_id", "text")
    val out = df.select($"doc_id",
        TA.dupNgramFrac($"text", 2).as("f2"),
        TA.dupNgramFrac($"text", 3).as("f3"))
      .orderBy($"doc_id").collect()
    assert(out(0).getDouble(1) == 0.5)
    // 3-grams of "x y x y x": [x y x, y x y, x y x] -> 1 - 2/3
    assert(out(0).getDouble(2) === 1.0 - 2.0 / 3.0)
    assert(out(1).getDouble(1) == 0.0 && out(1).getDouble(2) == 0.0)
    assert(out(2).getDouble(1) == 0.0)
  }

  test("PII: counts match injections and the scrub removes every match") {
    val df = Seq(
      (1L, "reach me at bob@x.io or 555-123-4567 thanks"),
      (2L, "two mails a@b.co c.d@e-f.org and no phone"),
      (3L, "digits 12-345-6789 but no pii here"),
      // scrub runs on RAW text — mixed case must redact (round-3 ADVICE)
      (4L, "write User@Example.COM today")
    ).toDF("doc_id", "text")
    val out = df.select($"doc_id",
        TA.emailCount($"text").as("e"), TA.phoneCount($"text").as("p"),
        TA.scrubPii($"text").as("s"))
      .orderBy($"doc_id").collect()
    assert(out(0).getInt(1) == 1 && out(0).getInt(2) == 1)
    assert(out(0).getString(3) == "reach me at <EMAIL> or <PHONE> thanks")
    assert(out(1).getInt(1) == 2 && out(1).getInt(2) == 0)
    assert(out(2).getInt(1) == 0 && out(2).getInt(2) == 0)
    assert(out(3).getInt(1) == 1 && out(3).getString(3) == "write <EMAIL> today")
    // scrubbed text never re-matches
    val rescan = df.select(TA.scrubPii($"text").as("s"))
      .select(TA.emailCount($"s").as("e"), TA.phoneCount($"s").as("p"))
      .agg(sum($"e").as("e"), sum($"p").as("p")).head()
    assert(rescan.getLong(0) == 0L && rescan.getLong(1) == 0L)
  }

  test("q_text_repetition: %3 docs carry the duplicated echo line") {
    val out = TextQueries.queries("q_text_repetition")(spark, TestSpark.Sf0001)
      .collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val f = r.getAs[Double]("dup_line_frac")
      if (id % 3 == 0) assert(f === 1.0 - 2.0 / 3.0, s"doc $id")
      else assert(f == 0.0, s"doc $id")
      // tiny vocabulary corpus: 2-gram repetition is strictly positive on
      // any doc long enough, and fractions are well-formed
      val f2 = r.getAs[Double]("dup_2gram_frac")
      assert(f2 >= 0.0 && f2 < 1.0)
    }
  }

  test("q_pii_scrub: counts follow the %7/%13 injections, scrub verified") {
    val out = TextQueries.queries("q_pii_scrub")(spark, TestSpark.Sf0001)
      .collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      assert(r.getAs[Long]("n_emails") == (if (id % 7 == 0) 1L else 0L), s"doc $id")
      assert(r.getAs[Long]("n_phones") == (if (id % 13 == 0) 1L else 0L), s"doc $id")
    }
    // the scrubbed fingerprint differs from the raw-text fingerprint
    // exactly on the PII-bearing docs
    val pii = TextQueries.piiCorpus(spark, TestSpark.Sf0001)
    val changed = pii.select($"doc_id",
        (md5($"text") =!= md5(TA.scrubPii($"text"))).as("changed"))
      .collect()
    changed.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      assert(r.getAs[Boolean]("changed") == (id % 7 == 0 || id % 13 == 0), s"doc $id")
    }
  }

  test("RepSignalsExpr: hand-computed top/dup census, ties to smallest gram") {
    import graft.functions.RepSignalsExpr.repSignals
    val df = Seq(
      (1L, "x y x y x"),          // 2-grams: {x y:2, y x:2} tie -> 'x y'
      (2L, "c c d d c c d d"),    // {c c:2, c d:2, d d:2, d c:1} -> 'c c'
      (3L, "a b c d"),            // all distinct -> top cnt 1, dup 0
      (4L, "solo")                // shorter than n -> zeros
    ).toDF("doc_id", "text")
    val out = df.select($"doc_id", repSignals(split($"text", " "), 2).as("s"))
      .orderBy($"doc_id").collect().map(_.getSeq[Long](1))
    // doc 1: top 'x y' cnt 2 chars 3; every gram duplicated -> all 5
    // 1-char tokens covered
    assert(out(0) == Seq(2L, 3L, 5L))
    // doc 2: tie among {c c, c d, d d} at cnt 2 -> smallest 'c c';
    // covered = every token except none (gram 'd c' is unique but its
    // tokens are covered by neighbors) -> 8 chars
    assert(out(1) == Seq(2L, 3L, 8L))
    assert(out(2) == Seq(1L, 3L, 0L))
    assert(out(3) == Seq(0L, 0L, 0L))
    // n=3 on doc 1: 'x y x' appears at 0 and 2 -> top (2, 5); coverage
    // 0..2 union 2..4 = all 5 tokens
    val t3 = df.filter($"doc_id" === 1)
      .select(repSignals(split($"text", " "), 3)).head().getSeq[Long](0)
    assert(t3 == Seq(2L, 5L, 5L))
    // interpreted path (direct static call) agrees with codegen
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.unsafe.types.UTF8String
    val arr = new GenericArrayData(
      "x y x y x".split(" ").map(UTF8String.fromString(_).asInstanceOf[Any]))
    val interp = graft.functions.RepSignalsExpr.signals(arr, 2)
    assert((0 until 3).map(interp.getLong) == Seq(2L, 3L, 5L))
  }

  test("q_gopher_quality: injected artifacts drive the rules; verdict varies") {
    val out = TextQueries.queries("q_gopher_quality")(spark, TestSpark.Sf0001)
      .collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val bullet = r.getAs[Double]("bullet_line_frac")
      if (id % 4 == 0) assert(bullet > 0.0, s"doc $id") else assert(bullet == 0.0, s"doc $id")
      val ell = r.getAs[Double]("ellipsis_line_frac")
      if (id % 5 != 0) assert(ell == 0.0, s"doc $id") else assert(ell > 0.0, s"doc $id")
      // symbol noise comes only from the %7 line and the %5 ellipsis
      if (id % 7 != 0 && id % 5 != 0)
        assert(r.getAs[Double]("symbol_ratio") == 0.0, s"doc $id")
      assert(r.getAs[Double]("alpha_word_frac") <= 1.0)
    }
    val passes = out.count(_.getAs[Boolean]("gopher_pass"))
    assert(passes > 0 && passes < out.length, "verdict must vary")
  }

  test("q_gopher_repetition: echo drives dup-5-gram coverage; thresholds bind") {
    val out = TextQueries.queries("q_gopher_repetition")(spark, TestSpark.Sf0001)
      .collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      // the 40-char prefix echo guarantees a duplicated ~8-token span
      assert(r.getAs[Double]("dup5gram_char_frac") > 0.0)
      // coverage fractions are monotonically non-increasing in n
      val d = (5 to 10).map(n => r.getAs[Double](s"dup${n}gram_char_frac"))
      assert(d.sliding(2).forall { case Seq(a, b) => a >= b })
      // top-gram char mass can exceed its count-1 floor but stays sane
      assert(r.getAs[Double]("top2gram_char_frac") > 0.0)
    }
    val passes = out.count(_.getAs[Boolean]("rep_pass"))
    assert(passes > 0 && passes < out.length, "verdict must vary")
  }

  test("c4Signals: every line rule and page ban fires where it should") {
    import graft.operators.TextAnalysis
    val page = Seq(
      "a good first sentence.",     // kept
      "is this kept too?",          // kept (?, 4 words)
      "quoted line ends well\"",    // kept (")
      "exclaim with three words!",  // kept (!)
      "fifth and final sentence.",  // kept -> 5 sentences
      "no terminal punctuation",    // dropped: punct rule
      "two words.",                 // dropped: <3 words
      "enable JavaScript to view.", // dropped: javascript (case-blind)
      "   ",                        // blank: not a line at all
      "").mkString("\n")
    val rows = Seq(
      (1L, page),
      (2L, page + "\nlorem ipsum dolor sit."),  // page ban: lorem
      (3L, page + "\nconfig { x } block."),     // page ban: brace
      (4L, "short page only.")                  // < 5 sentences
    ).toDF("doc_id", "text")
    val c = TextAnalysis.c4Signals($"text")
    val out = rows.select($"doc_id", c.nLines.as("nl"), c.nKept.as("nk"),
        c.keptFrac.as("kf"), c.hasLorem.as("lo"), c.hasBrace.as("br"),
        c.pass.as("p"), c.keptText.as("kt"))
      .orderBy($"doc_id").collect()
    // page 1: 8 non-blank lines, exactly the 5 sentences kept
    assert(out(0).getAs[Int]("nl") == 8 && out(0).getAs[Int]("nk") == 5)
    assert(out(0).getAs[Double]("kf") == 5.0 / 8.0)
    assert(out(0).getAs[Boolean]("p"))
    // the filtered page is exactly the kept lines in order
    assert(out(0).getAs[String]("kt") == page.split("\n").take(5).mkString("\n"))
    // page bans veto despite enough sentences (the lorem line itself
    // is a kept-shaped sentence — 6 kept, still fails)
    assert(out(1).getAs[Int]("nk") == 6 && out(1).getAs[Boolean]("lo") &&
      !out(1).getAs[Boolean]("p"))
    assert(out(2).getAs[Boolean]("br") && !out(2).getAs[Boolean]("p"))
    // a clean but short page fails the >= 5 sentence rule
    assert(out(3).getAs[Int]("nk") == 1 && !out(3).getAs[Boolean]("p"))
  }
}
