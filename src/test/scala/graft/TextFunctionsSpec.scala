package graft

import graft.functions.TextFunctions._
import org.apache.spark.sql.functions._
import scala.util.Random

class TextFunctionsSpec extends SparkSpec {

  import spark.implicits._

  private def tok1(text: String): Seq[String] = {
    val df = Seq(text).toDF("text")
    df.select(whitespaceTokens(col("text"))).first().getSeq[String](0)
  }

  test("cleanLower replaces <br /><br /> and lowercases (P1)") {
    val df = Seq("Good MOVIE<br /><br />Loved IT").toDF("review")
    val out = df.select(cleanLower(col("review"))).first().getString(0)
    assert(out == "good movie loved it")
  }

  test("cleanLower with empty replacement matches P2 variant") {
    val df = Seq("a<br /><br />b").toDF("review")
    assert(df.select(cleanLower(col("review"), "")).first().getString(0) == "ab")
  }

  test("htmlStrip removes arbitrary tags (P3)") {
    val df = Seq("<p>Hello <b>world</b></p>").toDF("t")
    val out = df.select(htmlStrip(col("t"))).first().getString(0)
    assert(out.replaceAll("\\s+", " ").trim == "Hello world")
  }

  test("wordPunctTokens splits words and punctuation runs (T2 regex)") {
    val df = Seq("Good, isn't it?! yes...").toDF("t")
    val out = df.select(wordPunctTokens(col("t"))).first().getSeq[String](0)
    assert(out == Seq("Good", ",", "isn", "'", "t", "it", "?!", "yes", "..."))
  }

  test("removeStopwords preserves non-stopword duplicates") {
    val df = Seq(Tuple1(Seq("The", "movie", "the", "movie", "is", "great")))
      .toDF("toks")
    val out = df.select(removeStopwords(col("toks"))).first().getSeq[String](0)
    assert(out == Seq("movie", "movie", "great")) // dups kept, case-insensitive match
  }

  test("ngram length law: |ngrams(n)| == max(0, len - n + 1)") {
    val rnd = new Random(42)
    val cases = for {
      n <- 1 to 4
      len <- 0 to 12
    } yield (n, Seq.fill(len)(rnd.alphanumeric.take(3).mkString))
    // one Spark job for all cases: (n, toks) rows → ngram arrays
    val df = cases.toDF("n", "toks")
    val out = (1 to 4).flatMap { n =>
      df.filter(col("n") === n)
        .select(col("toks"), ngrams(col("toks"), n).as("grams"))
        .collect()
        .map(r => (n, r.getSeq[String](0), r.getSeq[String](1)))
    }
    out.foreach { case (n, toks, grams) =>
      assert(grams.length == math.max(0, toks.length - n + 1), s"n=$n toks=$toks")
      assert(grams.forall(_.count(_ == ' ') == n - 1), s"n=$n grams=$grams")
    }
  }

  test("bigrams are consecutive space-joined pairs (T4)") {
    val df = Seq(Tuple1(Seq("to", "be", "or", "not"))).toDF("toks")
    val out = df.select(ngrams(col("toks"), 2)).first().getSeq[String](0)
    assert(out == Seq("to be", "be or", "or not"))
  }

  test("minhash signature is invariant under token duplication & order") {
    val a = Seq(Tuple1(Seq("x", "y", "z"))).toDF("toks")
    val b = Seq(Tuple1(Seq("z", "x", "y", "x", "z"))).toDF("toks")
    def sig(df: org.apache.spark.sql.DataFrame) =
      df.select(minhashSignature(array_distinct(col("toks")), 8)).first().getSeq[Long](0)
    assert(sig(a) == sig(b))
    assert(sig(a).length == 8)
  }

  test("identical token sets share simhash; disjoint sets differ") {
    val df = Seq(
      (1, Seq("spark", "fast", "engine")),
      (2, Seq("engine", "spark", "fast")),
      (3, Seq("totally", "different", "words", "here"))
    ).toDF("id", "toks")
    val out = df.select(col("id"), simhash32(col("toks")).as("sh"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(out(1) == out(2))
    assert(out(1) != out(3))
  }

  test("langId picks the lexicon with most hits, und when none") {
    val df = Seq(
      (1, "the cat sat on the mat"),
      (2, "el perro de la casa es grande y que bonito"),
      (3, "zzz qqq www")
    ).toDF("id", "text")
    val out = df.select(col("id"), langId(whitespaceTokens(col("text"))).as("l"))
      .collect().map(r => r.getInt(0) -> r.getString(1)).toMap
    assert(out == Map(1 -> "en", 2 -> "es", 3 -> "und"))
  }

  test("quality metrics: exact on a known sentence") {
    val df = Seq("the quick quick fox").toDF("text")
    val r = df.select(
      typeTokenRatio(whitespaceTokens(col("text"))).as("ttr"),
      meanTokenLen(whitespaceTokens(col("text"))).as("mtl"),
      stopwordRatio(whitespaceTokens(col("text"))).as("swr")).first()
    assert(r.getDouble(0) == 3.0 / 4.0)
    assert(r.getDouble(1) == (3 + 5 + 5 + 3) / 4.0)
    assert(r.getDouble(2) == 1.0 / 4.0)
  }

  test("dup n-gram ratio: exact counts, short docs score zero") {
    val df = Seq(
      (1, "a b a b a"),   // bigrams: ab ba ab ba → 4 total, 2 distinct
      (2, "a b c d"),     // all distinct
      (3, "solo")         // too short for bigrams
    ).toDF("id", "text")
    val out = df.select(col("id"),
      dupNgramRatio(whitespaceTokens(col("text")), 2).as("r"))
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    assert(out(1) == 2.0 / 4.0)
    assert(out(2) == 0.0)
    assert(out(3) == 0.0)
  }

  test("char-class ratios: exact on known strings") {
    val df = Seq("ab1 c!?").toDF("text") // 7 chars: 3 alpha, 1 digit, 2 symbols, 1 space
    val r = df.select(
      alphaRatio(col("text")).as("a"),
      symbolRatio(col("text")).as("s")).first()
    assert(r.getDouble(0) == 3.0 / 7.0)
    assert(r.getDouble(1) == 2.0 / 7.0)
  }

  test("PII redaction: URLs first, then emails; counts match") {
    val df = Seq(
      "visit https://example.com/a?user=bob@mail.com now or mail root@host.org"
    ).toDF("text")
    val r = df.select(
      urlCount(col("text")).as("u"),
      emailCount(col("text")).as("e"),
      redactPii(col("text")).as("red")).first()
    assert(r.getInt(0) == 1)
    assert(r.getInt(1) == 2) // the in-URL email also matches the scan count
    // redaction order: the URL (including its embedded email) is gone
    // before the email pass, so exactly one <EMAIL> remains
    assert(r.getString(2) == "visit <URL> now or mail <EMAIL>")
  }

  test("distinctNgramCount == size(array_distinct(ngrams)) — corpus and edges") {
    // real corpus parity (every doc at sf0.001), both k values q37 uses
    val corpus = spark.read.parquet(s"$sf/documents.parquet")
      .select(split(col("text"), " ").as("t"))
    for (k <- Seq(2, 3)) {
      val mismatch = corpus.filter(
        distinctNgramCount(col("t"), k) =!=
          size(array_distinct(ngrams(col("t"), k))).cast("long")).count()
      assert(mismatch == 0, s"k=$k")
    }
    // edges: heavy within-doc repetition, doc shorter than k, single
    // window, and the ("ab","c") vs ("a","bc") separator trap
    val edges = Seq(
      Seq("r", "r", "r", "r", "r"),
      Seq("a"),
      Seq("a", "b"),
      Seq("ab", "c", "x", "a", "bc"),
      Seq[String]()).toDF("t")
    for (k <- Seq(2, 3)) {
      val rows = edges.select(
        distinctNgramCount(col("t"), k).as("fast"),
        size(array_distinct(ngrams(col("t"), k))).cast("long").as("slow"))
        .collect()
      rows.foreach(r => assert(r.getLong(0) == r.getLong(1), s"k=$k $r"))
    }
  }

  test("doc_postings == posexplode+groupBy rollup — corpus and edges") {
    // q88's per-doc kernel against the shuffle-based rollup it
    // replaced: same (doc, token, tf, positions) multiset, positions
    // ascending comma-rendered integers
    val corpus = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), split(col("text"), " ").as("l"))
    val edges = Seq(
      (1L, Seq("r", "r", "r")),
      (2L, Seq("a")),
      (3L, Seq.empty[String]),
      (4L, Seq("b", "a", "b", "a", "b")),
      (5L, Seq("x", "", "x", ""))).toDF("doc_id", "l")
    for (df <- Seq(corpus, edges)) {
      val fast = df.select(col("doc_id"),
          explode(graft.plans.PostingsExpr.column(col("l"))).as("p"))
        .select(col("doc_id"), col("p.token").as("token"),
          col("p.tf").as("tf"), col("p.positions").as("positions"))
      val slow = df
        .select(col("doc_id"), posexplode(col("l")).as(Seq("pos", "token")))
        .groupBy("doc_id", "token")
        .agg(count(lit(1)).as("tf"),
          array_join(transform(sort_array(collect_list(col("pos"))),
            _.cast("string")), ",").as("positions"))
        .select("doc_id", "token", "tf", "positions")
      assert(fast.exceptAll(slow).count() == 0 &&
        slow.exceptAll(fast).count() == 0)
    }
  }

  test("frequent_pair_codes kernel == broadcast self-join plan — corpus and edges") {
    // q107's literal-set tier against the join tier it replaces: same
    // (tok_a, tok_b) pair multiset over every doc at sf0.001, binary
    // pair order, duplicates within a doc collapsed. Codes decode with
    // the SAME sorted set the kernel was built from (the a*K+b
    // contract).
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), split(col("text"), " ").as("l"))
    val freqSet = docs.select(explode(array_distinct(col("l"))).as("t"))
      .groupBy("t").count().filter(col("count") >= 5)
      .collect().map(_.getString(0))
      .sorted(graft.plans.FrequentPairsExpr.Utf8BinaryOrdering).toSeq
    assert(freqSet.nonEmpty)
    val k = freqSet.length
    val fast = docs.select(col("doc_id"),
        explode(graft.plans.FrequentPairCodesExpr.column(col("l"), freqSet))
          .as("code"))
      .select(col("doc_id"),
        element_at(typedLit(freqSet), expr(s"CAST(code DIV $k AS INT) + 1")).as("a"),
        element_at(typedLit(freqSet), expr(s"CAST(code % $k AS INT) + 1")).as("b"))
    val tok = docs.select(col("doc_id"),
      explode(array_distinct(col("l"))).as("t"))
      .filter(col("t").isin(freqSet: _*))
    val slow = tok.select(col("doc_id"), col("t").as("a"))
      .join(tok.select(col("doc_id"), col("t").as("b")), Seq("doc_id"))
      .filter(col("a") < col("b"))
    assert(fast.exceptAll(slow).count() == 0 &&
      slow.exceptAll(fast).count() == 0)
    // edges: repeats collapse, < 2 matches emit nothing, null-safe;
    // codes enumerate in (a, b) ascending order by construction
    val edge = Seq(Seq("x", "y", "x", "z", "q"), Seq("x"), Seq[String]())
      .toDF("l")
    val got = edge.select(
      graft.plans.FrequentPairCodesExpr.column(col("l"), Seq("x", "y", "z"))
        .as("p")).collect().map(_.getSeq[Int](0))
    // set {x,y,z} sorted: x=0 y=1 z=2, K=3 → (x,y)=1 (x,z)=2 (y,z)=5
    assert(got(0) == Seq(1, 2, 5))
    assert(got(1).isEmpty && got(2).isEmpty)
  }

  test("frequent_pair_codes rejects oversized and unsorted literal sets at construction") {
    // the kernel tier's worst-case row is k*(k-1)/2 codes and a*K+b
    // must stay inside an int; both caps are loud requires, not the
    // caller's discipline alone
    val big = (0 to graft.plans.FrequentPairCodesExpr.MaxCodeTokens)
      .map(i => s"t$i")
    val e = intercept[IllegalArgumentException] {
      graft.plans.FrequentPairCodesExpr.column(lit(Array("a")), big)
    }
    assert(e.getMessage.contains("MaxCodeTokens"))
    // decode is index arithmetic over the SORTED set — an unsorted (or
    // duplicated) set silently mis-decodes, so construction refuses it
    val e2 = intercept[IllegalArgumentException] {
      graft.plans.FrequentPairCodesExpr.column(lit(Array("a")),
        Seq("b", "a"))
    }
    assert(e2.getMessage.contains("sorted") || e2.getMessage.contains("ascending"))
    val e3 = intercept[IllegalArgumentException] {
      graft.plans.FrequentPairCodesExpr.column(lit(Array("a")),
        Seq("a", "a"))
    }
    assert(e3.getMessage.contains("ascending"))
  }

  test("postings and frequent_pairs raise descriptively on null array elements") {
    // the contract is "null elements unsupported" — previously postings
    // NPE'd raw inside codegen while frequent_pairs silently skipped;
    // both now fail loud with the same diagnosable message
    def chainHas(t: Throwable, needle: String): Boolean =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .exists(x => Option(x.getMessage).exists(_.contains(needle)))
    val nullToks = Seq(Tuple1(Seq("a", null, "b"))).toDF("l")
    val e1 = intercept[Exception] {
      nullToks.select(graft.plans.PostingsExpr.column(col("l"))).collect()
    }
    assert(chainHas(e1, "null array element"),
      s"postings null-element error not descriptive: $e1")
    val e2 = intercept[Exception] {
      nullToks.select(graft.plans.FrequentPairCodesExpr.column(col("l"),
        Seq("a", "b"))).collect()
    }
    assert(chainHas(e2, "null array element"),
      s"frequent_pair_codes null-element error not descriptive: $e2")
  }

  test("postings and frequent-pairs kernels: randomized driver-side recompute (unicode, repeats, empties)") {
    // independent of the SQL-parity oracles: 300 seeded random docs
    // over a unicode-heavy alphabet, kernel outputs recomputed in
    // plain Scala on the driver and compared doc by doc
    val alphabet = Vector("a", "b", "héllo", "wörld", "漢字", "x1", "",
      "zzz", "emoji😀", "Ab")
    val rnd = new scala.util.Random(97)
    val docs = (0 until 300).map { i =>
      (i.toLong, Vector.fill(rnd.nextInt(30))(alphabet(rnd.nextInt(alphabet.size))))
    }
    val df = docs.toDF("doc_id", "l")
    val freqSet = Seq("a", "héllo", "漢字", "", "zzz")
      .sorted(graft.plans.FrequentPairsExpr.Utf8BinaryOrdering)
    val gotPost = df.select(col("doc_id"),
        explode(graft.plans.PostingsExpr.column(col("l"))).as("p"))
      .select(col("doc_id"), col("p.token"), col("p.tf"), col("p.positions"))
      .collect()
      .groupBy(_.getLong(0))
      .view.mapValues(_.map(r =>
        (r.getString(1), r.getLong(2), r.getString(3))).toSet).toMap
    val kSet = freqSet.length
    val gotPairs = df.select(col("doc_id"),
        explode(graft.plans.FrequentPairCodesExpr.column(col("l"), freqSet))
          .as("code"))
      .collect()
      .groupBy(_.getLong(0))
      .view.mapValues(_.map { r =>
        val code = r.getInt(1)
        (freqSet(code / kSet), freqSet(code % kSet))
      }.toSet).toMap
    docs.foreach { case (id, toks) =>
      val expPost = toks.zipWithIndex.groupBy(_._1).map { case (t, occ) =>
        (t, occ.size.toLong, occ.map(_._2).mkString(","))
      }.toSet
      assert(gotPost.getOrElse(id, Set.empty) == expPost, s"doc $id postings")
      // UTF8 binary order == codepoint order only for these BMP
      // strings compared via compareTo on UTF-8 bytes; recompute with
      // the same byte-wise comparison the kernel uses
      val ord = Ordering.comparatorToOrdering(
        java.util.Comparator.comparing[String, Array[Byte]](
          (s: String) => s.getBytes("UTF-8"),
          java.util.Arrays.compareUnsigned(_, _)))
      val matched = toks.distinct.filter(freqSet.contains).sorted(ord)
      val expPairs = (for {
        i <- matched.indices; j <- (i + 1) until matched.size
      } yield (matched(i), matched(j))).toSet
      assert(gotPairs.getOrElse(id, Set.empty) == expPairs, s"doc $id pairs")
    }
  }

  test("postings and frequent-pairs kernels: interpreted path agrees with codegen") {
    val df = Seq(
      (1L, Seq("b", "a", "b", "a", "b")),
      (2L, Seq("x", "y", "x")),
      (3L, Seq("a")),
      (4L, Seq.empty[String])).toDF("doc_id", "l")
    def run(): (Seq[org.apache.spark.sql.Row], Seq[org.apache.spark.sql.Row]) = (
      df.select(col("doc_id"),
          explode(graft.plans.PostingsExpr.column(col("l"))).as("p"))
        .select(col("doc_id"), col("p.token"), col("p.tf"),
          col("p.positions")).collect().toSeq,
      df.select(col("doc_id"),
          explode(graft.plans.FrequentPairCodesExpr.column(col("l"),
            Seq("a", "b", "x", "y"))).as("code"))
        .select(col("doc_id"), col("code"))
        .collect().toSeq)
    val codegen = run()
    val keys = Seq("spark.sql.codegen.wholeStage",
      "spark.sql.codegen.factoryMode")
    val saved = keys.map(k => k -> spark.conf.getOption(k))
    spark.conf.set(keys(0), "false")
    spark.conf.set(keys(1), "NO_CODEGEN")
    try assert(run() == codegen)
    finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("native char-class counts == regexp_replace composed form") {
    val composed = (t: org.apache.spark.sql.Column, clazz: String) =>
      (length(t) - length(regexp_replace(t, clazz, ""))).cast("long")
    // real corpus (every doc at sf0.001) + edges incl. unicode,
    // vertical tab (a SYMBOL under SymbolClass — Ws has no \x0B),
    // empty, whitespace-only
    val corpus = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("text"))
    val edges = Seq("", " \t\n\f\r", "", "héllo wörld",
      "emoji 😀 end", "a1! B2? ~`^", "ascii only text")
      .toDF("text")
    for (df <- Seq(corpus, edges)) {
      val bad = df.filter(
        charClassCount(col("text"), "[A-Za-z]") =!=
          composed(col("text"), "[A-Za-z]") ||
        charClassCount(col("text"), SymbolClass) =!=
          composed(col("text"), SymbolClass)).count()
      assert(bad == 0)
    }
  }

  test("text queries stay fully codegen'd (no UDFs in the plan)") {
    val plan = graft.queries.TextQueries.q24Quality(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BatchEvalPython") && !plan.contains("ScalaUDF"), plan)
  }

  /** r19: the StopwordCountExpr kernel must count exactly what the
    * composed interpreted forms counted —
    * size(filter(toks, t => [!]isStopword(t))) — including the edges:
    * case-insensitivity, duplicates kept, NULL elements excluded from
    * BOTH counts (the lambda's null predicate drops them), null array
    * propagating null, empty array → 0. Randomized corpus + fixed
    * edges, both counts compared against the live composed form. */
  test("stopword count kernel == composed filter/size forms, nulls and case") {
    val rnd = new Random(19)
    val words = Vector("the", "The", "THE", "movie", "is", "a", "An",
      "great", "i", "Me", "waterfall", "", "O'nEill", "don't", "itself")
    def arr(): Seq[String] =
      Seq.fill(rnd.nextInt(12))(words(rnd.nextInt(words.size)))
    val rows: Seq[Seq[String]] =
      Seq(Seq.empty[String], Seq("the"), Seq("xyz")) ++ Seq.fill(300)(arr())
    val withNulls: Seq[Seq[String]] =
      rows.map(r => if (rnd.nextBoolean()) r else
        (r ++ Seq(null.asInstanceOf[String])).sortBy(_ == null))
    val df = withNulls.zipWithIndex.map(_.swap).toDF("id", "toks")
    val got = df.select(
        col("id"),
        nonStopwordCount(col("toks")).as("nc"),
        graft.plans.StopwordCountExpr
          .column(col("toks"), NltkStopwords, matchStopwords = true).as("sc"))
      .as[(Int, Int, Int)].collect().map { case (k, a, b) => k -> (a, b) }.toMap
    val want = df.select(
        col("id"),
        size(filter(col("toks"), t => !isStopword(t))).as("nc"),
        size(filter(col("toks"), t => isStopword(t))).as("sc"))
      .as[(Int, Int, Int)].collect().map { case (k, a, b) => k -> (a, b) }.toMap
    assert(got == want && got.nonEmpty)
    // null array propagates null in both forms
    val nullRow = Seq(Tuple1(null.asInstanceOf[Seq[String]])).toDF("toks")
    assert(nullRow.select(nonStopwordCount(col("toks"))).first().isNullAt(0))
    // the kernel must actually be in the codegen'd plan, not a UDF
    val plan = df.select(nonStopwordCount(col("toks")))
      .queryExecution.executedPlan.toString
    assert(plan.contains("non_stopword_count"), plan)
  }
}
