package graft

import graft.operators.FuzzyJoin
import org.apache.spark.sql.functions._

/** Wildcard-variant fuzzy join: the blocking scheme must be EXACT (no
  * missed pairs vs brute force), must never degenerate into a cross
  * product, and must not overgenerate candidates on low-entropy
  * (ID-prefixed) keys — the three properties the DuckDB hash check
  * alone cannot localize. */
class FuzzyJoinSpec extends SparkSpec {

  import spark.implicits._

  test("wildcard blocking == brute-force hamming join, maxDist 1 and 2") {
    val c = Tables(spark, sf).customer
      .filter(col("c_custkey") < 300).select("c_custkey", "c_name")
    for (k <- Seq(1, 2)) {
      val blocked = FuzzyJoin.hammingSelfJoin(c, "c_custkey", "c_name", k)
        .as[(Long, Long, Long)].collect().toSet
      val a = c.select(col("c_custkey").as("id_a"), col("c_name").as("ka"))
      val b = c.select(col("c_custkey").as("id_b"), col("c_name").as("kb"))
      val brute = a.crossJoin(b)
        .filter(col("id_a") < col("id_b") &&
          length(col("ka")) === length(col("kb")))
        .withColumn("dist",
          FuzzyJoin.hammingDist(col("ka"), col("kb")).cast("long"))
        .filter(col("dist") <= k)
        .select("id_a", "id_b", "dist")
        .as[(Long, Long, Long)].collect().toSet
      assert(blocked == brute, s"maxDist=$k")
      assert(blocked.nonEmpty)
    }
  }

  test("maxDist=3: three-level wildcard nesting still exact vs brute force") {
    // exercises the recursive variant generator past the catalog's
    // k=1/2 uses: filter-based inner position ranges, triple flatten,
    // and the short-key (len < k) length-block path
    val df = Seq(
      (1L, "abcdef"), (2L, "abcxyz"), // dist 3
      (3L, "abcdxy"),                 // dist 2 vs 1, 3 vs 2... brute decides
      (4L, "ab"), (5L, "xy"),         // len < k: same-length always pairs
      (6L, "abcdef")                  // dup of 1
    ).toDF("id", "k")
    val got = FuzzyJoin.hammingSelfJoin(df, "id", "k", 3)
      .as[(Long, Long, Long)].collect().toSet
    val a = df.select(col("id").as("id_a"), col("k").as("ka"))
    val b = df.select(col("id").as("id_b"), col("k").as("kb"))
    val brute = a.crossJoin(b)
      .filter(col("id_a") < col("id_b") &&
        length(col("ka")) === length(col("kb")))
      .withColumn("dist",
        FuzzyJoin.hammingDist(col("ka"), col("kb")).cast("long"))
      .filter(col("dist") <= 3)
      .select("id_a", "id_b", "dist")
      .as[(Long, Long, Long)].collect().toSet
    assert(got == brute)
    assert(got.contains((4L, 5L, 2L))) // short-key path exercised
    assert(got.contains((1L, 6L, 0L)))
  }

  test("mixed-length keys never pair; dist is exact") {
    val df = Seq((1L, "abcd"), (2L, "abce"), (3L, "abcde"), (4L, "zbcd"))
      .toDF("id", "k")
    val got = FuzzyJoin.hammingSelfJoin(df, "id", "k", 1)
      .as[(Long, Long, Long)].collect().toSet
    // 1-2 differ at pos 4; 1-4 differ at pos 1; 3 (length 5) pairs with
    // nothing; 2-4 differ at two positions (out at maxDist 1)
    assert(got == Set((1L, 2L, 1L), (1L, 4L, 1L)))
  }

  test("candidate generation is an equi-join, not a cross product") {
    val plan = FuzzyJoin.hammingSelfJoin(
      Tables(spark, sf).customer, "c_custkey", "c_name", 1)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
    assert(!plan.contains("BroadcastNestedLoopJoin"))
  }

  test("no overgeneration on ID-prefixed keys: candidates == output") {
    // The round-7 scale-killer: every customer name shares the
    // `Customer#` prefix and a fixed length, so any blocking scheme
    // keyed on shared substrings (segments, prefixes) degenerates to
    // all-pairs. The wildcard neighborhood must NOT: a masked-variant
    // collision requires agreement at every unmasked position, so the
    // candidate count must EQUAL the true result count — not n².
    // (At this sf the output itself can be dense — 150 numeric-suffix
    // names put most pairs within distance 2 — so the pinned property
    // is candidates == output exactly: the output is the LOWER bound of
    // any exact scheme, and hitting it means zero wasted verification.)
    val c = Tables(spark, sf).customer.select("c_custkey", "c_name")
    for (k <- Seq(1, 2)) {
      val cands = FuzzyJoin.hammingCandidates(c, "c_custkey", "c_name", k).count()
      val out = FuzzyJoin.hammingSelfJoin(c, "c_custkey", "c_name", k).count()
      assert(cands == out,
        s"maxDist=$k: $cands candidates vs $out results — blocking overgenerates")
      assert(out > 0)
    }
  }


  test("deletion neighborhood == brute-force levenshtein join") {
    // substitutions, insertions, deletions, exact dups, and non-matches
    val df = Seq(
      (1L, "spark"), (2L, "spork"),   // substitution
      (3L, "sparks"),                 // insertion vs 1
      (4L, "park"),                   // deletion vs 1 (prefix cut)
      (5L, "spark"),                  // exact duplicate of 1
      (6L, "flink"), (7L, "blink"),   // substitution pair, far from spark
      (8L, "totally-unrelated"),
      (9L, "s"), (10L, "")            // boundary lengths
    ).toDF("id", "k")
    val got = FuzzyJoin.editSelfJoin(df, "id", "k")
      .as[(Long, Long, Long)].collect().toSet
    val a = df.select(col("id").as("id_a"), col("k").as("ka"))
    val b = df.select(col("id").as("id_b"), col("k").as("kb"))
    val brute = a.crossJoin(b)
      .filter(col("id_a") < col("id_b") &&
        levenshtein(col("ka"), col("kb")) <= 1)
      .select(col("id_a"), col("id_b"),
        levenshtein(col("ka"), col("kb")).cast("long").as("dist"))
      .as[(Long, Long, Long)].collect().toSet
    assert(got == brute)
    // the cases the neighborhood must cover, spelled out
    assert(got.contains((1L, 2L, 1L))) // substitution
    assert(got.contains((1L, 3L, 1L))) // insertion
    assert(got.contains((1L, 4L, 1L))) // deletion
    assert(got.contains((1L, 5L, 0L))) // identity
    assert(got.contains((9L, 10L, 1L))) // single char vs empty
    assert(!got.exists(p => p._1 == 8L || p._2 == 8L))
  }

  test("editSelfJoin on customer names == brute force; no cross product") {
    val c = Tables(spark, sf).customer
      .filter(col("c_custkey") < 300).select("c_custkey", "c_name")
    val got = FuzzyJoin.editSelfJoin(c, "c_custkey", "c_name")
      .as[(Long, Long, Long)].collect().toSet
    val a = c.select(col("c_custkey").as("id_a"), col("c_name").as("ka"))
    val b = c.select(col("c_custkey").as("id_b"), col("c_name").as("kb"))
    val brute = a.crossJoin(b)
      .filter(col("id_a") < col("id_b") &&
        levenshtein(col("ka"), col("kb")) <= 1)
      .select(col("id_a"), col("id_b"),
        levenshtein(col("ka"), col("kb")).cast("long").as("dist"))
      .as[(Long, Long, Long)].collect().toSet
    assert(got == brute && got.nonEmpty)
    val plan = FuzzyJoin.editSelfJoin(c, "c_custkey", "c_name")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
    assert(!plan.contains("BroadcastNestedLoopJoin"))
  }

  /** The r18 replacement of the composed hamming form must keep its
    * EXACT contract (the assertions compare against the live composed
    * form, so the pinned semantics are whatever Spark's split/zip_with
    * actually do): Spark's `split(str, "")` yields one codepoint per
    * element with NO trailing empty — except "" itself, which yields
    * [""] — and zip_with pads the shorter array with nulls whose
    * comparisons contribute 0. So tail codepoints past the shorter side
    * contribute NOTHING (dist("abc","ab") = 0) and only the
    * empty-vs-nonempty edge contributes the one [""] slot (dist("","a")
    * = 1). Mirrors the HammingDistExpr scaladoc (r19, ADVICE fix: the
    * previous comment here claimed the opposite length-edge behavior).
    * Pinned over a randomized multi-byte corpus (ASCII, 2-byte, 3-byte,
    * 4-byte/astral codepoints, empties, shared prefixes). */
  test("hammingDist kernel == composed zip_with/split form, multi-byte + length edges") {
    def composed(a: org.apache.spark.sql.Column,
                 b: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      aggregate(
        zip_with(split(a, ""), split(b, ""),
          (x, y) => when(x =!= y, 1).otherwise(0)),
        lit(0), (acc, v) => acc + v)
    val rnd = new scala.util.Random(18)
    val alphabet: IndexedSeq[String] =
      ("ab9 " .map(_.toString)) ++ Seq("\u00e9", "\u4e16", "\ud83d\ude00") // 1/2/3/4-byte
    def word(): String =
      Seq.fill(rnd.nextInt(8))(alphabet(rnd.nextInt(alphabet.size))).mkString
    val pairs = Seq(("", ""), ("", "a"), ("a", ""), ("abc", "ab"),
      ("ab", "abc"), ("\u4e16a", "\u4e16b"), ("\ud83d\ude00", "a")) ++
      Seq.fill(400)((word(), word()))
    val df = pairs.zipWithIndex
      .map { case ((a, b), i) => (i.toLong, a, b) }.toDF("id", "ka", "kb")
    def run(): Seq[(Long, Int)] =
      df.select(col("id"),
          FuzzyJoin.hammingDist(col("ka"), col("kb")).as("d"))
        .as[(Long, Int)].collect().toSeq.sorted
    val exp = df.select(col("id"), composed(col("ka"), col("kb")).as("d"))
      .as[(Long, Int)].collect().toSeq.sorted
    val codegen = run()
    assert(codegen == exp)
    // interpreted path agrees with codegen (audit convention)
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
    // null propagation matches the composed form (split(null) -> null)
    val nulls = Seq((1L, null, "a"), (2L, "a", null), (3L, null, null))
      .toDF("id", "ka", "kb")
    val gotN = nulls.select(col("id"),
        FuzzyJoin.hammingDist(col("ka"), col("kb"))).collect()
    assert(gotN.forall(_.isNullAt(1)))
  }
}
