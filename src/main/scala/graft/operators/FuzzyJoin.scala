package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Fuzzy (approximate-string) self-join — the entity-resolution
  * primitive: find all record pairs whose keys differ in at most
  * `maxDist` character positions (Hamming distance, defined over
  * equal-length keys; differing-length pairs are by definition not
  * matches here).
  *
  * The scale problem is candidate generation: the naive form is an
  * all-pairs cross join. This operator blocks on the POSITION-WILDCARD
  * neighborhood (the mask/wildcard indexing device of the FastSS family
  * — Bocek, Hunt & Stiller 2007, "Fast Similarity Search in Large
  * Dictionaries", public — specialized to Hamming distance): index each
  * key under every variant obtained by masking `maxDist` of its
  * positions with a sentinel character. Two equal-length keys agree on
  * a same-positions masked variant IFF they agree at every unmasked
  * position, i.e. IFF their Hamming distance is ≤ maxDist — so the
  * variant equi-join's candidate set IS the result set (overgeneration
  * factor ≈ 1; the exact-distance verification only absorbs md5
  * collisions and sentinel-containing keys). Crucially the blocking key
  * carries the FULL unmasked content of the string, so shared prefixes,
  * templated IDs, and other low-entropy regions — the NORM in entity
  * resolution, and the corpus shape that collapses segment/prefix
  * blocking schemes (PassJoin-style) into an all-pairs join — cost
  * nothing: a variant collision still requires near-total agreement.
  *
  * Cost shape: C(len, maxDist) variant rows per input row (len for
  * maxDist=1, len·(len−1)/2 for 2), each a fixed-width md5 digest —
  * shuffle volume is rows × C(len, k) × 16 bytes, independent of key
  * entropy. At 100 TB with maxDist ≤ 2 and short join keys (names,
  * titles, SKUs) this is the equi-join shape that survives; for long
  * keys or k ≥ 3 the neighborhood grows combinatorially and a
  * q-gram/PassJoin hybrid with entropy-aware segment selection would be
  * the next tool — not needed for the catalog's workloads.
  */
object FuzzyJoin {

  /** Hamming distance of two string columns — the verification kernel,
    * evaluated once per join CANDIDATE (the dist filter is pushed into
    * the join condition) plus once per result row. r18: the composed
    * `aggregate(zip_with(split, split))` form allocated two codepoint
    * arrays and three lambdas per evaluation; now a zero-allocation
    * codegen'd byte walk with the identical contract (bit-equivalence
    * incl. the unequal-length and empty-string edges pinned in
    * FuzzyJoinSpec over randomized multi-byte corpora). */
  def hammingDist(a: Column, b: Column): Column =
    graft.plans.HammingDistExpr.column(a, b)

  /** Candidate pairs (a_id < b_id, keys carried) from the masked-variant
    * equi-join — exposed for the overgeneration spec: on sentinel-free
    * keys this count EQUALS the final output count (variant agreement ⟺
    * Hamming ≤ maxDist), which is the property that makes the operator
    * safe on ID-prefixed/templated key corpora. */
  private[graft] def hammingCandidates(df: DataFrame, idCol: String,
                                       keyCol: String, maxDist: Int): DataFrame = {
    val k = maxDist
    // All md5'd variants of `key` with exactly k positions replaced by
    // the chr(1) sentinel, as one generated-SQL array expression:
    // nested transforms pick ascending position combinations p1<…<pk
    // (levels ≥ 2 filter the position range rather than sequence(lo,hi),
    // because Spark's sequence runs DESCENDING when lo > hi). Keys
    // shorter than k — where every same-length pair is trivially within
    // distance k — block on length alone via a chr(2)-tagged variant.
    def variants(side: String): DataFrame = {
      val key = s"${side}_key"
      val masked = (1 to k).foldLeft(key)((acc, i) =>
        s"overlay($acc, chr(1), p$i, 1)")
      def gen(level: Int): String =
        if (level > k) s"md5($masked)"
        else if (level == 1)
          s"transform(sequence(1, length($key)), p1 -> ${gen(2)})"
        else
          s"transform(filter(sequence(1, length($key)), q -> q > p${level - 1}), " +
            s"p$level -> ${gen(level + 1)})"
      val flat = (1 until k).foldLeft(gen(1))((acc, _) => s"flatten($acc)")
      val vks = s"if(length($key) < $k, " +
        s"array(md5(concat(chr(2), length($key)))), $flat)"
      df.select(col(idCol).as(s"${side}_id"), col(keyCol).as(s"${side}_key"))
        .select(col(s"${side}_id"), col(key), length(col(key)).as(s"${side}_len"),
          explode(expr(vks)).as("vk"))
    }
    variants("a").join(variants("b"), "vk")
      .filter(col("a_id") < col("b_id") && col("a_len") === col("b_len"))
      .select(col("a_id"), col("b_id"), col("a_key"), col("b_key"))
      .distinct() // identical keys share ALL C(len,k) variants; dedup pairs
  }

  /** All pairs (id_a < id_b) with Hamming(key_a, key_b) ≤ maxDist.
    * Output: `id_a, id_b, dist` (dist as long). Exact — the wildcard
    * neighborhood misses no pair (a pair within distance k agrees on
    * the variant masking its differing positions, padded to k); the
    * verification filter removes the only possible false positives
    * (md5 collisions, sentinel characters occurring in keys). */
  def hammingSelfJoin(df: DataFrame, idCol: String, keyCol: String,
                      maxDist: Int): DataFrame = {
    require(maxDist >= 1, "maxDist must be >= 1 (use equality for 0)")
    // r19 single evaluation: a plain `withColumn(dist).filter(dist<=k)`
    // gets the filter pushed into the variant join's condition with the
    // kernel expression substituted, so hamming_dist ran once per
    // CANDIDATE row in the join plus once per result row (r18 plan
    // lines 87/109). But the variant equi-join already IS the distance
    // test — same-position masked agreement ⟺ dist ≤ k — so that
    // condition eval rejects only md5 collisions and sentinel-bearing
    // keys (≈ none); it is a correctness backstop, not a prune.
    // Evaluate the kernel ONCE per distinct pair instead, under an
    // explode(array(·)) generate: a filter on a generator output cannot
    // be substituted through the Generate, so the backstop reads the
    // computed column and the output projection reuses it. Plan after:
    // ONE hamming_dist, inside Generate; none in the join condition.
    hammingCandidates(df, idCol, keyCol, maxDist)
      .select(col("a_id"), col("b_id"),
        explode(array(hammingDist(col("a_key"), col("b_key")).cast("long")))
          .as("dist"))
      .filter(col("dist") <= maxDist)
      .select(col("a_id").as("id_a"), col("b_id").as("id_b"), col("dist"))
  }

  /** All pairs (id_a < id_b) with Levenshtein(key_a, key_b) ≤ 1, found
    * without a cross join via the deletion neighborhood (FastSS —
    * Bocek, Hunt & Stiller 2007, "Fast Similarity Search in Large
    * Dictionaries", public): index every key under itself plus each of
    * its single-character-deletion variants. If ed(A,B) ≤ 1 the edit
    * script is one substitution (both sides share the variant deleting
    * that position), one insertion/deletion (the longer side's deletion
    * IS the shorter side, whose identity variant collides), or empty
    * (identity variants collide) — so pairs sharing ≥ 1 variant key are
    * a candidate superset and only they pay the exact Levenshtein
    * verification (which also absorbs any md5 collision). Variant keys
    * are md5'd so the shuffle carries fixed-width digests, not O(len)
    * substrings. At 100 TB the index frame is (len+1)× the input rows —
    * the equi-join shape that survives, vs the all-pairs form that
    * doesn't. Unlike `hammingSelfJoin`, differing-length pairs DO match
    * here (insertion/deletion is a unit edit). */
  def editSelfJoin(df: DataFrame, idCol: String, keyCol: String): DataFrame = {
    def variants(side: String): DataFrame =
      df.select(col(idCol).as(s"${side}_id"), col(keyCol).as(s"${side}_key"))
        .select(col(s"${side}_id"), col(s"${side}_key"),
          explode(expr(
            s"""transform(sequence(0, length(${side}_key)),
               |  p -> md5(if(p = 0, ${side}_key,
               |    concat(substring(${side}_key, 1, p - 1),
               |           substring(${side}_key, p + 1)))))""".stripMargin))
            .as("vk"))
    variants("a").join(variants("b"), "vk")
      .filter(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"), col("a_key"), col("b_key"))
      .distinct() // a pair sharing several variant keys appears once
      // same single-evaluation barrier as hammingSelfJoin: without it
      // the dist filter is pushed into the variant join's condition and
      // levenshtein runs per COLLISION ROW plus per result row; the
      // deletion neighborhood overgenerates little, so one evaluation
      // per distinct pair is the cheaper placement (duelled both ways)
      .select(col("a_id"), col("b_id"),
        explode(array(levenshtein(col("a_key"), col("b_key")).cast("long")))
          .as("dist"))
      .filter(col("dist") <= 1)
      .select(col("a_id").as("id_a"), col("b_id").as("id_b"), col("dist"))
  }
}
