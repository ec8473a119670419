package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Set-similarity self-join — all document pairs whose token-set
  * Jaccard similarity reaches a threshold — via prefix filtering
  * (the PPJoin family: Chaudhuri, Ganti & Kaushik 2006 "A primitive
  * operator for similarity joins"; Xiao, Wang, Lin & Yu 2008 "Efficient
  * similarity joins for near duplicate detection" — public literature).
  *
  * The naive form is an all-pairs cross join with a per-pair set
  * intersection. Prefix filtering turns candidate generation into an
  * equi-join: order every record's tokens by ascending global frequency
  * (rarest first, ties by token text — a total order both engines can
  * reproduce), and emit only each record's first
  * `|s| - ceil(t·|s|) + 1` tokens as blocking keys. If two sets with
  * Jaccard ≥ t had disjoint prefixes, the required overlap of
  * ceil(t·max(|A|,|B|)) tokens would have to fit entirely in the two
  * suffixes of length ceil(t·|s|) - 1 — impossible by pigeonhole — so
  * the prefix join misses no qualifying pair, and rare-token ordering
  * makes the blocking keys selective exactly where frequency skew would
  * otherwise explode the candidate count. A length filter
  * (t·|A| ≤ |B| ≤ |A|/t) prunes size-incompatible candidates before
  * verification.
  *
  * Scale shape (100 TB): the frequency table is one groupBy over the
  * exploded tokens (map-side combined); prefix emission multiplies rows
  * by the prefix length only (≤ (1-t)·|s| + 1 per record, NOT |s|);
  * candidates shuffle on single tokens like any equi-join; only
  * candidate pairs pay the exact O(|A|+|B|) verification. The
  * stop-word-like head of the frequency distribution never becomes a
  * blocking key unless a record consists almost entirely of stop words,
  * which is precisely the record for which no better blocking exists.
  *
  * All threshold comparisons are integer arithmetic on a
  * parts-per-million scaling of t (no float ceil, no float compare), so
  * the DuckDB oracle can reproduce the predicate bit-for-bit.
  */
object SetSimJoin {

  /** All pairs (id_a < id_b) with Jaccard(tokens_a, tokens_b) ≥
    * `threshold`. `tokensCol` must be a deduplicated array<string>
    * (apply `array_distinct` upstream). Output: `id_a, id_b, jaccard`
    * where jaccard = |∩| / |∪| — one integer division, exact in IEEE
    * double, hence hash-stable across engines. Exact result set —
    * prefix filtering generates a candidate superset and the
    * verification filter applies the true predicate. */
  def jaccardSelfJoin(df: DataFrame, idCol: String, tokensCol: String,
                      threshold: Double): DataFrame = {
    require(threshold > 0.0 && threshold <= 1.0,
      s"threshold must be in (0, 1], got $threshold")
    val t6 = math.round(threshold * 1000000L) // t in ppm, exact for 6-dp t
    val base = df.select(col(idCol).as("id"), col(tokensCol).as("toks"))

    // global token frequencies: the ordering signal for prefix selection
    val freq = base.select(explode(col("toks")).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("tok_freq"))

    // per record: tokens ordered rarest-first (freq asc, token asc),
    // then the first (n - ceil(t*n) + 1) become blocking keys
    val ordered = base
      .select(col("id"), size(col("toks")).as("n"), explode(col("toks")).as("tok"))
      .join(freq, "tok")
      .groupBy("id", "n")
      .agg(array_sort(collect_list(struct(col("tok_freq"), col("tok"))))
        .as("ordered"))
      .withColumn("prefix_len",
        expr(s"cast(n - ((cast(n as bigint) * $t6 + 999999) DIV 1000000) + 1 as int)"))
      .select(col("id"), col("n"),
        expr("transform(slice(ordered, 1, prefix_len), s -> s.tok)").as("prefix"))
      .cache() // both sides of the candidate join read this frame (q28's pattern)

    val a = ordered.select(col("id").as("id_a"), col("n").as("n_a"),
      explode(col("prefix")).as("tok_a"))
    val b = ordered.select(col("id").as("id_b"), col("n").as("n_b"),
      explode(col("prefix")).as("tok_b"))
    val cand = a.join(b,
        col("tok_a") === col("tok_b") && col("id_a") < col("id_b") &&
          // length filter: Jaccard >= t forces t*|A| <= |B| and t*|B| <= |A|
          col("n_b") * t6 <= col("n_a") * 1000000L &&
          col("n_a") * t6 <= col("n_b") * 1000000L)
      .select("id_a", "id_b").distinct()

    cand
      .join(base.select(col("id").as("id_a"), col("toks").as("toks_a")), "id_a")
      .join(base.select(col("id").as("id_b"), col("toks").as("toks_b")), "id_b")
      .withColumn("inter", size(array_intersect(col("toks_a"), col("toks_b"))).cast("long"))
      .withColumn("uni", size(array_union(col("toks_a"), col("toks_b"))).cast("long"))
      .filter(col("inter") * 1000000L >= col("uni") * t6) // integer-exact t-test
      .select(col("id_a"), col("id_b"),
        (col("inter").cast("double") / col("uni")).as("jaccard"))
  }
}
