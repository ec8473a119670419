package graft.operators

import org.apache.spark.sql.DataFrame
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
  * otherwise explode the candidate count. Three pre-verification
  * filters prune the candidate space: the length filter
  * (t·|A| ≤ |B| ≤ |A|/t), and PPJoin's POSITIONAL filter — a shared
  * prefix token at 1-based ordered positions (i, j) bounds the overlap
  * by 1 + min(|A|−i, |B|−j), which must reach the required
  * t/(1+t)·(|A|+|B|) — the filter that keeps low-entropy corpora
  * (small vocabularies, shared boilerplate) from flooding verification
  * through hot prefix tokens.
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

  /** Candidate pairs (id_a < id_b) surviving prefix + length +
    * positional filtering, BEFORE exact verification — the set whose
    * size measures how much the blocking actually prunes
    * (SetSimJoinSpec pins it within a small factor of the output;
    * jaccardSelfJoin verifies exactly these pairs). */
  private[graft] def candidates(df: DataFrame, idCol: String,
                                tokensCol: String, threshold: Double): DataFrame = {
    require(threshold > 0.0 && threshold <= 1.0,
      s"threshold must be in (0, 1], got $threshold")
    val t6 = math.round(threshold * 1000000L) // t in ppm, exact for 6-dp t
    val base = df.select(col(idCol).as("id"), col(tokensCol).as("toks"))

    // global token frequencies: the ordering signal for prefix selection
    val freq = base.select(explode(col("toks")).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("tok_freq"))

    // per record: tokens ordered rarest-first (freq asc, token asc),
    // then the first (n - ceil(t*n) + 1) become blocking keys, each
    // carrying its 0-based position in the FULL ordered token list
    // (prefix positions == ordered positions, the prefix being a
    // prefix) — the positional filter below needs it
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
      posexplode(col("prefix")).as(Seq("p_a", "tok_a")))
    val b = ordered.select(col("id").as("id_b"), col("n").as("n_b"),
      posexplode(col("prefix")).as(Seq("p_b", "tok_b")))
    // Required overlap for Jaccard ≥ t: |∩| ≥ α = t/(1+t)·(|A|+|B|)
    // (substitute |∪| = |A|+|B|−|∩|), kept in exact ppm arithmetic.
    // POSITIONAL filter, aggregated form (PPJoin, Xiao et al. 2008):
    // per pair, let o = number of shared BOTH-prefix tokens and
    // (i*, j*) the 1-based ordered positions of the LAST one. The
    // token ordering is one global total order, so every shared token
    // that globally precedes the last both-prefix shared token is
    // itself in both prefixes (its positions are smaller, and prefixes
    // are position-downward-closed) and is therefore counted in o,
    // while every shared token after it occupies positions > i* in A
    // and > j* in B — at most min(|A|−i*, |B|−j*) of them. Hence
    // overlap ≤ o + min(|A|−i*, |B|−j*), and pairs whose bound misses
    // α are pruned BEFORE the token-array verification join. The
    // groupBy replaces the old `.distinct()` — same shuffle, and o /
    // max-position fall out of the same aggregation. (A per-token
    // pre-filter inside the join would be UNSOUND here: dropping rows
    // undercounts o for the survivors.) Measured at sf0.1 on the
    // small-vocab docs corpus: 253k length-filtered candidates → 2.3k
    // verified, where the single-token bound pruned only ~6%.
    a.join(b,
        col("tok_a") === col("tok_b") && col("id_a") < col("id_b") &&
          // length filter: Jaccard >= t forces t*|A| <= |B| and t*|B| <= |A|
          col("n_b") * t6 <= col("n_a") * 1000000L &&
          col("n_a") * t6 <= col("n_b") * 1000000L)
      .groupBy("id_a", "id_b", "n_a", "n_b")
      .agg(count(lit(1)).as("o"),
        max(col("p_a")).as("lp_a"), max(col("p_b")).as("lp_b"))
      .filter((col("o") +
          least(col("n_a") - col("lp_a") - 1L, col("n_b") - col("lp_b") - 1L)) *
          (1000000L + t6) >= (col("n_a") + col("n_b")) * t6)
      .select("id_a", "id_b")
  }

  /** All pairs (id_a < id_b) with Jaccard(tokens_a, tokens_b) ≥
    * `threshold`. `tokensCol` must be a deduplicated array<string>
    * (apply `array_distinct` upstream). Output: `id_a, id_b, jaccard`
    * where jaccard = |∩| / |∪| — one integer division, exact in IEEE
    * double, hence hash-stable across engines. Exact result set —
    * the filtered candidates are a superset of the qualifying pairs
    * and the verification filter applies the true predicate. */
  def jaccardSelfJoin(df: DataFrame, idCol: String, tokensCol: String,
                      threshold: Double): DataFrame = {
    val t6 = math.round(threshold * 1000000L)
    val base = df.select(col(idCol).as("id"), col(tokensCol).as("toks"))
    candidates(df, idCol, tokensCol, threshold)
      .join(base.select(col("id").as("id_a"), col("toks").as("toks_a")), "id_a")
      .join(base.select(col("id").as("id_b"), col("toks").as("toks_b")), "id_b")
      .withColumn("inter", size(array_intersect(col("toks_a"), col("toks_b"))).cast("long"))
      // |∪| arithmetically from the (deduplicated) sizes — halves the
      // per-candidate verification vs a second array traversal
      .withColumn("uni",
        size(col("toks_a")).cast("long") + size(col("toks_b")) - col("inter"))
      .filter(col("inter") * 1000000L >= col("uni") * t6) // integer-exact t-test
      .select(col("id_a"), col("id_b"),
        (col("inter").cast("double") / col("uni")).as("jaccard"))
  }
}
