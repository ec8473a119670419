package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** POS tagging as pure Catalyst — no UDF anywhere on the path.
  *
  * Two pieces:
  *  - [[ruleTagColumn]]: the rule tagger ([[PosTagger.tagToken]], ASCII
  *    mode) re-expressed as a generated when-chain over the SAME
  *    constants, so it runs inside whole-stage codegen and its parity
  *    with the closure form is a spec'd law.
  *  - [[tagTokens]]: most-frequent-tag lookup via a broadcast join on
  *    [[PosLexicon]] with the rule chain as fallback — the accuracy of
  *    a trained-baseline tagger with the scaling shape of a dimension
  *    join (lexicon broadcast once; corpus stays narrow: posexplode is
  *    row-local, the join adds no shuffle).
  *
  * Reference: `transformers.py:67-77` wraps `nltk.pos_tag` (a trained
  * perceptron). Capability fidelity, not bit-compat (SURVEY.md §7.4);
  * unlike the NLTK binary, every weight here is an oracle-expressible
  * constant.
  */
object LexiconTagger {

  /** [[PosTagger.tagToken]] (ASCII mode) as a Catalyst column —
    * [[RuleTagExpr]], a single codegen'd call into the closure itself.
    * Until r16 this was a generated 46-branch when-chain over the same
    * constants; the chain put q52/q53/q53b's codegen units at 122–132 KB
    * of source, one lexicon growth from janino's 64 KB method cliff
    * (see RuleTagExpr's scaladoc). Parity with the closure is still the
    * spec'd law (LexiconTaggerSpec) — now true by construction. */
  def ruleTagColumn(word: Column): Column = RuleTagExpr(word)

  /** Tag every token of `tokensCol`, one output row per (id, pos, word,
    * tag) — the exploded form downstream aggregations want (no regroup
    * shuffle). The lexicon side is a few hundred rows → explicit
    * broadcast; the corpus side stays narrow.
    *
    * Two lookup levels: exact word, then a morphological back-off for
    * 3rd-person -s verb forms — strip one trailing 's' (not 'ss', len >
    * 3) and look the stem up in the VERB entries ONLY. Plural nouns
    * need no back-off (the NOUN fallback is already right), and
    * restricting to verbs keeps "news" (stem "new", an ADJ entry) from
    * mis-tagging; stems of closed-class words ("is"→"i") never match
    * because the lexicon is disjoint from the closed classes. */
  def tagTokens(df: DataFrame, idCol: String, tokensCol: String,
      lexicon: DataFrame): DataFrame =
    tagTokensImpl(df, idCol, tokensCol, lexicon, emission = None)

  /** [[tagTokens]] with an optional trained EMISSION back-off level —
    * [[PosTransitions.Emission]], the most-frequent-tag table for
    * open-class training words — between the stem back-off and the rule
    * fallback. Only the HMM layer passes it ([[tagTokensHmm]]): the
    * plain lexicon layer (q52/q53) keeps the hand-lexicon-plus-rules
    * contract byte-stable. The join key is the RAW token against the
    * all-lowercase trained keys, so capitalized forms never match and
    * keep the rule tagger's proper-noun evidence — the oracle mirrors
    * this with `list_contains(arr, t)` on the raw token. */
  private def tagTokensImpl(df: DataFrame, idCol: String, tokensCol: String,
      lexicon: DataFrame, emission: Option[DataFrame]): DataFrame = {
    val lex = broadcast(lexicon.select(col("word").as("lex_word"),
      col("tag").as("lex_tag")))
    val lexVerbStems = broadcast(lexicon.filter(col("tag") === "VERB")
      .select(col("word").as("stem_word"), col("tag").as("stem_tag")))
    val lw = lower(col("word"))
    val base = df
      .select(col(idCol), posexplode(col(tokensCol)).as(Seq("pos", "word")))
      .join(lex, lw === col("lex_word"), "left")
      .withColumn("stem",
        when(length(col("word")) > 3 && lw.endsWith("s") && !lw.endsWith("ss"),
          lw.substr(lit(1), length(col("word")) - 1)))
      .join(lexVerbStems, col("stem") === col("stem_word"), "left")
    emission match {
      case Some(e) =>
        // The HMM layer also needs to know WHICH tokens fell through to
        // the rule chain (its bilateral OOV lever scores exactly those)
        // — carried as an internal flag the decode drops before output.
        base.join(broadcast(e), col("word") === col("emi_word"), "left")
          .select(col(idCol), col("pos"), col("word"),
            coalesce(col("lex_tag"), col("stem_tag"), col("emi_tag"),
              ruleTagColumn(col("word"))).as("tag"),
            (col("lex_tag").isNull && col("stem_tag").isNull &&
              col("emi_tag").isNull).as("__rule_fb"))
      case None =>
        base.select(col(idCol), col("pos"), col("word"),
          coalesce(col("lex_tag"), col("stem_tag"),
            ruleTagColumn(col("word"))).as("tag"))
    }
  }

  /** Sequence-context correction over [[tagTokens]] output — the
    * transformation-rule layer of a Brill (1992) tagger, kept to three
    * classic, deterministic rules (public knowledge):
    *   1. NOUN → VERB after the word "to" when the word is
    *      lowercase-initial (infinitives: "to repair"; the case guard
    *      keeps "to Paris" a NOUN),
    *   2. NOUN → VERB after a subject pronoun ("it costs"; possessives
    *      like "his" are deliberately NOT in the trigger list — "his
    *      work" must stay NOUN),
    *   3. VERB → NOUN after a determiner ("the run").
    * Rules read the UNIGRAM tag of the previous token (no cascading),
    * so one window pass suffices and the oracle can mirror it with a
    * single lag(). Cost: the one shuffle the window needs (partition by
    * doc) — this is inherently sequence work; everything upstream stays
    * narrow. */
  def tagTokensContext(df: DataFrame, idCol: String, tokensCol: String,
      lexicon: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(idCol).orderBy("pos")
    val prevTag = lag(col("tag"), 1).over(w)
    val prevWord = lower(lag(col("word"), 1).over(w))
    val subjectPronouns = Seq("i", "you", "he", "she", "it", "we", "they")
    val corrected =
      when(col("tag") === "NOUN" && prevWord === "to" &&
        col("word").rlike("^[a-z]"), lit("VERB"))
        .when(col("tag") === "NOUN" && prevWord.isInCollection(subjectPronouns),
          lit("VERB"))
        .when(col("tag") === "VERB" && prevTag === "DET", lit("NOUN"))
        .otherwise(col("tag"))
    tagTokens(df, idCol, tokensCol, lexicon)
      .select(col(idCol), col("pos"), col("word"), corrected.as("tag"))
  }

  /** TRAINED sequence-context layer — the learned replacement for the
    * hand-picked rules of [[tagTokensContext]]: a one-lag greedy HMM
    * decode over [[PosTransitions]]' trained counts (see [[TrainTagger]]
    * for the model and training corpus).
    *
    * For each token whose lowercased word is in the learned ambiguity
    * table, choose between its two trained candidate tags by
    * P(tag|state)·P(word|tag), where `state` is the previous token's
    * unigram tag — word-specialized (`W:<word>`) for closed-class words,
    * `START` at position 0. The comparison is pure long arithmetic
    * ((T+1)·c·C products, denominators cross-multiplied), so the DuckDB
    * oracle reproduces it bit-for-bit. Tokens outside the ambiguity
    * table keep their unigram tag.
    *
    * Tokens with NO evidence anywhere (no lexicon/stem/emission hit,
    * outside the ambiguity table, not closed-class) go through the
    * BILATERAL OOV decode instead: all four open-class tags scored by
    * left transition × right transition (a lead() over the same
    * window), normalized per tag, boosted toward the rule-chain prior
    * (-en participles prior ADJ; -ing drops the ADJ candidate) — see
    * PosTransitions' "bilateral OOV decode" block for the arithmetic
    * and LexiconTaggerSpec for the measured gold accuracy.
    *
    * Plan shape: the unigram layer's narrow pass + broadcast lexicon
    * join, ONE window shuffle computing both lag and lead, then five
    * broadcast joins (ambiguity ~90 rows, transition ~150 rows twice,
    * the two ~dozen-row open-tag pivots) — no additional shuffle,
    * corpus side never widens beyond a few working columns. */
  def tagTokensHmm(df: DataFrame, idCol: String, tokensCol: String,
      lexicon: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(idCol).orderBy("pos")
    val prevWord = lower(lag(col("word"), 1).over(w))
    val prevTag = lag(col("tag"), 1).over(w)
    val state =
      when(prevTag.isNull, lit("START"))
        .when(prevWord.isInCollection(PosTransitions.StateWords),
          concat(lit("W:"), prevWord))
        .otherwise(prevTag)
    val nextUni = lead(col("tag"), 1).over(w)
    val amb = broadcast(PosTransitions.ambiguityDf(spark))
    val transA = broadcast(PosTransitions.transitionsDf(spark)
      .select(col("t_state").as("__ta_state"), col("t_tag").as("__ta_tag"),
        col("t_cnt").as("__ta_cnt")))
    val transB = broadcast(PosTransitions.transitionsDf(spark)
      .select(col("t_state").as("__tb_state"), col("t_tag").as("__tb_tag"),
        col("t_cnt").as("__tb_cnt")))
    val openL = broadcast(PosTransitions.openLeftDf(spark))
    val openR = broadcast(PosTransitions.openRightDf(spark))
    // Candidate pair: trained (tagA, tagB) for ambiguity-table words;
    // for OOV open-class words the pair is (unigram tag, its NOUN↔VERB
    // opposite) — the axis the fallback rules actually get wrong.
    val candA = coalesce(col("amb_taga"), col("tag"))
    val candB = coalesce(col("amb_tagb"),
      when(col("tag") === "NOUN", lit("VERB"))
        .when(col("tag") === "VERB", lit("NOUN")))
    val ta = coalesce(col("__ta_cnt"), lit(0L))
    val tb = coalesce(col("__tb_cnt"), lit(0L))
    // Trained words: choose tagB iff (T(s,B)+1)·cB·C(A) > (T(s,A)+1)·cA·C(B)
    // — the integer form of the smoothed posterior comparison. With ZERO
    // transition evidence either way, keep tagA (the most-frequent-tag
    // baseline) rather than letting the emission-rarity ratio decide.
    val scoreA = (ta + 1) * col("amb_ca") * col("amb_ctb")
    val scoreB = (tb + 1) * col("amb_cb") * col("amb_cta")
    // OOV back-off: no emission counts, so flip the unigram guess only on
    // strong word-state transition evidence — (T(s,B)+1) > 4·(T(s,A)+1)
    // (margin pinned on the gold dev sample; 2 lets 2-count states like
    // W:and mis-flip), states restricted to the dense word-specialized
    // ones (W:), the flip gated to lowercase-initial words
    // (capitalization is NOUN evidence the transition table cannot see),
    // and never applied to closed-class words, whose unigram tag is
    // authoritative, not a fallback guess.
    // ---- bilateral OOV lever pieces (constants from PosTransitions) --
    val lw = lower(col("word"))
    val adjAllowed = !lw.endsWith("ing")
    val oovPrior =
      when(lw.endsWith("en") && length(col("word")) > 4, lit("ADJ"))
        .otherwise(col("tag"))
    def oovScore(t: String, l: Column, r: Column): Column = {
      val left = coalesce(l, lit(0L)) + lit(1L)
      val right = when(col("__next_uni").isNull, lit(1L))
        .otherwise(coalesce(r, lit(0L)) + lit(1L))
      val boost = when(oovPrior === t, lit(PosTransitions.OovBoost))
        .otherwise(lit(1L))
      left * right * boost * lit(PosTransitions.openCross(t))
    }
    // The four scores are materialized as COLUMNS (not inlined
    // expressions): the argmax below references each one several times,
    // and a nested when-chain over inlined copies blows the codegen
    // unit up exponentially (first cut read 441 KB source / 30 KB
    // bytecode — the JIT-disabling q42-precursor state; the audit
    // caught it). As multiply-referenced non-trivial aliases they
    // survive CollapseProject, so codegen evaluates each once.
    // Argmax via greatest() + an equality chain in OpenTags order —
    // the FIRST candidate reaching the max wins ties, exactly the
    // reference decode's strict-greater iteration. The -ing exclusion
    // substitutes -1 for ADJ (scores are always positive), so an
    // excluded ADJ can never equal the max.
    val sN = col("__oov_sn")
    val sV = col("__oov_sv")
    val sA = when(adjAllowed, col("__oov_sa")).otherwise(lit(-1L))
    val sD = col("__oov_sd")
    val sBest = greatest(sN, sV, sA, sD)
    val bestTag = when(sN === sBest, lit("NOUN"))
      .when(sV === sBest, lit("VERB"))
      .when(sA === sBest, lit("ADJ"))
      .otherwise(lit("ADV"))
    val tagInCands = col("tag").isin("NOUN", "VERB", "ADV") ||
      (col("tag") === "ADJ" && adjAllowed)
    val sTag = when(col("tag") === "NOUN", sN)
      .when(col("tag") === "VERB", sV)
      .when(col("tag") === "ADJ", sA)
      .otherwise(sD)
    val oovLevered =
      when(tagInCands && bestTag =!= col("tag") &&
        sBest < lit(PosTransitions.OovMargin) * sTag, col("tag"))
        .otherwise(bestTag)
    val oovLeverApplies = col("__rule_fb") && col("amb_word").isNull &&
      col("word").rlike("^[a-z]") &&
      !lw.isInCollection(PosTransitions.StateWords) &&
      col("tag").isin("NOUN", "VERB", "ADJ", "ADV", "X")
    val decoded = when(col("amb_word").isNotNull,
      when(ta === 0 && tb === 0, col("amb_taga"))
        .when(scoreB > scoreA, col("amb_tagb"))
        .otherwise(col("amb_taga")))
      // CAPITALIZATION CONTEXT (r18): a capitalized token that is NOT
      // sentence-initial (state ≠ START, ≠ '.') and outside the trained
      // ambiguity table is proper-noun evidence the per-token rule
      // chain cannot use — its suffix arms fire first ("Monday" ends
      // -y → ADJ) and the emission join is raw-token by design, so
      // capitalized forms reach the rule fallback. Flip open-class
      // guesses to NOUN; closed-class tags (lower-keyed lexicon hit:
      // "I" → PRON, "The" → DET) and existing NOUNs are untouched. In
      // the 4,438-token gold every mid-sentence capitalized token is a
      // NOUN except closed-class "I" — the guard list makes the flip
      // vacuous there.
      .when(col("word").rlike("^[A-Z]") &&
        col("__hmm_state") =!= "START" && col("__hmm_state") =!= "." &&
        col("amb_word").isNull &&
        col("tag").isin("ADJ", "VERB", "X"), lit("NOUN"))
      // BILATERAL OOV DECODE (r18 second lever): a lowercase token with
      // NO evidence anywhere — no lexicon/stem/emission hit (__rule_fb),
      // outside the ambiguity table, not closed-class — carries only
      // its rule-chain guess. Score all four open-class tags by left
      // transition × right transition (the lead() unigram of the NEXT
      // token), normalized per tag and boosted toward a morphological
      // prior: the rule tag, except -en participles (wooden, hidden),
      // whose prior is ADJ; -ing gerund-modifiers drop the ADJ
      // candidate entirely (gold convention reads "the fishing boat"
      // as NOUN compound). A flip must beat the prior-weighted rule
      // tag by ×OovMargin. All-long common-denominator arithmetic —
      // the q53b oracle reproduces it bit-for-bit. Measured on the
      // 4,438-token gold: 0.9387 → 0.9538 (272 → 205 errors), both
      // halves improving (+1.4pp / +1.6pp) and the training corpus
      // not regressing (58 → 55 errors) — structure, not gold-fit.
      .when(oovLeverApplies, oovLevered)
      .when(candB.isNotNull && col("__hmm_state").startsWith("W:") &&
        col("word").rlike("^[a-z]") &&
        !lower(col("word")).isInCollection(PosTransitions.StateWords) &&
        (tb + 1) > (ta + 1) * 4, candB)
      .otherwise(col("tag"))
    tagTokensImpl(df, idCol, tokensCol, lexicon,
      emission = Some(PosTransitions.emissionDf(spark)))
      .withColumn("__hmm_state", state)
      .withColumn("__next_uni", nextUni)
      .withColumn("amb_word_key", lower(col("word")))
      .join(amb, col("amb_word_key") === col("amb_word"), "left")
      .withColumn("__cand_a", candA)
      .withColumn("__cand_b", candB)
      .join(transA, col("__hmm_state") === col("__ta_state") &&
        col("__cand_a") === col("__ta_tag"), "left")
      .join(transB, col("__hmm_state") === col("__tb_state") &&
        col("__cand_b") === col("__tb_tag"), "left")
      .join(openL, col("__hmm_state") === col("ol_state"), "left")
      .join(openR, col("__next_uni") === col("or_tag"), "left")
      .withColumn("__oov_sn", oovScore("NOUN", col("ol_noun"), col("or_noun")))
      .withColumn("__oov_sv", oovScore("VERB", col("ol_verb"), col("or_verb")))
      .withColumn("__oov_sa", oovScore("ADJ", col("ol_adj"), col("or_adj")))
      .withColumn("__oov_sd", oovScore("ADV", col("ol_adv"), col("or_adv")))
      .select(col(idCol), col("pos"), col("word"), decoded.as("tag"))
  }

  /** Array-aligned variant: adds a `tagsCol` array positionally aligned
    * with `tokensCol` (the PosTagger output shape, lexicon-backed).
    * Costs one groupBy-shuffle on `idCol` to rebuild the arrays —
    * prefer [[tagTokens]] when the consumer aggregates anyway. */
  def tagArray(df: DataFrame, idCol: String, tokensCol: String,
      lexicon: DataFrame, tagsCol: String = "tags"): DataFrame = {
    val tagged = tagTokens(df, idCol, tokensCol, lexicon)
      .groupBy(idCol)
      .agg(transform(
        array_sort(collect_list(struct(col("pos"), col("tag")))),
        x => x.getField("tag")).as(tagsCol))
    df.join(tagged, Seq(idCol), "left")
      .withColumn(tagsCol, coalesce(col(tagsCol), array()))
  }
}
