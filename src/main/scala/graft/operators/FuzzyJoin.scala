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
  * all-pairs cross join. This operator uses pigeonhole segment blocking
  * (the PassJoin family — Li, Deng & Feng 2011, "PASS-JOIN: a
  * partition-based method for similarity joins", public): split each
  * key into `maxDist + 1` contiguous segments; two equal-length strings
  * within Hamming distance ≤ maxDist differ in ≤ maxDist positions, so
  * by pigeonhole they agree EXACTLY on at least one segment. Candidates
  * therefore come from a plain equi-join on (segment_idx, segment,
  * length) — shuffle-partitioned like any join, no cross product — and
  * only candidates pay the O(len) verification. At 100 TB the segment
  * frame is (maxDist+1)× the input rows with short string payloads, and
  * skew is bounded by the blocking key's selectivity (a degenerate
  * corpus where everyone shares a segment degrades toward the true
  * candidate count, which is the output's own lower bound).
  */
object FuzzyJoin {

  /** Hamming distance of two equal-length string columns: zip the char
    * arrays, count mismatches. Codegen'd HOFs, no UDF. */
  def hammingDist(a: Column, b: Column): Column =
    aggregate(
      zip_with(split(a, ""), split(b, ""),
        (x, y) => when(x =!= y, 1).otherwise(0)),
      lit(0), (acc, v) => acc + v)

  /** All pairs (id_a < id_b) with Hamming(key_a, key_b) ≤ maxDist.
    * Output: `id_a, id_b, dist` (dist as long). Exact — the pigeonhole
    * guarantees no candidate misses; the verification filter guarantees
    * no false positives. */
  def hammingSelfJoin(df: DataFrame, idCol: String, keyCol: String,
                      maxDist: Int): DataFrame = {
    require(maxDist >= 1, "maxDist must be >= 1 (use equality for 0)")
    val nSeg = maxDist + 1
    // segment i of a length-L key spans (L*i DIV n, L*(i+1) DIV n] —
    // the same integer arithmetic on both sides of the join, so equal
    // lengths produce aligned segments (and ONLY equal lengths can
    // collide: the length is part of the join key)
    def segments(side: String): DataFrame = {
      val key = col(s"${side}_key")
      val segIdx = (0 until nSeg).map { i =>
        val start = expr(s"(length(${side}_key) * $i) DIV $nSeg")
        val len = expr(s"(length(${side}_key) * ${i + 1}) DIV $nSeg") - start
        key.substr(start + 1, len)
      }
      df.select(col(idCol).as(s"${side}_id"), col(keyCol).as(s"${side}_key"))
        .select(col(s"${side}_id"), key, length(key).as(s"${side}_len"),
          posexplode(array(segIdx: _*))
            .as(Seq(s"${side}_seg_idx", s"${side}_seg")))
    }
    val a = segments("a")
    val b = segments("b")
    a.join(b,
        col("a_len") === col("b_len") &&
          col("a_seg_idx") === col("b_seg_idx") &&
          col("a_seg") === col("b_seg") &&
          col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"), col("a_key"), col("b_key"))
      .distinct() // a pair sharing several segments appears once
      .withColumn("dist", hammingDist(col("a_key"), col("b_key")).cast("long"))
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
      .withColumn("dist", levenshtein(col("a_key"), col("b_key")).cast("long"))
      .filter(col("dist") <= 1)
      .select(col("a_id").as("id_a"), col("b_id").as("id_b"), col("dist"))
  }
}
