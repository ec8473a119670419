package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Key-salting for skew — the manual fallback when AQE's runtime skew
  * split isn't available (non-equi join shapes, non-algebraic
  * aggregates) or when one key is hot enough to dominate a stage.
  *
  * Salted join: the skewed (large) side gets a random salt in
  * [0, salts); the small side is replicated `salts` times; the join key
  * becomes (key, salt) — one hot key now spreads over `salts` tasks.
  * Cost: small side × salts, which is why the small side must be small.
  */
object Salting {

  /** Equi-join `large ⋈ small` on `key`, with the large side's hot keys
    * spread across `salts` partitions. Seeded → deterministic. */
  def saltedJoin(large: DataFrame, small: DataFrame, key: String,
                 salts: Int = 16, seed: Long = 42L): DataFrame = {
    val saltedLarge = large.withColumn("__salt",
      floor(rand(seed) * salts).cast("int"))
    val replicatedSmall = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    saltedLarge.join(replicatedSmall, Seq(key, "__salt"))
      .drop("__salt")
  }

  /** Two-stage salted aggregation: partial aggregate on (key, salt),
    * final on key. For algebraic aggregates Catalyst's partial
    * aggregation already does this; the explicit form matters for
    * aggregates without partial pushdown (exact distinct per hot key). */
  def saltedDistinctCount(df: DataFrame, key: String, valueCol: String,
                          salts: Int = 16): DataFrame =
    df.withColumn("__salt", pmod(hash(col(valueCol)), lit(salts)))
      .groupBy(col(key), col("__salt"))
      .agg(countDistinct(col(valueCol)).as("__partial"))
      .groupBy(col(key))
      .agg(sum("__partial").as("distinct_count"))
  // correctness relies on salting by hash(value): equal values always
  // land in the same salt bucket, so partial distinct counts are
  // disjoint and sum exactly
}
