package graft

import graft.operators.Salting
import org.apache.spark.sql.functions._

class SaltingSpec extends SparkSpec {

  import spark.implicits._

  test("salted join computes exactly the plain join (skewed input)") {
    // heavy skew: 90% of rows share one key
    val large = (1 to 5000).map(i => (if (i % 10 == 0) i.toLong % 50 else 7L, i.toDouble))
      .toDF("k", "v")
    val small = (0L to 60L).map(k => (k, s"dim$k")).toDF("k", "name")

    val plain = large.join(small, "k")
    val salted = Salting.saltedJoin(large, small, "k", salts = 8)

    assert(salted.count() == plain.count())
    val a = plain.agg(sum("v")).first().getDouble(0)
    val b = salted.agg(sum("v")).first().getDouble(0)
    assert(math.abs(a - b) < 1e-6)
  }

  test("salted distinct count equals exact countDistinct per key") {
    val df = (1 to 2000)
      .map(i => (i % 5L, s"u${i % 37}"))
      .toDF("k", "user")
    val exact = df.groupBy("k").agg(countDistinct("user").as("c"))
      .as[(Long, Long)].collect().toMap
    val salted = Salting.saltedDistinctCount(df, "k", "user", salts = 8)
      .as[(Long, Long)].collect().toMap
    assert(salted == exact)
  }
}
