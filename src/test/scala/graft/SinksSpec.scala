package graft

import java.nio.file.{Files, Paths}
import graft.sources.Sinks
import org.apache.spark.sql.functions._

class SinksSpec extends SparkSpec {

  test("partitioned sink lays out hive dirs and prunes on read") {
    val out = Files.createTempDirectory("graft-sink").resolve("events").toString
    Sinks.writePartitioned(
      Tables(spark, sf).events.select("event_id", "event_type", "value"),
      out, Seq("event_type"))

    // hive layout: one directory per partition value
    val dirs = Files.list(Paths.get(out)).iterator()
    var partDirs = 0
    while (dirs.hasNext) {
      val p = dirs.next()
      if (p.getFileName.toString.startsWith("event_type=")) partDirs += 1
    }
    assert(partDirs >= 3, s"expected hive partition dirs, got $partDirs")

    // a filter on the partition column becomes partition pruning
    val read = spark.read.parquet(out).filter(col("event_type") === "purchase")
    val plan = read.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(event_type"),
      s"expected partition pruning:\n$plan")
    assert(read.count() ==
      Tables(spark, sf).events.filter(col("event_type") === "purchase").count())
  }

  test("sized sink controls output file count") {
    val out = Files.createTempDirectory("graft-sink2").resolve("li").toString
    Sinks.writeSized(Tables(spark, sf).lineitem, out, numFiles = 3)
    val files = Files.list(Paths.get(out)).iterator()
    var parquetFiles = 0
    while (files.hasNext) {
      if (files.next().getFileName.toString.endsWith(".parquet")) parquetFiles += 1
    }
    assert(parquetFiles == 3)
  }
}
