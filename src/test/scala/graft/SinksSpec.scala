package graft

import java.nio.file.{Files, Paths}
import graft.sources.Sinks
import org.apache.spark.sql.functions._
import scala.jdk.CollectionConverters._

class SinksSpec extends SparkSpec {

  test("partitioned sink lays out hive dirs and prunes on read") {
    val out = Files.createTempDirectory("graft-sink").resolve("events").toString
    Sinks.writePartitioned(
      Tables(spark, sf).events.select("event_id", "event_type", "value"),
      out, Seq("event_type"))

    // hive layout: one directory per partition value
    val stream = Files.list(Paths.get(out))
    val partDirs =
      try stream.iterator().asScala.count(_.getFileName.toString.startsWith("event_type="))
      finally stream.close()
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
    val stream = Files.list(Paths.get(out))
    val parquetFiles =
      try stream.iterator().asScala.count(_.getFileName.toString.endsWith(".parquet"))
      finally stream.close()
    assert(parquetFiles == 3)
  }
}
