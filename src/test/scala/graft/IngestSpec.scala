package graft

import graft.catalog.Lake
import graft.sources.Ingest
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class IngestSpec extends AnyFunSuite {
  import TestSpark._
  private val tmp = "target/tmp/ingest-spec"

  test("jsonl -> partitioned parquet round trip preserves rows and prunes partitions") {
    val lake = Lake(spark, sfDir)
    val events = lake.events.withColumn("ts", col("ts").cast("string"))
    events.write.mode("overwrite").json(s"$tmp/events_jsonl")

    val back = Ingest.readJsonl(spark, s"$tmp/events_jsonl", events.schema)
    assert(back.count() == events.count())

    Ingest.writePartitioned(back, s"$tmp/events_parquet", Seq("event_type"), 4)
    val scanned = spark.read.parquet(s"$tmp/events_parquet")
    assert(scanned.count() == events.count())

    // partition pruning: a filter on the partition column must reduce
    // the files read to the single matching directory
    val pruned = scanned.filter(col("event_type") === "purchase")
    val plan = pruned.queryExecution.executedPlan.toString
    assert(pruned.count() == events.filter(col("event_type") === "purchase").count())
    assert(!plan.contains("event_type=click") || plan.contains("PartitionFilters"))
  }

  test("csv round trip with explicit schema") {
    val lake = Lake(spark, sfDir)
    val nation = lake.nation
    nation.write.mode("overwrite").option("header", "true").csv(s"$tmp/nation_csv")
    val back = Ingest.readCsv(spark, s"$tmp/nation_csv", nation.schema)
    assert(back.count() == 25)
    assert(back.schema == nation.schema)
  }
}
