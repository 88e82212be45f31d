package graft.plans

import java.nio.file.Files

import graft.SparkSpec
import graft.source.{Message, TopicLog}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._

class PushPropertyPredicatesSpec extends SparkSpec {

  private lazy val root: String = {
    val r = Files.createTempDirectory("graft-props-push").toString
    // 100 messages across 2 queues; properties cycle region=eu/us/apac and
    // tier=gold/free
    for (q <- 0 until 2)
      TopicLog.append(r, "props", q, (0 until 50).iterator.map { i =>
        Message(1000L * (i + 1), s"k$q-$i", "t",
          Map("region" -> Seq("eu", "us", "apac")(i % 3),
            "tier" -> (if (i % 2 == 0) "gold" else "free")),
          s"body-$q-$i")
      })
    r
  }

  private def read(): DataFrame =
    spark.read.format("graft-mq")
      .option("topic", "props").option("consumerGroup", "g").option("rootDir", root)
      .load()

  private def scanDescription(df: DataFrame): String =
    df.queryExecution.executedPlan.collectFirst {
      case b: BatchScanExec => b.scan.description()
    }.getOrElse(sys.error("no BatchScanExec in plan"))

  test("properties['k'] = 'v' predicates reach the reader and rows stay exact") {
    val df = read().filter(col("properties")("region") === "eu" &&
      col("properties")("tier") === "gold")
    val desc = scanDescription(df)
    assert(desc.contains("region") && desc.contains("eu"), s"not pushed: $desc")
    assert(desc.contains("tier") && desc.contains("gold"), s"not pushed: $desc")
    val rows = df.select("msg_key").collect().map(_.getString(0)).toSet
    // ground truth: i % 3 == 0 (eu) and i % 2 == 0 (gold) -> i % 6 == 0
    val expect = (for (q <- 0 until 2; i <- 0 until 50 if i % 6 == 0)
      yield s"k$q-$i").toSet
    assert(rows === expect)
  }

  test("pushed reader drops non-matching messages before they reach Spark") {
    // strip the residual by reading through a bare aggregate: if the reader
    // did NOT filter, count would include all 100 messages since the scan
    // itself (not the residual) is what the pushed options constrain.
    // Observable via the custom MessagesRead/MessagesFiltered task metrics.
    val df = read().filter(col("properties")("tier") === "gold")
    df.collect() // execute
    val metrics = df.queryExecution.executedPlan.collectFirst {
      case b: BatchScanExec => b.metrics
    }.get
    val read_ = metrics.get(graft.source.Metrics.MessagesRead).map(_.value)
    val filtered = metrics.get(graft.source.Metrics.MessagesFiltered).map(_.value)
    assert(read_.contains(50L), s"reader materialized $read_ rows, want 50")
    assert(filtered.contains(50L), s"reader filtered $filtered rows, want 50")
  }

  test("throwing accesses and foreign maps are left alone") {
    // ANSI element_at can raise MAP_KEY_DOES_NOT_EXIST — consuming it at
    // the reader would suppress the error, so it must stay residual-only
    val ansi = read().filter(expr("element_at(properties, 'region') = 'eu'"))
    if (spark.conf.get("spark.sql.ansi.enabled").toBoolean)
      assert(!scanDescription(ansi).contains("region -> eu"),
        s"ANSI element_at must not be pushed: ${scanDescription(ansi)}")
    // try_element_at is null-safe: pushed
    val tryEa = read().filter(expr("try_element_at(properties, 'region') = 'eu'"))
    assert(scanDescription(tryEa).contains("region"),
      s"try_element_at should push: ${scanDescription(tryEa)}")
    // a map built in the query is not the relation's properties column
    val foreign = read()
      .withColumn("m", map(lit("region"), lit("eu")))
      .filter(col("m")("region") === "eu")
    assert(!scanDescription(foreign).contains("region -> eu"))
  }

  test("user propertyFilter option wins over a conflicting predicate") {
    val df = spark.read.format("graft-mq")
      .option("topic", "props").option("consumerGroup", "g").option("rootDir", root)
      .option("propertyFilter", "tier=gold")
      .load()
      .filter(col("properties")("tier") === "free")
    // option stays, predicate is NOT merged over it; residual makes the
    // (contradictory) answer empty rather than silently widening the scan
    assert(scanDescription(df).contains("gold"))
    assert(!scanDescription(df).contains("free"))
    assert(df.count() === 0)
  }
}
