package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/**
 * Consume with a user-property selector — the graft analog of the
 * reference's SQL92 message-selector examples (reference:
 * example/PropertyFilterExamples.java:18-33:
 * `MessageSelector.bySql("item = 'iphone 12'")`;
 * example/SetUserPropertyExamples.java sets the user/item properties the
 * producer side attaches). Two equivalent forms are shown: the
 * `propertyFilter` source option (the broker-side selector analog, applied
 * in the scan) and a DataFrame filter over the `properties` map column.
 *
 * Run: `sbt "runMain graft.examples.PropertyFilterExamples [rootDir]"`
 */
object PropertyFilterExamples {
  def main(args: Array[String]): Unit = {
    val root = args.headOption.getOrElse("/tmp/graft-mq-demo")
    val topic = "SOURCE_TOPIC"
    if (graft.source.TopicLog.listQueues(root, topic).isEmpty)
      SimpleProducer.main(Array(root, topic))
    val spark = SparkSession.builder()
      .master("local[4]").appName("graft-property-filter")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // form 1: selector pushed into the source (reference's bySql analog)
    val selected = spark.read.format("graft-mq")
      .option("topic", topic).option("consumerGroup", "property-filter-examples-1")
      .option("rootDir", root)
      .option("propertyFilter", "item=iphone 12")
      .load()
    println(s"propertyFilter option: ${selected.count()} messages with item = 'iphone 12'")
    selected.select(col("body"), col("properties")("user").as("user"),
      col("properties")("item").as("item"))
      .show(5, truncate = false)

    // form 2: the same predicate over the properties map column in SQL
    spark.read.format("graft-mq")
      .option("topic", topic).option("consumerGroup", "property-filter-examples-2")
      .option("rootDir", root).load()
      .createOrReplaceTempView("mq")
    spark.sql(
      "SELECT properties['user'] AS user, count(*) AS n FROM mq " +
        "WHERE properties['item'] = 'iphone 12' GROUP BY 1 ORDER BY 1")
      .show(truncate = false)
    spark.stop()
  }
}
