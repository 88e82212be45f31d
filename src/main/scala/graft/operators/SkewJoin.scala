package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Salted equi-join for skewed keys. AQE's skew-join handles most cases at
 * runtime, but salting is still the tool when a single key dwarfs a
 * partition (hot user, null-ish default key) or when the join feeds
 * stateful streaming where AQE is off:
 *
 *  - the skewed (big) side gets a deterministic salt in [0, salts);
 *  - the build (small) side is replicated once per salt value;
 *  - the join key becomes (key, salt), spreading the hot key over `salts`
 *    reducers.
 *
 * The salt is a hash of the big side's whole row (not random), so results
 * are reproducible run to run.
 */
object SkewJoin {

  def salted(
      big: DataFrame,
      small: DataFrame,
      key: String,
      salts: Int = 16): DataFrame = {
    require(salts > 0, "salts must be positive")
    require(!big.columns.contains("_salt") && !small.columns.contains("_salt"),
      "inputs already have a _salt column; rename it before salting")
    val saltedBig = big.withColumn("_salt",
      pmod(xxhash64(struct(big.columns.map(col).toIndexedSeq: _*)), lit(salts)).cast("int"))
    val replicatedSmall = small.withColumn("_salt",
      explode(array((0 until salts).map(lit): _*)))
    saltedBig.join(replicatedSmall, Seq(key, "_salt")).drop("_salt")
  }

  /** Query entry (oracle-checked): the salted orders⋈customer join must
    * produce EXACTLY the rows of the plain equi-join — salting redistributes
    * work, never changes the result. The salted path is forced onto a
    * sort-merge join (broadcast disabled per-plan via hints is not needed:
    * the replicated small side at 16× stays broadcastable, which is fine —
    * the salt column still spreads the shuffle keys of the big side). */
  def skewJoinSalted(spark: org.apache.spark.sql.SparkSession, dir: String): DataFrame = {
    val orders = Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_custkey").as("custkey"), col("o_totalprice"))
    val customer = Tables.customer(spark, dir)
      .select(col("c_custkey").as("custkey"), col("c_name"), col("c_mktsegment"))
    salted(orders, customer, "custkey")
      .select("o_orderkey", "custkey", "c_name", "c_mktsegment", "o_totalprice")
      .orderBy(col("o_orderkey"))
  }
}
