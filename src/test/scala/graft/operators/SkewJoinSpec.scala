package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SkewJoinSpec extends SparkSpec {

  test("salted join returns exactly the plain join's rows under heavy skew") {
    import spark.implicits._
    // 10k rows, 90% on one hot key
    val big = (0 until 10000)
      .map(i => (if (i % 10 == 0) i.toLong % 100 else 7L, s"v$i"))
      .toDF("k", "payload")
    val small = Seq((7L, "hot"), (0L, "zero"), (50L, "fifty")).toDF("k", "name")
    val plain = big.join(small, "k")
    val salted = SkewJoin.salted(big, small, "k", salts = 8)
    assert(salted.count() === plain.count())
    val a = plain.select("k", "payload", "name").collect().map(_.toString).sorted
    val b = salted.select("k", "payload", "name").collect().map(_.toString).sorted
    assert(a.sameElements(b))
  }

  test("salting spreads the hot key across reducers") {
    import spark.implicits._
    val big = (0 until 1000).map(i => (7L, s"v$i")).toDF("k", "payload")
    val salts = big.withColumn("_salt",
      pmod(xxhash64(struct(big.columns.map(col).toIndexedSeq: _*)), lit(8)).cast("int"))
      .select("_salt").distinct().count()
    assert(salts === 8) // deterministic hash salt covers the full range
  }

  test("GraftSession.local registers SQL functions and sane configs") {
    val s = graft.GraftSession.local(2)
    assert(s.conf.get("spark.sql.adaptive.enabled") === "true")
    assert(s.sql("SELECT size(graft_minhash_sig('abcdefgh', 4, 8, 1)) n").head().getInt(0) === 8)
  }
}
