package graft.operators

import org.scalacheck.{Gen, Prop, Properties}

/**
 * Property check of the overflow-safe sampleBucket identity over the FULL
 * nonnegative Long range: the 32-bit split-multiply must equal the true
 * product's mod-1000 residue computed in BigInt (the spec both the Spark
 * Column and the DuckDB hugeint oracle implement). The suite's chosen-id
 * cases pin the Column itself; this pins the arithmetic identity the
 * formula relies on — with generators biased to the overflow region above
 * ~3.4e9 where the naive product went wrong.
 */
object BucketFormulaProps extends Properties("SampleBucket") {

  private val ids: Gen[Long] = Gen.frequency(
    3 -> Gen.chooseNum(0L, Long.MaxValue),
    2 -> Gen.chooseNum(3400000000L, 1L << 40), // first overflow decade
    1 -> Gen.chooseNum(Long.MaxValue - (1L << 32), Long.MaxValue),
    1 -> Gen.oneOf(0L, 1L, (1L << 32) - 1, 1L << 32, Long.MaxValue))

  property("split-multiply == BigInt product mod 1000") = Prop.forAll(ids) { id =>
    val hi = id >>> 32
    val lo = id & 0xFFFFFFFFL
    val split = ((hi % 1000) * (761L * 296L) + (lo % 1000) * 761L) % 1000
    split == ((BigInt(id) * BigInt(2654435761L)) % 1000).toLong
  }
}
