package graft

import graft.sources.Ingest
import org.apache.spark.sql.functions._

/** Unsigned-int widening on ingest (SURVEY §1.2): two's-complement bits in
  * signed columns reinterpret to the full unsigned range — u8→Short,
  * u16→Int, u32→Long, u64→Decimal(20,0). */
class IngestSpec extends SparkSpec {
  import spark.implicits._

  test("u8/u16/u32 widen two's-complement bits to the unsigned value") {
    val df = Seq(
      (0.toByte, 0.toShort, 0),
      (127.toByte, 32767.toShort, Int.MaxValue),
      (-1.toByte, -1.toShort, -1),               // uN::MAX
      (-128.toByte, -32768.toShort, Int.MinValue) // 2^(N-1)
    ).toDF("b", "s", "i")
    val got = df.select(Ingest.u8($"b").as("u8"), Ingest.u16($"s").as("u16"),
        Ingest.u32($"i").as("u32")).collect()
      .map(r => (r.getShort(0), r.getInt(1), r.getLong(2)))
    assert(got(0) == ((0.toShort, 0, 0L)))
    assert(got(1) == ((127.toShort, 32767, 2147483647L)))
    assert(got(2) == ((255.toShort, 65535, 4294967295L)))
    assert(got(3) == ((128.toShort, 32768, 2147483648L)))
  }

  test("u64 widens to Decimal(20,0) covering the full 2^64 range") {
    val df = Seq(0L, Long.MaxValue, -1L, Long.MinValue).toDF("l")
    val got = df.select(Ingest.u64($"l").as("u64")).collect()
      .map(_.getDecimal(0).toBigInteger)
    assert(got(0) == java.math.BigInteger.ZERO)
    assert(got(1) == new java.math.BigInteger("9223372036854775807"))
    assert(got(2) == new java.math.BigInteger("18446744073709551615")) // u64::MAX
    assert(got(3) == new java.math.BigInteger("9223372036854775808"))  // 2^63
  }

  test("aggregation works in the widened domain (sum of u64 ids)") {
    val df = Seq(-1L, -2L).toDF("l") // u64::MAX, u64::MAX-1
    val s  = df.agg(sum(Ingest.u64($"l")).as("s")).collect()(0)
      .getDecimal(0).toBigInteger
    assert(s == new java.math.BigInteger("36893488147419103229")) // 2*2^64-3
  }
}
