package graft.sources

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Unsigned-integer widening on ingest (SURVEY.md §1.2): the reference's
  * type lattice includes u8..u64 (`/root/reference/src/types.rs`,
  * `traits.rs:97-183`); Spark has no unsigned types, so each uN widens to
  * the next signed type that holds its full range — u8→Short, u16→Int,
  * u32→Long, u64→Decimal(20,0).
  *
  * Two ingest paths exist in practice:
  *   - Parquet files with unsigned *logical* types (UINT_8..UINT_64):
  *     Spark's vectorized reader already applies exactly this widening on
  *     read — nothing for the engine to do.
  *   - Unsigned payloads stored bit-for-bit in signed columns (the common
  *     "u64 id in an i64 column" case): these helpers reinterpret the
  *     two's-complement bits as the unsigned value, as pure codegen'd
  *     arithmetic (no UDF).
  */
object Ingest {

  /** u8 bits in a ByteType column → ShortType [0, 255]. */
  def u8(c: Column): Column =
    (c.cast("smallint") + when(c < 0, lit(256)).otherwise(lit(0))).cast("smallint")

  /** u16 bits in a ShortType column → IntegerType [0, 65535]. */
  def u16(c: Column): Column =
    (c.cast("int") + when(c < 0, lit(65536)).otherwise(lit(0))).cast("int")

  /** u32 bits in an IntegerType column → LongType [0, 2^32). */
  def u32(c: Column): Column =
    (c.cast("bigint") + when(c < 0, lit(4294967296L)).otherwise(lit(0L))).cast("bigint")

  /** u64 bits in a LongType column → Decimal(20,0) [0, 2^64). */
  def u64(c: Column): Column =
    (c.cast(DecimalType(20, 0)) +
      when(c < 0, lit(BigDecimal("18446744073709551616")))
        .otherwise(lit(BigDecimal(0))))
      .cast(DecimalType(20, 0))
}
