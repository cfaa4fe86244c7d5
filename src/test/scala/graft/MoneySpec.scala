package graft

import graft.ops.Money
import org.apache.spark.sql.functions._

/** Money.scaled / scaledSigned: the fast integer-grid rounding and its
  * precondition (non-negative OR tie-free input), made loud instead of
  * prose-only (ADVICE r15). */
class MoneySpec extends SparkSpec {
  import spark.implicits._

  test("scaled == round on 2-decimal values of BOTH signs (ties impossible at k decimals)") {
    // the c_acctbal shape: signed 2-decimal money. floor(x·100+0.5) and
    // BigDecimal-HALF_UP round agree everywhere a true .5 tie can't occur.
    val vals = (-99999 to 99999 by 7).map(_ / 100.0) ++
      Seq(-999.99, -0.01, 0.0, 0.01, 9999.99)
    val rows = vals.toDF("x")
      .select(Money.cents(col("x")).as("fast"),
        round(col("x") * 100).cast("long").as("ref"))
      .where(col("fast") =!= col("ref"))
    assert(rows.count() == 0)
  }

  test("scaled DIVERGES on exact negative .5 ties; scaledSigned matches round on all signs incl. ties") {
    // binary-exact ties: x·2 ∈ {…, -2.5, -1.5, -0.5, 0.5, 1.5, …}
    val vals = (-9 to 9).map(_ / 4.0) // quarters: ±0.25 → ±0.5 ties at factor 2
    val df = vals.toDF("x").select(col("x"),
      Money.scaled(col("x"), 2).as("fast"),
      Money.scaledSigned(col("x"), 2).as("signed"),
      round(col("x") * 2).cast("long").as("ref"))
    // the documented failure mode really exists: negative ties round
    // toward +∞ under scaled, away from zero under round
    assert(df.where(col("x") < 0 && col("fast") =!= col("ref")).count() > 0)
    // and the sign-split variant closes it on every value
    assert(df.where(col("signed") =!= col("ref")).count() == 0)
  }

  test("every fixture column the engine scales is inside the precondition (signed ⇒ 2-decimal)") {
    // the adopter list (grep Money.cents/scaled call sites): a future
    // fixture shipping a signed NON-2-decimal value through one of these
    // columns must turn this red, not silently drift from the oracle.
    val dir = "/root/testdata/sf0.001"
    val adopters = Seq(
      "lineitem" -> Seq("l_extendedprice", "l_quantity", "l_discount", "l_tax"),
      "orders"   -> Seq("o_totalprice"),
      "part"     -> Seq("p_retailprice"),
      "customer" -> Seq("c_acctbal"), // signed — must stay on the cent grid
      "events"   -> Seq("value"))
    for ((t, cols) <- adopters; c <- cols) {
      val bad = Tables.table(spark, dir, t)
        .where(col(c).isNotNull &&
          (col(c) < 0 && abs(col(c) * 100 - round(col(c) * 100)) > 1e-6))
        .count()
      assert(bad == 0, s"$t.$c: signed values off the 2-decimal grid")
    }
  }
}
