package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted join for skewed keys: when one join key carries a disproportionate
  * share of the big side, a plain shuffle join sends that key's entire mass
  * to one reducer. Salting splits each key into `nSalts` sub-keys — the big
  * side is spread by a deterministic per-row salt, the small side replicated
  * ×nSalts — restoring parallelism at the price of a bounded small-side
  * blow-up.
  *
  * This complements (does not replace) AQE skew-join splitting: AQE fixes
  * post-shuffle partition skew adaptively; explicit salting is the tool when
  * a single key exceeds what one task can hold at all, and works in plans
  * AQE can't rewrite (e.g. under aggregations keyed on the join key).
  *
  * Results are exactly those of `big.join(small, keys)` — verified against a
  * plain-join DuckDB oracle in the gate.
  */
object SkewJoin {

  /** Inner-join `big ⋈ small` on equality `keys`, spreading the big side
    * over `nSalts` sub-keys. The salt is a per-ROW counter
    * (monotonically_increasing_id mod nSalts), not a row-content hash: a
    * hot key whose mass comes from many IDENTICAL rows (common after
    * narrow projections) hashes every copy to the same salt and the whole
    * mass still lands on one reducer — the exact failure the operator
    * exists to prevent. The join RESULT is independent of which salt a row
    * gets (the small side carries every salt), so the counter's
    * partition-layout sensitivity is harmless; no rand() involved.
    */
  def saltedInner(big: DataFrame, small: DataFrame, keys: Seq[String], nSalts: Int): DataFrame = {
    require(nSalts > 0)
    val saltedBig = big.withColumn("__salt",
      pmod(monotonically_increasing_id(), lit(nSalts.toLong)).cast("int"))
    val saltedSmall = small.withColumn("__salt",
      explode(sequence(lit(0), lit(nSalts - 1))))
    saltedBig.join(saltedSmall, keys :+ "__salt").drop("__salt")
  }
}
