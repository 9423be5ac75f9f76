package graft

import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract guards: the smoke entry returns rows; query keys are
  * globally unique across packs (a duplicate key would silently drop a
  * query in the Map merge); every oracle key has a query.
  */
class EntryContractSpec extends AnyFunSuite {

  test("entry flagship returns rows on sf0.001 (driver smoke)") {
    assert(SparkEntry.entry(SparkFixture.spark).count() > 0)
  }

  test("no duplicate query names across packs; oracles ⊆ queries") {
    // SparkEntry's own pack list — a copy here would silently miss packs
    // added later (it did: TpchShapes)
    val allKeys = SparkEntry.packs.flatMap(_.queries.keys)
    val dups = allKeys.groupBy(identity).collect { case (k, vs) if vs.size > 1 => k }
    assert(dups.isEmpty, s"duplicate query names: $dups")
    assert(SparkEntry.queries.size == allKeys.size)
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracles without queries: $orphans")
  }

  test("oracle SQL strings are DuckDB-parseable shape (non-empty, SELECT/WITH)") {
    SparkEntry.oracleSql.foreach { case (k, sql) =>
      val t = sql.trim.toUpperCase
      assert(t.startsWith("SELECT") || t.startsWith("WITH"), s"$k oracle looks wrong")
    }
  }
}
