package graft

import org.scalatest.funsuite.AnyFunSuite

/** Registry-level invariants over SparkEntry — the contract the driver
  * consumes. These catch bookkeeping classes of bug that no per-query
  * spec can: a Scala `null` silently interpolated into an oracle (a
  * `val xSql` referencing a val initialized LATER in its object — it
  * rendered as the SQL literal `null` and the oracle returned garbage;
  * this fired twice in round 7, ml1 and ab3), an oracle entry without
  * a query, or duplicate registration.
  */
class RegistrySpec extends AnyFunSuite {

  test("no oracle SQL contains an interpolated Scala null") {
    // Scala null interpolates as lowercase "null"; legitimate SQL here
    // uses IS [NOT] NULL / THEN NULL spellings in caps. A bare
    // lowercase `null` token is the init-order bug.
    val offenders = SparkEntry.oracleSql.filter { case (_, sql) =>
      sql == null || "(?<![A-Za-z_])null(?![A-Za-z_])".r
        .findFirstIn(sql).isDefined
    }
    assert(offenders.isEmpty,
      s"oracles with interpolated null: ${offenders.keys.toSeq.sorted}")
  }

  test("every oracle entry has a registered query") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracles without queries: ${orphans.toSeq.sorted}")
  }

  test("oracle SQL is non-empty and mentions at least one table or CTE") {
    val bad = SparkEntry.oracleSql.filter { case (_, sql) =>
      sql.trim.isEmpty || !sql.toUpperCase.contains("SELECT")
    }
    assert(bad.isEmpty, s"degenerate oracles: ${bad.keys.toSeq.sorted}")
  }

  test("every baseline-tier row and its scale-path twins are registered") {
    // r12 verdict task 8: the scale story ("every brute-force row has a
    // bucketed/sampled twin") is enforced by the registry, not prose
    val q = SparkEntry.queries.keySet
    SparkEntry.baselineTiers.foreach { case (base, twins) =>
      assert(q.contains(base), s"baseline tier $base not a registered query")
      assert(twins.nonEmpty, s"baseline tier $base names no scale-path twin")
      val missing = twins.filterNot(q.contains)
      assert(missing.isEmpty, s"$base names unregistered twins: $missing")
      // a twin must be a DIFFERENT row: the tag is a pointer, not a self-loop
      assert(!twins.contains(base), s"$base lists itself as its twin")
    }
  }
}
