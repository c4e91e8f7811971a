package graft

import org.scalatest.funsuite.AnyFunSuite

/** Structural guards on the SparkEntry query/oracle maps. A Scala Map
  * LITERAL keeps the last duplicate key, so a name collision silently
  * shadows a query and its oracle (found in r11: a new
  * `log_group_rebalance` dead-coded behind a round-4 entry of the same
  * name and "passed" verification that was actually exercising the old
  * pair). These checks read the SOURCE, where the duplicate is visible. */
class EntryAuditSpec extends AnyFunSuite {

  private lazy val source: String = {
    val p = java.nio.file.Paths.get("src/main/scala/graft/SparkEntry.scala")
    new String(java.nio.file.Files.readAllBytes(p), "UTF-8")
  }

  test("no duplicate keys in the queries map literal (last-wins shadowing)") {
    val keys = """"([a-z0-9_]+)" -> \(\(s, dir\)""".r
      .findAllMatchIn(source).map(_.group(1)).toSeq
    val dupes = keys.groupBy(identity).collect { case (k, v) if v.size > 1 => k }
    assert(dupes.isEmpty, s"duplicate query keys shadow earlier entries: $dupes")
    // the literal count must equal the runtime map size — a dupe that the
    // regex misses would still surface as a count mismatch
    assert(keys.size == SparkEntry.queries.size,
      s"source has ${keys.size} query entries, runtime map ${SparkEntry.queries.size}")
  }

  test("queries and oracles are exactly 1:1") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert((q -- o).isEmpty, s"queries without oracle: ${(q -- o).toSeq.sorted}")
    assert((o -- q).isEmpty, s"oracles without query: ${(o -- q).toSeq.sorted}")
  }
}
