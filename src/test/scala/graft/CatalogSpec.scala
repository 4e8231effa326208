package graft

import graft.catalog.Lake
import graft.operators.CatalogOps
import org.scalatest.funsuite.AnyFunSuite

class CatalogSpec extends AnyFunSuite {
  import TestSpark._
  private lazy val lake = Lake(spark, sfDir)

  test("info emits valid JSON covering every table with counts and schema") {
    val json = CatalogOps.infoJson(lake)
    // all tables present
    lake.tableNames.foreach { t =>
      assert(json.contains(s""""table":"$t""""), s"missing $t in $json")
    }
    // known facts at sf0.001
    assert(json.contains(""""table":"nation","n_rows":25"""))
    assert(json.contains(""""table":"region","n_rows":5"""))
    assert(json.contains(""""name":"l_shipdate","type":"timestamp_ntz""""))
    assert(json.contains(""""name":"embedding""""))
    // disk usage present and positive
    assert(json.contains(""""n_bytes":"""))
    // structurally parseable: balanced braces/brackets, no raw control chars
    assert(json.count(_ == '{') == json.count(_ == '}'))
    assert(json.count(_ == '[') == json.count(_ == ']'))
    assert(!json.exists(_ < ' '))
  }

  test("catalog search finds tables and columns by substring") {
    val hits = CatalogOps.searchCatalog(lake, "orderkey")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(hits.contains(("orders", "o_orderkey")))
    assert(hits.contains(("lineitem", "l_orderkey")))
    val tableHits = CatalogOps.searchCatalog(lake, "nation")
      .collect().map(r => (r.getString(0), r.getString(1)))
    assert(tableHits.contains(("nation", "(table)")))
    assert(tableHits.exists { case (t, c) => t == "customer" && c == "c_nationkey" })
  }
}
