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
    // structurally parseable: balanced braces/brackets, no raw control chars
    assert(json.count(_ == '{') == json.count(_ == '}'))
    assert(json.count(_ == '[') == json.count(_ == ']'))
    assert(!json.exists(_ < ' '))
  }
}
