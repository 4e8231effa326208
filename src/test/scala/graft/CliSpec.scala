package graft

import org.scalatest.funsuite.AnyFunSuite

class CliSpec extends AnyFunSuite {

  test("SQL gate accepts single SELECT/WITH statements") {
    assert(Cli.validateReadOnly("SELECT 1").isRight)
    assert(Cli.validateReadOnly("  select * from trade.orders  ").isRight)
    assert(Cli.validateReadOnly("WITH x AS (SELECT 1) SELECT * FROM x").isRight)
    assert(Cli.validateReadOnly("SELECT 1;").isRight) // one trailing ; ok
    assert(Cli.validateReadOnly("(SELECT 1)").isRight)
    assert(
      Cli.validateReadOnly("-- a comment\n/* more */ SELECT 1").isRight,
      "leading comments must not defeat keyword detection"
    )
  }

  test("SQL gate rejects DDL, DML, session mutation, and multi-statement input") {
    assert(Cli.validateReadOnly("DROP TABLE orders").isLeft)
    assert(Cli.validateReadOnly("INSERT INTO orders VALUES (1)").isLeft)
    assert(Cli.validateReadOnly("CREATE VIEW v AS SELECT 1").isLeft)
    assert(Cli.validateReadOnly("UPDATE orders SET o_totalprice = 0").isLeft)
    assert(Cli.validateReadOnly("DELETE FROM orders").isLeft)
    assert(Cli.validateReadOnly("SET spark.sql.shuffle.partitions=1").isLeft)
    assert(Cli.validateReadOnly("SELECT 1; DROP TABLE orders").isLeft)
    assert(Cli.validateReadOnly("SELECT 1;;").isLeft)
    assert(Cli.validateReadOnly("").isLeft)
    assert(Cli.validateReadOnly("-- only a comment").isLeft)
    assert(
      Cli.validateReadOnly("/* hidden */ DROP TABLE orders").isLeft,
      "comment prefixes must not smuggle DDL through"
    )
  }
}
