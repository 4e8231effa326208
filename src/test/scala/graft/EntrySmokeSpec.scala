package graft
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
class EntrySmokeSpec extends AnyFunSuite {
  test("entry works on a plain unconfigured session") {
    // driver-t1-like: a session without graft confs
    val spark = TestSpark.spark.newSession()
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
