package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Shared local session for specs (reused across suites via getOrCreate). */
trait SparkSpec extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = GraftSession.builder("local[4]", 4).getOrCreate()
  lazy val sf: String = "/root/testdata/sf0.001"

  override def afterAll(): Unit = {
    // session intentionally left running for sibling suites
  }
}
