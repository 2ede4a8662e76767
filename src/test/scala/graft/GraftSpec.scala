package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session fixture for all specs (sf0.001 inputs). */
trait GraftSpec extends AnyFunSuite with BeforeAndAfterAll {
  val Dir = "/root/testdata/sf0.001"
  lazy val spark: SparkSession = GraftSession.builder("4").getOrCreate()

  override def afterAll(): Unit = {
    // keep the session for other suites (same JVM) — do not stop
    super.afterAll()
  }
}
