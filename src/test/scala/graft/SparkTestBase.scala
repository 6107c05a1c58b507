package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for specs (one JVM-wide session via getOrCreate). */
trait SparkTestBase extends AnyFunSuite {
  lazy val spark: SparkSession = Engine.session("graft-test", "local[4]", 4)
  lazy val sf: String = "/root/testdata/sf0.001"
}
