package graft

import graft.core.GraftSession
import org.apache.spark.sql.SparkSession

/** One shared local session for all suites (sbt test forks a single JVM). */
object TestSpark {
  lazy val spark: SparkSession = GraftSession.local(4, "graft-test")
  val Sf0001 = "/root/testdata/sf0.001"
}
