package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession for specs. One JVM-wide session (specs
  * run forked in a single JVM); tiny shuffle fan-out for speed.
  */
object SparkSpec {
  // Routed through GraftSession.configure so specs exercise the same
  // engine configuration (AQE, optimizer exclusions, timezone) the
  // product mains run with; small master/shuffle fan-out for speed.
  lazy val spark: SparkSession = GraftSession.configure(
    SparkSession.builder().master("local[2]"), 4, "graft-spec")
    .getOrCreate()
}

trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSpec.spark
}
