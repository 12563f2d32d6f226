package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession for all specs (one JVM-wide session keeps the
  * suite fast; forked test JVM gets the add-opens flags from build.sbt). */
trait SparkSpec extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = SparkSpec.session

  /** Testdata root, overridable so the suite is not married to one
    * machine's layout (`GRAFT_TESTDATA` env, falling back to the driver's
    * documented location — TESTDATA.md). */
  val sfRoot: String = sys.env.getOrElse("GRAFT_TESTDATA", "/root/testdata")
  val sfDir = s"$sfRoot/sf0.001"
  /** The bigger gate-scale dir for specs that measure volume, not just
    * correctness. */
  def sfDirAt(sf: String): String = s"$sfRoot/sf$sf"
}

object SparkSpec {
  lazy val session: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    graft.functions.GraftFunctions.register(s)
    s
  }
}
