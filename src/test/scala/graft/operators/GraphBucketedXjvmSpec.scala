package graft.operators

import java.io.File

import org.scalatest.funsuite.AnyFunSuite

/** The CROSS-JVM leg of the bucketed-table amortization story — the
  * round-14 caveat ("crossing JVMs needs a persistent metastore the
  * sandbox doesn't have") closed: the Spark distribution ships hive +
  * derby jars, so this spec forks TWO separate driver JVMs sharing a
  * Derby-backed Hive metastore. JVM 1 publishes the bucketed edge table
  * and exits; JVM 2 — a genuinely fresh process, no shared SparkContext,
  * no shared in-memory catalog — must resolve the table through the
  * metastore, plan src-keyed work exchange-free off the persisted
  * bucketing spec, and reproduce the pagerank fixpoint bit-for-bit
  * against a cold in-process edge build (`XjvmBucketed` carries the
  * per-JVM assertions; this spec owns the process choreography).
  * Embedded Derby admits one JVM at a time, which the sequential
  * write-then-read protocol respects — exactly the "second session,
  * table already published" deployment shape. */
class GraphBucketedXjvmSpec extends AnyFunSuite {

  private val addOpens = graft.TestJvm.addOpensArgs

  test("bucketed edge table crosses JVMs through a Derby-backed metastore: " +
    "second process reads the catalog, plans exchange-free, bit-matches") {
    val sfDir =
      s"${sys.env.getOrElse("GRAFT_TESTDATA", "/root/testdata")}/sf0.001"
    assume(new File(sfDir).isDirectory, s"no testdata at $sfDir")
    val javaBin = s"${System.getProperty("java.home")}/bin/java"
    val cp = System.getProperty("java.class.path")
    assume(cp.contains("test-classes"),
      "forked legs need the test classpath (run under sbt)")
    val tmp = java.nio.file.Files.createTempDirectory("graft-xjvm").toString
    val wh = s"$tmp/warehouse"
    val ms = s"$tmp/metastore_db"

    def leg(mode: String): (Int, String) = {
      import scala.sys.process._
      val out = new StringBuilder
      val cmd = Seq(javaBin) ++ addOpens ++ Seq(
        "-Xmx3g", s"-Dderby.stream.error.file=$tmp/derby-$mode.log",
        s"-Dderby.system.home=$tmp",
        "-cp", cp, "graft.operators.XjvmBucketed", mode, sfDir, wh, ms)
      val code = Process(cmd, new File(tmp))
        .!(ProcessLogger(l => out.synchronized { out.append(l).append('\n') }))
      (code, out.toString)
    }

    val (cw, ow) = leg("write")
    assert(cw == 0 && ow.contains("XJVM-WROTE"),
      s"write leg failed (exit $cw):\n${ow.takeRight(3000)}")
    val (cr, or) = leg("read")
    assert(cr == 0 && or.contains("XJVM-READ-OK"),
      s"read leg failed (exit $cr):\n${or.takeRight(3000)}")
  }
}
