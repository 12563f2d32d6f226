package graft.operators

import org.apache.spark.sql.functions._

/** Dev-only profiling main (deleted before commit). */
object ProfQ128 {
  def main(args: Array[String]): Unit = {
    val s = graft.GraftSession.local("32")
    s.sparkContext.setLogLevel("WARN")
    val d = "/root/testdata/sf0.1"
    def time(label: String)(f: => Any): Unit =
      (1 to 3).foreach { _ =>
        val t0 = System.nanoTime(); f
        println(f"PROF $label%-30s ${(System.nanoTime() - t0) / 1e9}%7.3f")
      }
    time("q186 count")(Relational.queries("q186_percentile_cont")(s, d).count())
    time("q128 count")(Relational.queries("q128_eqfreq_bins")(s, d).count())
    println("Q186 PLAN:")
    Relational.queries("q186_percentile_cont")(s, d).explain()
    s.stop()
  }
}
