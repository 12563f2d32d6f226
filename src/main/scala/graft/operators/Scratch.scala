package graft.operators

import org.apache.spark.sql.functions._
import graft.{GraftSession}

/** Throwaway dev harness (not part of the library surface). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.GraftFunctions.register(spark)
    val dirs = Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01",
      "/root/testdata/sf0.1", "data/sf1", "data/sf10")
      .filter(d => new java.io.File(d).isDirectory)
    dirs.foreach { d =>
      val pts = Similarity.embs(spark, d).select(
          floor(TextFns.dot(col("v"),
            array(Similarity.jlPlanes(0).toIndexedSeq.map(lit): _*)) * 16)
            .cast("long").as("qx"),
          floor(TextFns.dot(col("v"),
            array(Similarity.jlPlanes(1).toIndexedSeq.map(lit): _*)) * 16)
            .cast("long").as("qy"))
      val fine = pts.select(
          expr(s"(qx + ${Similarity.DbscanShift}) div 15").as("fx"),
          expr(s"(qy + ${Similarity.DbscanShift}) div 15").as("fy"))
        .groupBy("fx", "fy").agg(count(lit(1)).as("c"))
        .localCheckpoint(true)
      val n = fine.agg(sum(col("c"))).collect()(0).getLong(0)
      Seq(1L, 2L, 4L, 8L, 16L).foreach { k =>
        val coarse = fine.groupBy(expr(s"fx div $k").as("cx"),
            expr(s"fy div $k").as("cy"))
          .agg(sum(col("c")).as("nc")).localCheckpoint(true)
        val sq: Long = coarse.agg(sum(col("nc") * col("nc"))).collect()(0)
          .getLong(0)
        // exact candidate volume of the half-neighborhood probe join:
        // center-cell pairs + 4 canonical adjacent-cell products
        val adj = Seq((1, 0), (-1, 1), (0, 1), (1, 1)).map { case (dx, dy) =>
            coarse.as("a").join(coarse.as("b"),
              col("a.cx") + dx === col("b.cx") && col("a.cy") + dy === col("b.cy"))
              .select((col("a.nc") * col("b.nc")).as("p"))
          }.reduce(_ unionAll _).agg(sum(col("p"))).collect()(0)
        val center = coarse.agg(sum(col("nc") * (col("nc") - 1) / 2))
          .collect()(0)
        println(s"SCRATCH $d n=$n eps=${15 * k} sq=$sq sq_per_n=${sq.toDouble / n} " +
          s"center=${center.get(0)} adj=${adj.get(0)}")
        coarse.unpersist()
      }
      fine.unpersist()
    }
    spark.stop()
  }
}
