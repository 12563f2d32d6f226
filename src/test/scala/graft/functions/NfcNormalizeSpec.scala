package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class NfcNormalizeSpec extends SparkSpec {
  import spark.implicits._

  private def nfc(c: org.apache.spark.sql.Column) = {
    GraftFunctions.register(spark)
    call_function("graft_nfc", c)
  }

  test("combining marks fold to precomposed forms") {
    val rows = Seq(
      "café",                    // e + COMBINING ACUTE -> é
      "niño",                    // n + COMBINING TILDE -> ñ
      "Ångström")          // ring -> Å, diaeresis -> ö
      .toDF("s")
      .select(nfc(col("s")).as("n"), length(col("s")).as("lr"),
        length(nfc(col("s"))).as("ln"))
      .collect()
    assert(rows(0).getString(0) == "café")
    assert(rows(1).getString(0) == "niño")
    assert(rows(2).getString(0) == "Ångström")
    // each fold removes exactly one codepoint
    assert(rows.map(r => r.getInt(1) - r.getInt(2)).toSeq == Seq(1, 1, 2))
  }

  test("ASCII and already-NFC strings pass through unchanged") {
    val rows = Seq("plain ascii text", "café déjà")
      .toDF("s").select(col("s"), nfc(col("s")).as("n")).collect()
    rows.foreach(r => assert(r.getString(0) == r.getString(1)))
  }

  test("null in, null out") {
    val r = Seq[Option[String]](None).toDF("s").select(nfc(col("s"))).collect()
    assert(r(0).isNullAt(0))
  }

  test("codegen and interpreted paths agree") {
    val data = Seq("café niño", "ascii", "", "é́")
    val df = data.toDF("s").select(nfc(col("s")).as("n"))
    val wholestage = df.collect().map(_.getString(0)).toSeq
    val saved = spark.conf.get("spark.sql.codegen.wholeStage", "true")
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    try {
      val interpreted = df.collect().map(_.getString(0)).toSeq
      assert(wholestage == interpreted)
    } finally spark.conf.set("spark.sql.codegen.wholeStage", saved)
    // reference semantics
    assert(wholestage == data.map(
      java.text.Normalizer.normalize(_, java.text.Normalizer.Form.NFC)))
  }
}
