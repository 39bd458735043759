package graft.functions

import graft.SparkSpec

/** The mojibake detector + double-UTF-8 repair: corrupts real UTF-8
  * through the latin-1 mis-decode that produces mojibake in the wild,
  * then proves the repair inverts it exactly, never touches clean
  * text, and is idempotent.
  */
class EncodingRepairSpec extends SparkSpec {
  import org.apache.spark.sql.functions._
  import spark.implicits._

  /** What a UTF-8 byte stream looks like after the wrong windows-1252
    * decode browsers/pipelines actually perform ("â€™" for ', "Ã©"
    * for é).
    */
  private def corrupt(s: String): String =
    new String(s.getBytes("UTF-8"), "windows-1252")

  test("repair inverts the cp1252 mis-decode; clean text and non-cp1252 text pass through") {
    val clean = Seq(
      "plain ascii stays as is",
      "naïve café — already CORRECT utf-8 accents",
      "русский текст outside latin-1")
    val broken = Seq(
      "naïve café résumé",
      "it’s a ‘quoted’ string…",
      "größer · ångström » déjà-vu — em-dashed")
    // NOT repairable by construction: ” is U+2019's sibling U+201D,
    // whose UTF-8 tail byte 0x9D is one of cp1252's five unmapped
    // positions — the corrupting decode already destroyed it (U+FFFD),
    // so the guard must pass the row through rather than half-fix it
    val unrecoverable = corrupt("a “quoted” string")
    val rows = (clean.map(s => (s, s)) ++ broken.map(s => (corrupt(s), s)) :+
      ((unrecoverable, unrecoverable)))
      .toDF("text", "expected")
    val out = rows
      .withColumn("n_moji", TextFunctions.mojibakeCount($"text"))
      .withColumn("fixed", TextFunctions.fixDoubleUtf8($"text"))
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(2), r.getString(3)))
    out.foreach { case (text, expected, nMoji, fixed) =>
      assert(fixed == expected, s"repair of <$text> gave <$fixed>, want <$expected>")
      if (text != expected) assert(nMoji > 0, s"detector must fire on <$text>")
    }
    // clean rows: detector quiet, text untouched
    out.filter(r => r._1 == r._2).foreach { case (text, _, nMoji, fixed) =>
      assert(fixed == text)
    }
  }

  test("repair is idempotent and guarded: re-running never re-corrupts") {
    val once = TextFunctions.fixDoubleUtf8(col("text"))
    val df = Seq(corrupt("l’élan différé"), "already clean").toDF("text")
      .withColumn("f1", once)
    val twice = df.withColumn("f2", TextFunctions.fixDoubleUtf8(col("f1"))).collect()
    twice.foreach { r =>
      assert(r.getString(2) == r.getString(1), "second pass must be a no-op")
    }
  }
}
