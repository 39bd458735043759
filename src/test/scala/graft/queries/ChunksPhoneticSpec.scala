package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** text_chunks / er_soundex / ts_pacf certified against independent
  * plain-Scala references (the DuckDB oracle runs in the driver gate).
  */
class ChunksPhoneticSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("text_chunks equals a plain-Scala greedy word packer, byte-exact") {
    val docs = graft.Tables(spark, dir, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    def pack(text: String): Seq[String] = {
      val out = scala.collection.mutable.Buffer.empty[String]
      var cur = ""
      text.split(" ", -1).foreach { w =>
        if (cur.nonEmpty && cur.length + 1 + w.length > 120) { out += cur; cur = w }
        else cur = if (cur.isEmpty) w else cur + " " + w
      }
      out += cur
      out.toSeq
    }
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString
    val got = TextOps.textChunks(spark, dir).collect()
    val want = docs.view.mapValues(pack).toMap
    assert(got.length == want.values.map(_.size).sum)
    got.foreach { r =>
      val c = want(r.getLong(0))(r.getLong(1).toInt)
      assert(r.getLong(2) == c.split(" ", -1).length, "n_words")
      assert(r.getLong(3) == c.length, "n_chars")
      assert(r.getString(4) == md5hex(c), "chunk_md5")
    }
    // budget respected and chunks non-trivial
    assert(got.forall(_.getLong(3) <= 120) && got.exists(_.getLong(1) >= 1))
  }

  private def soundex(w: String): String = {
    val m = "abcdefghijklmnopqrstuvwxyz".zip("01230120022455012623010202").toMap
    val cs = w.toLowerCase.map(c => m.getOrElse(c, '0'))
    var res = ""; var prev = cs.head
    cs.tail.foreach { c => if (c != prev && c != '0') res += c; prev = c }
    w.toLowerCase.head + res.padTo(3, '0').take(3).mkString
  }

  test("er_soundex classic codes hold under the simplified variant") {
    // shared with standard Soundex (no h/w bridging involved)
    assert(soundex("robert") == "r163")
    assert(soundex("rupert") == "r163")
    assert(soundex("red") == "r300" && soundex("rod") == "r300")
    assert(soundex("tymczak") == "t522") // vowel-separated duplicates kept
  }

  test("er_soundex blocks equal a plain-Scala replay and surface the red/rod collision") {
    val words = graft.Tables(spark, dir, "part")
      .select(explode(split(col("p_name"), " ")).as("w"))
      .collect().map(_.getString(0).toLowerCase)
    val want = words.groupBy(soundex).view
      .mapValues(ws => (ws.length.toLong, ws.distinct.length.toLong)).toMap
    val got = TextOps.erSoundex(spark, dir).collect()
    assert(got.length == want.size)
    got.foreach { r =>
      assert((r.getLong(1), r.getLong(2)) == want(r.getString(0)), r.getString(0))
    }
    val r300 = got.find(_.getString(0) == "r300")
    assert(r300.exists(_.getLong(2) == 2L), "red/rod must share the r300 block")
  }

  test("ts_pacf equals the plain-Scala Durbin-Levinson closed forms") {
    val byUser = graft.Tables(spark, dir, "events")
      .filter(col("value").isNotNull)
      .select(col("user_id"), col("event_id"), col("value"),
        unix_millis(col("ts")).as("ts_ms"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
      .groupBy(_._1).view
      .mapValues(_.sortBy(e => (e._4, e._2)).map(_._3)).toMap
      .filter(_._2.length >= 12)
    val got = Inference.tsPacf(spark, dir).collect()
    assert(got.length == byUser.size && got.nonEmpty)
    got.foreach { r =>
      val vs = byUser(r.getLong(0))
      val n = vs.length
      val m = vs.sum / n
      val den = vs.map(v => (v - m) * (v - m)).sum
      def rho(k: Int) =
        (0 until n - k).map(i => (vs(i) - m) * (vs(i + k) - m)).sum / den
      val (r1, r2, r3) = (rho(1), rho(2), rho(3))
      val p22 = (r2 - r1 * r1) / (1.0 - r1 * r1)
      val p21 = r1 * (1.0 - p22)
      val p33 = (r3 - p21 * r2 - p22 * r1) / (1.0 - p21 * r1 - p22 * r2)
      def close(a: Double, b: Double) =
        math.abs(a - b) < 1e-9 * math.max(1.0, math.abs(b))
      assert(close(r.getDouble(2), r1), "pacf1")
      assert(close(r.getDouble(3), p22), "pacf2")
      assert(close(r.getDouble(4), p33), "pacf3")
    }
  }
}
