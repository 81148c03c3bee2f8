package graft.expressions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class Utf8StatsSpec extends SparkSpec {
  import spark.implicits._

  private def stats(bs: Array[Byte]*): Seq[(Int, Int, Int, Int, Int, Int, Int, Boolean)] =
    bs.toSeq.map(Tuple1(_)).toDF("b")
      .select(Utf8StatsFn(col("b")).as("s")).select("s.*")
      .as[(Int, Int, Int, Int, Int, Int, Int, Boolean)].collect().toSeq

  test("known answers: valid sequences of every length, rejected forms, error recovery") {
    assert(stats(
      "hello".getBytes("UTF-8"),                       // 5 ascii
      "é€💖".getBytes("UTF-8"),  // é + € + emoji
      Array(0xC0, 0xAF).map(_.toByte),        // overlong 2-byte: C0 never valid
      Array(0xED, 0xA0, 0x80).map(_.toByte),  // surrogate D800: bad lead + 2 strays
      Array(0xE0, 0x80, 0x80).map(_.toByte),  // overlong 3-byte via E0 80
      Array(0xF4, 0x90, 0x80, 0x80).map(_.toByte), // > U+10FFFF via F4 90
      Array(0xC3).map(_.toByte),              // truncated 2-byte at EOF
      Array(0x41, 0x80, 0x42).map(_.toByte),  // stray continuation between ascii
      Array.emptyByteArray,
    ) == Seq(
      (5, 5, 0, 0, 0, 0, 0, true),
      (9, 0, 1, 1, 1, 0, 0, true),
      (2, 0, 0, 0, 0, 1, 1, false),
      (3, 0, 0, 0, 0, 1, 2, false),
      (3, 0, 0, 0, 0, 1, 2, false),
      (4, 0, 0, 0, 0, 1, 3, false),
      (1, 0, 0, 0, 0, 1, 0, false),
      (3, 2, 0, 0, 0, 0, 1, false),
      (0, 0, 0, 0, 0, 0, 0, true)))
  }

  test("resynchronization: a valid sequence directly after a malformed lead is recognized") {
    // E0 A0 E0 A0 80: scanner fails at 0 (E0 A0 then lead E0 ≠
    // continuation), advances 1, hits stray A0, then parses the valid
    // 3-byte E0 A0 80 — self-synchronization in action
    assert(stats(Array(0xE0, 0xA0, 0xE0, 0xA0, 0x80).map(_.toByte)) ==
      Seq((5, 0, 0, 1, 0, 1, 1, false)))
  }

  test("fuzz: is_valid agrees with the JDK strict decoder; counts agree with a local-rule reference") {
    val rnd = new scala.util.Random(20260815L)
    val cases = Seq.tabulate(400) { t =>
      val n = rnd.nextInt(40)
      // bias toward interesting bytes: half the draws from the lead/cont
      // boundary region rather than uniform
      Array.fill(n)((if (rnd.nextBoolean()) rnd.nextInt(256)
        else 0x7e + rnd.nextInt(0x86)).toByte)
    } ++ Seq.tabulate(100) { t =>
      // valid text corrupted at one position
      val s = s"pâté € ${"😀" * (t % 3)} plain $t"
      val b = s.getBytes("UTF-8")
      if (b.nonEmpty) b(t % b.length) = (rnd.nextInt(256)).toByte
      b
    }
    val got = stats(cases: _*)
    cases.zip(got).foreach { case (bytes, g) =>
      // JDK cross-check: strict CharsetDecoder accepts iff zero errors
      val dec = java.nio.charset.StandardCharsets.UTF_8.newDecoder()
      val jdkValid =
        try { dec.decode(java.nio.ByteBuffer.wrap(bytes)); true }
        catch { case _: java.nio.charset.CharacterCodingException => false }
      assert(g._8 == jdkValid,
        s"is_valid=${g._8} but JDK says $jdkValid for ${bytes.map(b => f"$b%02x").mkString(" ")}")
      // local-rule reference: classify every position independently —
      // the formulation the DuckDB oracle uses
      val n = bytes.length
      def u(k: Int) = bytes(k) & 0xff
      def isCont(k: Int) = k < n && (u(k) & 0xc0) == 0x80
      def vlen(j: Int): Int = {
        val b = u(j)
        if (b < 0x80) 1
        else if (b >= 0xc2 && b <= 0xdf && isCont(j + 1)) 2
        else if (b == 0xe0 && j + 2 < n && u(j + 1) >= 0xa0 && u(j + 1) <= 0xbf && isCont(j + 2)) 3
        else if (b == 0xed && j + 2 < n && u(j + 1) >= 0x80 && u(j + 1) <= 0x9f && isCont(j + 2)) 3
        else if (b >= 0xe1 && b <= 0xef && b != 0xed && b != 0xe0 && isCont(j + 1) && isCont(j + 2)) 3
        else if (b == 0xf0 && j + 3 < n && u(j + 1) >= 0x90 && u(j + 1) <= 0xbf && isCont(j + 2) && isCont(j + 3)) 4
        else if (b >= 0xf1 && b <= 0xf3 && isCont(j + 1) && isCont(j + 2) && isCont(j + 3)) 4
        else if (b == 0xf4 && j + 3 < n && u(j + 1) >= 0x80 && u(j + 1) <= 0x8f && isCont(j + 2) && isCont(j + 3)) 4
        else 0
      }
      var ascii = 0; var s2 = 0; var s3 = 0; var s4 = 0; var bad = 0; var stray = 0
      for (j <- 0 until n) {
        if ((u(j) & 0xc0) == 0x80) {
          val covered = (j >= 1 && vlen(j - 1) >= 2) ||
            (j >= 2 && vlen(j - 2) >= 3) || (j >= 3 && vlen(j - 3) >= 4)
          if (!covered) stray += 1
        } else vlen(j) match {
          case 1 => ascii += 1
          case 2 => s2 += 1
          case 3 => s3 += 1
          case 4 => s4 += 1
          case 0 => bad += 1
        }
      }
      assert(g == ((n, ascii, s2, s3, s4, bad, stray, bad == 0 && stray == 0)),
        s"scanner vs local rule on ${bytes.map(b => f"$b%02x").mkString(" ")}")
    }
  }

  test("null propagates; SQL registration works") {
    val got = Seq((1L, "ok".getBytes("UTF-8")), (2L, null))
      .toDF("id", "b")
      .select(Utf8StatsFn(col("b"))).collect()
      .map(r => r.isNullAt(0)).toSeq
    assert(got == Seq(false, true))
    graft.GraftExtensions.register(spark)
    val sqlGot = spark.sql(
      "SELECT utf8_stats(CAST('hi' AS BINARY)).n_ascii").as[Int].head()
    assert(sqlGot == 2)
  }
}
