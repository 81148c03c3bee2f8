package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SentimentSpec extends SparkSpec {
  import spark.implicits._

  private def score(text: String): (Double, Double) = {
    val r = Seq(text).toDF("t")
      .select(Sentiment.polarity($"t").as("p"), Sentiment.subjectivity($"t").as("s"))
      .head()
    (r.getDouble(0), r.getDouble(1))
  }

  test("positive text scores positive, negative text negative") {
    assert(score("what a great excellent day")._1 > 0.5)
    assert(score("terrible awful horrible mess")._1 < -0.5)
  }

  test("neutral / unmatched text scores exactly 0.0 (TextBlob default)") {
    assert(score("the quick brown fox") == ((0.0, 0.0)))
    assert(score("") == ((0.0, 0.0)))
  }

  test("scores are bounded: polarity in [-1,1], subjectivity in [0,1]") {
    for ((w, (p, s)) <- Sentiment.lexicon) {
      assert(p >= -1 && p <= 1, s"polarity of $w")
      assert(s >= 0 && s <= 1, s"subjectivity of $w")
    }
    val (p, s) = score(Sentiment.lexicon.keys.mkString(" "))
    assert(p >= -1 && p <= 1 && s >= 0 && s <= 1)
  }

  test("matched-token mean: two words average their lexicon scores") {
    val (p, _) = score("good bad")
    val expected = (Sentiment.lexicon("good")._1 + Sentiment.lexicon("bad")._1) / 2
    assert(math.abs(p - expected) < 1e-12)
  }

  test("case-insensitive matching") {
    assert(score("GREAT")._1 == Sentiment.lexicon("great")._1)
  }

  test("native expression matches the declarative reference on varied inputs") {
    val texts = Seq("", "   ", "good", "good bad GREAT slow xyz",
      "the quick brown fox", "terrible\t\nawful  day", "a b c d e f good")
    val df = texts.toDF("t").select(
      Sentiment.sentiment($"t").as("native"),
      Sentiment.sentimentDeclarative($"t").as("decl"))
    val bad = df.filter($"native" =!= $"decl").count()
    assert(bad == 0)
  }
}
