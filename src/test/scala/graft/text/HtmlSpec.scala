package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSpec

class HtmlSpec extends SparkSpec {
  import spark.implicits._

  private def clean(html: String): String =
    Seq(html).toDF("h").select(Html.htmlToText(col("h")).as("t"))
      .as[String].head()

  test("htmlToText strips tags, scripts, entities, whitespace") {
    assert(clean("<p>hello <b>world</b></p>") == "hello world")
    assert(clean("<script>var x = 1 < 2;</script>text") == "text")
    assert(clean("<style>p { color: red }</style>body") == "body")
    assert(clean("a &amp; b &lt;c&gt; &quot;d&quot;") == "a & b <c> \"d\"")
    assert(clean("  lots \n\t of   space  ") == "lots of space")
  }

  test("tagEntities wraps word-boundary matches, longest keyword first") {
    val out = Seq("a hash join beats a hash lookup").toDF("t")
      .select(Html.tagEntities(col("t"), Seq("hash", "hash join")).as("x"))
      .as[String].head()
    assert(out ==
      s"a ${Html.entityOpen}hash join${Html.entityClose} beats a " +
        s"${Html.entityOpen}hash${Html.entityClose} lookup")
  }

  test("tagEntities respects word boundaries") {
    val out = Seq("rehash hashing hash").toDF("t")
      .select(Html.tagEntities(col("t"), Seq("hash")).as("x"))
      .as[String].head()
    assert(out == s"rehash hashing ${Html.entityOpen}hash${Html.entityClose}")
  }

  test("entityCount counts inserted markers") {
    val df = Seq("merge then merge again").toDF("t")
      .select(Html.entityCount(
        Html.tagEntities(col("t"), Seq("merge"))).as("n"))
    assert(df.as[Int].head() == 2)
  }
}
