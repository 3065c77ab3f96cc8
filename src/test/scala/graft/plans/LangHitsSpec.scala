package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[LangHits]] vs the five-HOF spelling it replaces — identical counts
  * per profile on mixed-language, empty, and multi-space inputs. */
class LangHitsSpec extends SparkSpec {
  import spark.implicits._

  test("matches the per-language HOF counts, profile order preserved") {
    val rows = Seq(
      "the cat and the dog is here",
      "der Hund und die Katze ist da",
      "le chat et la maison est que",
      "de het een en van niet is",
      "  doubled  spaces   the THE The  ",
      "")
    val df = rows.toDF("text")
    val toks = transform(
      filter(split($"text", " "), t => t =!= ""), t => lower(t))
    def hof(words: Set[String]) =
      size(filter(toks, t => t.isInCollection(words.toSeq)))
    val cols = graft.functions.Text.langProfiles.zipWithIndex.flatMap {
      case ((lang, set), i) => Seq(
        element_at(call_function("lang_hits", $"text"), i + 1)
          .as(s"fast_$lang"),
        hof(set).as(s"slow_$lang"))
    }
    df.select(cols: _*).collect().foreach { r =>
      graft.functions.Text.langProfiles.foreach { case (lang, _) =>
        assert(r.getAs[Int](s"fast_$lang") == r.getAs[Int](s"slow_$lang"),
          s"$lang in $r")
      }
    }
  }
}
