package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.SparkSpec
import graft.etl.Corpus

/** The corpus-curation gate on a stream: `Corpus.curationDecisions` is a
  * pure projection, so the SAME call runs per-document on a readStream
  * with no aggregation state — this spec pins batch/stream parity. */
case class CurationDoc(doc_id: Long, text: String, source: String)

class CorpusStreamingSpec extends SparkSpec {
  test("curationDecisions: streaming append output equals the batch run") {
    val sq = spark
    import sq.implicits._
    implicit val sqlCtx = spark.sqlContext
    val docs = Seq(
      CurationDoc(1L, "the cat sat on a mat and the dog ran to a tree in " +
        "the park is nice while we walk over green hills today", "web"), // keep: 25 tokens, all bigrams unique
      CurationDoc(2L, "tiny doc", "web"),                            // too_short
      CurationDoc(3L, (Seq.fill(30)("spam spam").mkString(" ")), "crawl"), // repetitive
      CurationDoc(4L, Seq.fill(25)("zz").zipWithIndex
        .map { case (w, i) => s"$w$i" }.mkString(" "), "crawl"))   // no_stopwords
    val input = MemoryStream[CurationDoc]
    input.addData(docs: _*)

    val q = Corpus.curationDecisions(input.toDF(), "doc_id", "text", "source")
      .writeStream.format("memory").queryName("curation")
      .outputMode("append").start()
    q.processAllAvailable()
    q.stop()

    def key(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("source"),
        r.getAs[String]("lang_pred"), r.getAs[String]("decision"))).toSet
    val streamed = key(spark.table("curation"))
    val batch = key(Corpus.curationDecisions(docs.toDF(), "doc_id", "text", "source"))
    assert(streamed == batch)
    assert(streamed.map(t => t._1 -> t._4) == Set(
      1L -> "keep", 2L -> "too_short", 3L -> "repetitive",
      4L -> "no_stopwords"))
  }
}
