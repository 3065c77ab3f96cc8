package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-up data generator for the scaling study (SCALE.md): replicates an
  * sfDir `factor`× with shifted keys so per-key structure stays realistic —
  * each copy is a disjoint population, not a duplicate:
  *
  *  - fact keys (orderkey/custkey/event ids/user ids/doc ids) shift by
  *    i·10⁹ per copy, so group sizes, join fan-outs and window lengths stay
  *    constant while row counts grow linearly (how a real 10× corpus grows);
  *  - document tokens get a per-copy prefix, so shingle/dedup structure
  *    replicates per copy instead of exploding cross-copy (10 verbatim
  *    copies of each doc would square the near-dup pair count — the
  *    UNrealistic scaling);
  *  - dimensions (region, nation) stay fixed, like the real world.
  *
  * Usage: runMain graft.ScaleBench <srcSfDir> <outDir> <factor>
  * Then:  SPARK_GRAFT_SF_DIR=<outDir> runMain graft.Bench
  */
object ScaleBench {

  private val Span = 1000000000L

  def scaleTable(df: DataFrame, name: String, factor: Int): DataFrame = {
    val keyCols: Seq[String] = name match {
      case "orders" => Seq("o_orderkey", "o_custkey")
      case "lineitem" => Seq("l_orderkey")
      case "customer" => Seq("c_custkey")
      case "supplier" => Seq("s_suppkey")
      case "part" => Seq("p_partkey")
      case "events" => Seq("event_id", "user_id")
      case "documents" => Seq("doc_id")
      case "embeddings" => Seq("vec_id")
      case _ => Seq.empty // region/nation: fixed dims
    }
    if (keyCols.isEmpty) df
    else (0 until factor).map { i =>
      val shifted = keyCols.foldLeft(df)((d, c) => d.withColumn(c, col(c) + i * Span))
      name match {
        case "documents" =>
          // per-copy token prefix so shingle/dedup structure replicates per
          // copy instead of exploding cross-copy; n_chars must track the
          // rewritten text (the source invariant is n_chars == length(text))
          shifted
            .withColumn("text", array_join(
              transform(split(col("text"), " "), t => concat(lit(s"c$i"), t)), " "))
            .withColumn("n_chars", length(col("text")).cast("long"))
        case "embeddings" =>
          // circular-shift each copy's vectors by i dims: norms and value
          // distribution are preserved but copies land in different LSH
          // buckets with uncorrelated dots — verbatim copies would plant
          // factor-1 exact duplicates per vector and square the per-bucket
          // near-dup work, exactly the unrealistic scaling documents avoid
          if (i == 0) shifted
          else shifted.withColumn("embedding", concat(
            slice(col("embedding"), lit(i + 1), size(col("embedding")) - i),
            slice(col("embedding"), lit(1), lit(i))))
        case _ => shifted
      }
    }.reduce(_ unionByName _)
  }

  def main(args: Array[String]): Unit = {
    val Array(src, out, factorS) = args
    val factor = factorS.toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = Sessions.builder(s"local[$cpus]", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Tables.names.foreach { t =>
      scaleTable(spark.read.parquet(s"$src/$t.parquet"), t, factor)
        .write.mode("overwrite").parquet(s"$out/$t.parquet")
      System.err.println(s"[scale] $t done")
    }
    spark.stop()
  }
}
