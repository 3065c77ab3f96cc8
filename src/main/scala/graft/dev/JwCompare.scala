package graft.dev

import org.apache.spark.unsafe.types.UTF8String

object JwCompare {
  def main(args: Array[String]): Unit = {
    val lines = scala.io.Source.fromFile("/tmp/jw_pairs.csv").getLines()
    var n = 0; var bad = 0
    lines.foreach { l =>
      val parts = l.split(",")
      val (na, nb, jw) = (parts(2), parts(3), parts(4).toDouble)
      val mine = graft.plans.JaroWinklerKernel.similarityX1M(
        UTF8String.fromString(na), UTF8String.fromString(nb))
      val theirs = math.round(jw * 1000000)
      n += 1
      if (mine != theirs) {
        bad += 1
        if (bad <= 10) println(s"DIFF '$na' vs '$nb': mine=$mine duck=$theirs (${jw})")
      }
    }
    println(s"total=$n diff=$bad")
  }
}
