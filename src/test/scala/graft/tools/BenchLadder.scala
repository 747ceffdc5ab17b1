package graft.tools

import scala.util.Random

/** Prints the bench-line ladder table: rendered line length per
  * (key count, rung) under the BenchLineSpec synthetic timing mix.
  * `Test/runMain graft.tools.BenchLadder` — feeds the PERF.md table.
  */
object BenchLadder {
  def main(args: Array[String]): Unit = {
    def synth(n: Int): Map[String, Double] = {
      val rnd = new Random(n)
      (1 to n).map { i =>
        val v = rnd.nextInt(10) match {
          case 0 => 1.0 + rnd.nextDouble() * 6.0
          case 1 | 2 => 0.5 + rnd.nextDouble()
          case _ => rnd.nextDouble() * 0.4
        }
        f"q${i}%d_synthetic_name" -> v
      }.toMap
    }
    val sent = Seq.fill(10)(0.1)
    println(f"${"keys"}%5s ${"emitted"}%8s  rung")
    for (n <- Seq(150, 176, 200, 237, 260, 300, 350)) {
      val line = graft.Bench.renderLine(synth(n), sent, "/x/sf0.1")
      val rung =
        if (line.contains("\"minq\"")) {
          val m = "\"minq\":([0-9.]+)".r.findFirstMatchIn(line).get.group(1)
          s"cs minq=$m"
        } else if (line.contains("\"q_unit\":\"cs\"")) "cs full"
        else if (line.contains("sans q")) "1-dec sans q"
        else if (!line.contains("\"queries\"")) "TOTAL-ONLY"
        else "full"
      println(f"$n%5d ${line.length}%8d  $rung")
    }
  }
}
