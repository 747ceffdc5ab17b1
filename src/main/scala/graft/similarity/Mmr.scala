package graft.similarity

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Maximal-marginal-relevance re-ranking — the diversity-aware
  * selection step after an ANN/retrieval pass: greedily pick k items
  * maximizing λ·relevance − (1−λ)·(max similarity to anything
  * already picked), so near-duplicate top hits don't crowd out
  * coverage (few-shot example selection, dedup-aware retrieval,
  * diverse eval-set assembly).
  *
  * Contract and determinism: the INPUT is a bounded candidate set —
  * the top-C of a distributed retrieval pass (q48/q49/q158
  * machinery), C in the tens to hundreds — with integer e6
  * relevance and pairwise-similarity scores. MMR itself is
  * inherently sequential (each pick changes every remaining score),
  * so the kernel runs on the collected candidate tables under the
  * same bounded-artifact contract as the RRF fusion and BPE merge
  * lists; all arithmetic is integer (score10 = lamTen·rel −
  * (10−lamTen)·maxsim, ties to the smaller id), so the greedy
  * trajectory replays exactly as an unrolled SQL pick chain.
  *
  * Scale shape: the corpus-sized work (scoring, top-C cut, C²
  * pairwise sims) happens in the engine BEFORE this kernel; what
  * collects is ≤ C + C² small rows, independent of corpus size.
  */
object Mmr {

  /** @param candidates bounded (id, rel_e6) rows
    * @param sims       pairwise (id_a, id_b, sim_e6) over the same
    *                   ids, both directions (missing pairs read 0)
    * @param lamTen     λ in tenths (7 = 0.7 relevance weight)
    * @return (rank, id, rel_e6, maxsim_e6, score10_e6), rank 1..k —
    *         maxsim/score are AT PICK TIME (the greedy trajectory)
    */
  def rerank(candidates: DataFrame, sims: DataFrame,
      k: Int, lamTen: Int): DataFrame = {
    val spark = candidates.sparkSession
    import spark.implicits._
    val cand = candidates.select(col("id").cast("long"),
        col("rel_e6").cast("long"))
      .as[(Long, Long)].collect().sortBy(_._1)
    val sim = sims.select(col("id_a").cast("long"),
        col("id_b").cast("long"), col("sim_e6").cast("long"))
      .as[(Long, Long, Long)].collect()
      .map { case (a, b, s) => (a, b) -> s }.toMap
    val picked = scala.collection.mutable.ArrayBuffer.empty[
      (Long, Long, Long, Long, Long)]
    val remaining = scala.collection.mutable.LinkedHashMap(
      cand.toSeq.map { case (id, r) => id -> r }: _*)
    var rank = 1L
    while (rank <= k && remaining.nonEmpty) {
      val best = remaining.iterator.map { case (id, rel) =>
        val maxSim =
          if (picked.isEmpty) 0L
          else picked.iterator.map(p => sim.getOrElse((id, p._2), 0L)).max
        val score = lamTen * rel - (10L - lamTen) * maxSim
        (score, -id, rel, maxSim)
      }.max // highest score, then smallest id (negated)
      val (score, negId, rel, maxSim) = best
      picked += ((rank, -negId, rel, maxSim, score))
      remaining.remove(-negId)
      rank += 1
    }
    picked.toSeq
      .toDF("rank", "id", "rel_e6", "maxsim_e6", "score10_e6")
  }
}
