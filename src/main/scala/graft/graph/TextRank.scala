package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.ops.Relational
import graft.text.TextFunctions

/** TextRank keyword scoring (SURVEY.md M5; reference
  * TextRank.scala:20-125 builds a GraphX graph and calls
  * `pageRank(0.0001)`).
  *
  * Here the co-occurrence graph is a DataFrame of edges and PageRank
  * is a fixed-iteration power loop of join+aggregate — the same
  * shuffle pattern GraphX's Pregel produces, but visible to Catalyst
  * (AQE sizes each iteration's shuffle) and exactly reproducible by
  * any engine, which makes the scores oracle-verifiable. Fixed
  * iteration count (not a convergence tolerance) keeps the result
  * deterministic across cluster sizes.
  *
  * Scale notes: edges/out-degrees are computed once and persisted;
  * each iteration shuffles only (word, score) pairs — the graph
  * stays partitioned by source word. For web-scale graphs swap in
  * GraphX's pageRank; for vocabulary graphs (≤ millions of nodes)
  * this loop is simpler and plans better.
  */
object TextRank {

  /** Undirected co-occurrence edges from consecutive tokens
    * (window=2, the reference's window): both directions, distinct,
    * self-loops dropped.
    */
  def coocEdges(docs: DataFrame, tokensCol: String): DataFrame = {
    val bg = docs
      .select(explode(TextFunctions.ngramsFast(col(tokensCol), 2)).as("bg"))
      .select(split(col("bg"), " ").getItem(0).as("a"),
        split(col("bg"), " ").getItem(1).as("b"))
      .filter(col("a") =!= col("b"))
    bg.select(col("a"), col("b"))
      .unionByName(bg.select(col("b").as("a"), col("a").as("b")))
      .distinct()
  }

  /** Fixed-iteration PageRank over an edge list. Returns
    * (word, score) with scores rounded to `roundTo`.
    */
  def pagerank(edges: DataFrame, iterations: Int = 10,
      damping: Double = 0.85, roundTo: Int = 4,
      checkpointEvery: Int = 1): DataFrame = {
    val e = edges.persist(StorageLevel.MEMORY_AND_DISK)
    val outdeg = e.groupBy(col("a")).agg(count(lit(1)).as("deg"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val n = outdeg.count()
    // Source degree folded into the edge list once, outside the loop —
    // the reference (and our first cut) re-joined degrees every
    // iteration, tripling the per-round shuffle count.
    val ej = e.join(outdeg, "a")
      .select(col("a"), col("b"), col("deg"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    var scores = outdeg.select(col("a").as("word"),
      lit(1.0 / n).as("score"))
    for (i <- 1 to iterations) {
      scores = ej
        // Scores are |vocab|-sized — orders of magnitude smaller than
        // the edge list — so they broadcast and the cached edges never
        // re-shuffle; the only exchange per round is the groupBy(b).
        .join(broadcast(scores), ej("a") === scores("word"))
        .select(col("b"), (col("score") / col("deg")).as("contrib"))
        .groupBy(col("b"))
        .agg(sum(col("contrib")).as("mass"))
        .select(col("b").as("word"),
          (lit((1.0 - damping) / n) + lit(damping) * col("mass")).as("score"))
      // Eager per-iteration materialization truncates the lineage:
      // without it the final plan is an `iterations`-deep join tree
      // that Catalyst re-analyzes in full each round (quadratic
      // planning). Same per-superstep persist GraphX does; on a real
      // cluster swap for checkpoint() to a reliable store.
      // checkpointEvery > 1 was MEASURED SLOWER (9.3 s vs 7.3 s for
      // the sf0.1 corpus): between checkpoints `broadcast(scores)`
      // re-executes the unmaterialized previous iterations, so the
      // saved job-scheduling overhead is repaid with redundant
      // compute. Kept as a knob for graphs where a broadcast is
      // replaced by a shuffle join and the trade flips.
      if (i % checkpointEvery == 0 || i == iterations)
        scores = scores.localCheckpoint()
    }
    // The eager localCheckpoint above cut `scores`' lineage, so the
    // graph-side caches can be released now — a long-lived session
    // running many pagerank calls would otherwise accumulate them
    // until the ContextCleaner got around to it.
    ej.unpersist(blocking = false)
    outdeg.unpersist(blocking = false)
    e.unpersist(blocking = false)
    // Persist the converged scores: downstream consumers (phrase
    // scoring joins both sides against them, broadcasts recompute
    // their subplan) would otherwise re-run all `iterations` rounds
    // per reference. Same pattern as GraphX's per-superstep persist.
    scores.select(col("word"), round(col("score"), roundTo).as("score"))
      .persist(StorageLevel.MEMORY_AND_DISK)
  }

  /** Corpus-level word scores for a tokenized document table. */
  def wordScores(docs: DataFrame, tokensCol: String,
      iterations: Int = 10): DataFrame =
    pagerank(coocEdges(docs, tokensCol), iterations)

  /** GraphX variant of the word scoring (the reference's engine —
    * TextRank.scala:40-45 builds a GraphX `Graph` and calls
    * pageRank). Kept alongside the DataFrame loop: GraphX's Pregel
    * machinery wins on web-scale graphs with many iterations;
    * the DataFrame loop is oracle-replayable and AQE-planned.
    * `staticPageRank` scores are per-node mass summing to ~N, so
    * they are rescaled by 1/N to match the DataFrame loop's
    * distribution semantics (identical ranking either way).
    */
  def wordScoresGraphX(docs: DataFrame, tokensCol: String,
      iterations: Int = 10, roundTo: Int = 4): DataFrame = {
    import org.apache.spark.graphx.{Edge, Graph}
    val spark = docs.sparkSession
    import spark.implicits._
    val edgesDf = coocEdges(docs, tokensCol)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val vocab = edgesDf.select(col("a").as("word")).distinct()
      .rdd.map(_.getString(0)).zipWithIndex().collectAsMap()
    val idOf = spark.sparkContext.broadcast(vocab)
    val n = vocab.size
    val edgeRdd = edgesDf.rdd.map { r =>
      Edge(idOf.value(r.getString(0)), idOf.value(r.getString(1)), 1.0)
    }
    val graph = Graph.fromEdges[Double, Double](edgeRdd, 1.0)
    val ranks = graph.staticPageRank(iterations, resetProb = 0.15).vertices
    val back = idOf.value.map(_.swap)
    val backB = spark.sparkContext.broadcast(back)
    ranks.map { case (vid, score) =>
      (backB.value(vid), math.rint(score / n * math.pow(10, roundTo))
        / math.pow(10, roundTo))
    }.toDF("word", "score")
  }

  /** Top-k 2-gram phrases per document scored by summed node scores
    * (reference TextRank.scala:90-95 scores 2-grams the same way).
    */
  def topPhrases(docs: DataFrame, idCol: String, tokensCol: String,
      scores: DataFrame, k: Int): DataFrame = {
    val phrases = docs
      .select(col(idCol),
        explode(array_distinct(TextFunctions.ngramsFast(col(tokensCol), 2)))
          .as("phrase"))
      .select(col(idCol), col("phrase"),
        split(col("phrase"), " ").getItem(0).as("a"),
        split(col("phrase"), " ").getItem(1).as("b"))
      .filter(col("a") =!= col("b"))
    val sa = scores.select(col("word").as("a"), col("score").as("score_a"))
    val sb = scores.select(col("word").as("b"), col("score").as("score_b"))
    val scored = phrases
      .join(broadcast(sa), "a").join(broadcast(sb), "b")
      .select(col(idCol), col("phrase"),
        round(col("score_a") + col("score_b"), 4).as("score"))
    Relational.topKPerGroup(scored, Seq(col(idCol)),
      Seq(col("score").desc, col("phrase")), k)
  }
}
