package graft

/** BPE training-horizon probe — the cost model past the oracle's
  * 3-round fixture horizon: a production tokenizer run iterates the
  * same merge step to a target vocab size (tens of thousands of
  * rounds), so the question that matters at 100 TB is how a DEEP
  * horizon scales. The design claim (word-frequency-dict BPE): the
  * corpus is touched exactly once (the vocab build), and every round
  * after runs over the Zipf-bounded VOCAB only — one pair aggregate +
  * a 1-row TakeOrdered + a map-side replace — so cost is
  * `vocab_pass + rounds × O(vocab)`, independent of corpus row count
  * beyond pass 1. This probe measures exactly that decomposition on
  * the 30× salted fixture: the vocab pass on its own, then horizons
  * 8 / 16 / 32 from the SAME checkpointed starting state (the
  * per-round marginal cost is the slope; doubling the horizon should
  * ≈ double the loop time, and none of it re-reads the corpus). Run:
  * `sbt "runMain graft.BpeProbe /root/testdata/sf0.1 30"`.
  */
object BpeProbe {

  def main(args: Array[String]): Unit = {
    val srcDir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val factor = args.lift(1).getOrElse("30").toInt
    val dir = args.lift(2).getOrElse("/tmp/graft-bpe-probe")
    val spark = Sessions.builder("graft-bpe-probe").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)")
      .write.format("noop").mode("overwrite").save()
    val nDocs = ScaleProbe.buildFixture(spark, srcDir, dir, factor)
    val docs = spark.read.parquet(s"$dir/documents.parquet")

    // the ONE corpus pass: vocab build + checkpoint (count() forces the
    // checkpoint materialization; the vocab is the loop's entire input)
    Sessions.isolateQueries(spark)
    var t = System.nanoTime()
    val vocab = queries.Pipeline.bpeVocabState(docs)
    val nVocab = vocab.count()
    val tVocab = secs(t)

    // deep horizons from the SAME starting state: slope = per-round
    // vocab-only cost; the corpus is never re-read (the fixture dir
    // could be deleted here and the loop would still run). NO
    // isolateQueries between arms — it unpersists ALL blocks,
    // including the shared checkpointed vocab state the arms exist to
    // reuse (a local checkpoint cannot recompute once freed)
    val horizons = Seq(8, 16, 32).map { h =>
      t = System.nanoTime()
      val (rounds, _) = queries.Pipeline.bpeTrainRounds(spark, vocab, h)
      val sec = secs(t)
      println(s"""{"probe":"bpe-horizon","h":$h,"merges":${rounds.length},"sec":$sec}""")
      h -> sec
    }.toMap
    val perRound =
      math.round((horizons(32) - horizons(16)) / 16 * 1000) / 1000.0
    println(
      s"""{"probe":"bpe-horizon-summary","factor":$factor,"docs":$nDocs,""" +
      s""""vocab":$nVocab,"vocab_sec":$tVocab,""" +
      s""""h8_sec":${horizons(8)},"h16_sec":${horizons(16)},""" +
      s""""h32_sec":${horizons(32)},"marginal_round_sec":$perRound}""")
    spark.stop()
  }

  private def secs(t: Long): Double =
    math.round((System.nanoTime() - t) / 1e6) / 1e3
}
