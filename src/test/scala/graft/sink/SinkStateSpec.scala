package graft.sink

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll

/** Property-based check of the pure rollover/flush state machine
  * (SURVEY §5 item 3): for all sequences of batch sizes and all
  * (shard, buffer) thresholds, the state machine upholds the
  * reference's invariants (`writer.py:201-204,257-264`).
  */
object SinkStateSpec extends Properties("SinkState") {

  private val thresholds: Gen[(Option[Long], Long)] = for {
    shard <- Gen.option(Gen.choose(0L, 500L))
    buf   <- Gen.choose(0L, 500L)
  } yield (shard, buf)

  private val batchSizes: Gen[List[Long]] =
    Gen.choose(0, 40).flatMap(n => Gen.listOfN(n, Gen.choose(0L, 200L)))

  /** Drive the machine exactly as ParquetStreamSink does; return
    * (#shards opened, total bytes flushed, per-shard flushed bytes).
    */
  private def run(
      shard: Option[Long], buf: Long, sizes: List[Long]): (Int, Long, List[Long]) = {
    val st = new SinkState(shard, buf)
    var opens = 0
    var flushedTotal = 0L
    var perShard = List.empty[Long]
    def rotate(): Unit = {
      val idx = st.onRotate()
      require(idx == opens, "shard indices must be contiguous from 0")
      opens += 1
      perShard ::= 0L
    }
    def flush(): Unit = if (st.bufferNonEmpty) {
      if (!st.shardOpen) rotate() // lazy open
      val b = st.bufferedBytes
      st.onFlush()
      flushedTotal += b
      perShard = (perShard.head + b) :: perShard.tail
    }
    sizes.foreach { sz =>
      st.addBatch(sz)
      st.afterWrite() match {
        case SinkState.NoOp            =>
        case SinkState.FlushOnly       => flush()
        case SinkState.RotateThenFlush =>
          require(st.shardBytes > shard.get,
            "rotation only when flushed bytes strictly exceed the limit")
          require(st.shardBytes > 0, "rotation only when the shard has data")
          rotate(); flush()
      }
    }
    flush() // close()
    (opens, flushedTotal, perShard.reverse)
  }

  property("conservation + contiguity + strict-> shard bound") =
    forAll(thresholds, batchSizes) { (t, sizes) =>
      val (shard, buf) = t
      val (opens, flushedTotal, perShard) = run(shard, buf, sizes)

      val conserved = flushedTotal == sizes.sum
      val openIffData = (opens > 0) == sizes.nonEmpty
      // every shard except the last closed only after strictly
      // exceeding the limit (reference strict-`>` semantics)
      val nonFinalExceed = shard.forall(s => perShard.dropRight(1).forall(_ > s))
      val singleFileNeverRotates = shard.isDefined || opens <= 1

      Prop(conserved) :| s"conservation: $flushedTotal != ${sizes.sum}" &&
        Prop(openIffData) :| "shard opened iff data written" &&
        Prop(nonFinalExceed) :| s"non-final shard under limit: $perShard vs $shard" &&
        Prop(singleFileNeverRotates) :| "single-file mode rotated"
    }

  property("oversized single batch stays in one shard (tests.py:135-144)") =
    forAll(Gen.choose(1L, 100L), Gen.choose(101L, 10000L)) { (limit, big) =>
      val st = new SinkState(Some(limit), ParquetStreamSink.DefaultBufferSizeBytes)
      st.addBatch(big)
      // first write: shard has no flushed data yet → never rotate-first
      st.afterWrite() != SinkState.RotateThenFlush
    }

  property("buffer flushes exactly at the inclusive threshold") =
    forAll(Gen.choose(1L, 500L)) { buf =>
      val st = new SinkState(None, buf)
      st.addBatch(buf - 1)
      val below = st.afterWrite() == SinkState.NoOp
      st.addBatch(1L)
      val at = st.afterWrite() == SinkState.FlushOnly
      below && at
    }
}
