package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The composed IVF-PQ probe's contracts, rederived from first
  * principles in test Scala (a third engine next to Spark and the
  * DuckDB oracle): probe-cell ranking, the learned-cell candidate
  * restriction, the per-subspace ADC argmin with (dist, cell)
  * tie-breaks, the (adc, vec_id) pool cut, and the exact-cosine
  * re-rank order of the emitted rows.
  */
class IvfPqSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  // Mirrors Pipeline's declared constants (private there on purpose —
  // a change to any of them is a semantics change that must
  // consciously update this rederivation too).
  private val NPROBE = 3
  private val POOL = 30
  private val PQ_M = 8

  test("ivfpq: probed cells, ADC pool, and exact re-rank all match the first-principles rederivation") {
    import spark.implicits._
    val emb = graft.Tables(spark, dir, "embeddings")
      .select($"vec_id", $"embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray)).toMap
    val dim = emb.values.head.length
    val sub = dim / PQ_M
    def micro(v: Array[Float]): Array[Long] =
      v.map(x => math.floor(x.toDouble * 1000000.0d).toLong)
    val mv = emb.map { case (id, v) => id -> micro(v) }
    val cents = spark.read
      .parquet(Pipeline.ensureKmeansCentroids(spark, dir).toString)
      .select($"k", $"cvec").collect()
      .map(r => (r.getInt(0), r.getSeq[Long](1).toArray))
    def l2(a: Array[Long], b: Array[Long]): Long =
      a.indices.map { j => val d = a(j) - b(j); d * d }.sum
    // assignment: argmin L2², ties to the smaller cell
    val cellOf = mv.map { case (id, m) =>
      id -> cents.map { case (k, c) => (l2(m, c), k) }.min._2
    }
    val qm = mv(0L)
    val probed = cents.map { case (k, c) => (l2(qm, c), k) }
      .sorted.take(NPROBE).map(_._2).toSet
    // PQ codebook: per (cell, m), floor(mean) over members' subspace
    val allCells: Seq[Int] = cellOf.values.toSeq.distinct
    val codebook: Map[(Int, Int), Array[Long]] =
      allCells.flatMap { cell =>
        val members = mv.collect {
          case (id, m) if cellOf(id) == cell => m
        }.toSeq
        (0 until PQ_M).map { m =>
          val cvec = (0 until sub).map { j =>
            val xs = members.map(_(m * sub + j))
            math.floor(xs.sum.toDouble / xs.size).toLong
          }.toArray
          ((cell, m), cvec)
        }
      }.toMap
    def slice(v: Array[Long], m: Int): Array[Long] =
      v.slice(m * sub, (m + 1) * sub)
    val qd = codebook.map { case ((cell, m), c) =>
      ((cell, m), l2(slice(qm, m), c)) }
    // ADC per candidate: per m, the argmin-(dist², cell) codebook
    // entry's query distance, summed
    val cand = mv.keys.filter(id => id != 0L && probed(cellOf(id)))
    val adc = cand.map { id =>
      id -> (0 until PQ_M).map { m =>
        val best = codebook.keys.filter(_._2 == m).map { k =>
          (l2(slice(mv(id), m), codebook(k)), k._1)
        }.min._2
        qd((best, m))
      }.sum
    }.toMap
    val pool = adc.toSeq.map { case (id, a) => (a, id) }.sorted
      .take(POOL).map(_._2).toSet

    val got = Pipeline.annIvfPq(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.length == 10)
    got.foreach { case (id, a, _) =>
      assert(probed(cellOf(id)), s"vec $id outside the probed cells")
      assert(pool(id), s"vec $id outside the first-principles ADC pool")
      assert(a == adc(id), s"vec $id adc $a != rederived ${adc(id)}")
    }
    // final order is exact-cosine descending with vec_id tie-break
    val ord = got.map { case (id, _, c) => (-c, id) }
    assert(ord.sameElements(ord.sorted), s"re-rank order broken: ${got.toSeq}")
    // and the emitted 10 are the pool's cosine top-10 (no pool member
    // with a strictly larger cosine was left out)
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var ab = 0.0; var aa = 0.0; var bb = 0.0
      a.indices.foreach { j =>
        ab += a(j).toDouble * b(j); aa += a(j).toDouble * a(j)
        bb += b(j).toDouble * b(j)
      }
      ab / (math.sqrt(aa) * math.sqrt(bb))
    }
    val gotIds = got.map(_._1).toSet
    val worst = got.map(_._3).min
    pool.diff(gotIds).foreach { id =>
      assert(cos(emb(id), emb(0L)) <= worst + 1e-9,
        s"pool member $id outranks an emitted row")
    }
  }
}
