package graft

import scala.util.Random
import graft.functions.{TopKAggregator, TopKBuf}

/** Randomized-property guards (seeded — fully reproducible) for the
  * foundational pieces every oracle row rides on: the bounded-heap
  * top-k aggregator's algebra (its correctness at scale DEPENDS on
  * merge order-insensitivity — partial buffers combine in arbitrary
  * shuffle order), the cross-engine rounding convention, and the
  * batch sessionizer against a brute-force model. */
class PropertySpec extends SparkSuite {

  private def randPairs(rnd: Random, n: Int): Seq[(Long, Double)] =
    Seq.fill(n)((rnd.nextInt(50).toLong, rnd.nextInt(21).toDouble / 4.0 - 2.5))

  private def viaAgg(k: Int, xs: Seq[(Long, Double)]): Seq[(Long, Double)] = {
    val agg = new TopKAggregator(k)
    xs.foldLeft(agg.zero)((b, x) => agg.reduce(b, x)).items
  }
  private def expected(k: Int, xs: Seq[(Long, Double)]): Seq[(Long, Double)] =
    xs.sortBy { case (id, s) => (-s, id) }.take(k)

  test("TopKAggregator: reduce = exact sorted top-k; merge order-insensitive") {
    val rnd = new Random(42)
    for (_ <- 1 to 300) {
      val xs = randPairs(rnd, rnd.nextInt(30))
      val ys = randPairs(rnd, rnd.nextInt(30))
      assert(viaAgg(3, xs) == expected(3, xs))
      val agg = new TopKAggregator(3)
      val a = TopKBuf(viaAgg(3, xs)); val b = TopKBuf(viaAgg(3, ys))
      assert(agg.merge(a, b).items == agg.merge(b, a).items)
      assert(agg.merge(a, b).items == expected(3, xs ++ ys))
      // splitting anywhere and merging equals one-shot reduction
      val all = xs ++ ys
      if (all.nonEmpty) {
        val cut = rnd.nextInt(all.size + 1)
        val (l, r) = all.splitAt(cut)
        assert(agg.merge(TopKBuf(viaAgg(3, l)), TopKBuf(viaAgg(3, r))).items ==
          viaAgg(3, all))
      }
    }
  }

  test("floor-half-up rounding is idempotent and monotone") {
    def r(d: Int, x: Double): Double = {
      val m = math.pow(10, d)
      math.floor(x * m + 0.5) / m // the Rounding column fns' scalar twin
    }
    val rnd = new Random(7)
    for (_ <- 1 to 1000) {
      val x = (rnd.nextDouble() - 0.5) * 2e6
      assert(r(4, r(4, x)) == r(4, x), s"not idempotent at $x")
      val y = (rnd.nextDouble() - 0.5) * 2e6
      val (lo, hi) = (math.min(x, y), math.max(x, y))
      assert(r(6, lo) <= r(6, hi), s"not monotone at $lo, $hi")
    }
  }

  test("batch sessionizer matches a brute-force model on random event sets") {
    val s = spark
    import s.implicits._
    import java.sql.Timestamp
    val gapS = graft.operators.Relational.SESSION_GAP_SECONDS
    val rnd = new Random(2024)
    for (trial <- 1 to 8) {
      // 10-min grid offsets so gaps straddle the 30-min cut often
      val evs = (0 until 40).map { i =>
        (i.toLong, rnd.nextInt(4).toLong + 1,
          new Timestamp(1700000000000L + rnd.nextInt(41) * 600L * 1000L))
      }
      // brute force: per user, sort times, split on > gap
      val want = evs.groupBy(_._2).flatMap { case (u, rows) =>
        val ts = rows.map(_._3.getTime / 1000).sorted
        val sessions = ts.foldLeft(List.empty[List[Long]]) {
          case (Nil, t) => List(List(t))
          case (cur :: done, t) =>
            if (t - cur.head > gapS) List(t) :: cur :: done
            else (t :: cur) :: done
        }
        sessions.map(sess => (u, sess.min, sess.max, sess.size.toLong))
      }.toSet

      val df = evs.toDF("event_id", "user_id", "ts")
        .withColumn("event_type", org.apache.spark.sql.functions.lit("e"))
      val got = graft.operators.Relational.sessionizeBatch(df)
        .select("user_id", "session_start", "session_end", "n_events")
        .collect()
        .map(r => (r.getLong(0), r.getTimestamp(1).getTime / 1000,
          r.getTimestamp(2).getTime / 1000, r.getLong(3)))
        .toSet
      assert(got == want, s"trial $trial sessions diverged")
    }
  }

  test("MisraGries: candidate superset guarantee under arbitrary split+merge") {
    import graft.functions.{MGBuf, MisraGriesAggregator}
    val rnd = new Random(11)
    for (trial <- 1 to 200) {
      val m = 2 + rnd.nextInt(14) // capacities 2..15
      val agg = new MisraGriesAggregator(m)
      // zipf-ish stream: item i drawn with weight ~ 1/(i+1)
      val vocab = 1 + rnd.nextInt(40)
      val weights = (0 until vocab).map(i => 1.0 / (i + 1))
      val cum = weights.scanLeft(0.0)(_ + _).tail
      val total = cum.last
      val n = 50 + rnd.nextInt(500)
      val stream = Seq.fill(n) {
        val x = rnd.nextDouble() * total
        "t" + cum.indexWhere(x <= _)
      }
      // arbitrary split into 1..6 chunks, reduce each, merge in random order
      val chunks = stream.grouped(1 + rnd.nextInt(stream.size)).toSeq
      val bufs = chunks.map(_.foldLeft(agg.zero)(agg.reduce))
      val merged = rnd.shuffle(bufs).foldLeft(agg.zero)(agg.merge)
      assert(merged.counts.size <= m, s"trial $trial: over capacity")
      val exact = stream.groupBy(identity).view.mapValues(_.size.toLong)
      // the MG bound: every item with true count > n/(m+1) must survive,
      // and no surviving estimate exceeds the true count
      for ((tok, c) <- exact if c > n.toDouble / (m + 1))
        assert(merged.counts.contains(tok),
          s"trial $trial: heavy item $tok (count $c, n=$n, m=$m) lost")
      for ((tok, est) <- merged.counts)
        assert(est <= exact.getOrElse(tok, 0L),
          s"trial $trial: $tok overestimated")
    }
  }
}
