package graft.ops

import org.scalatest.funsuite.AnyFunSuite

/** [[DbMv.ExtremeReserve]] — the bounded-prefix min/max algebra —
  * against brute force: a simulated group multiset runs random
  * delete/add batches shaped exactly like the refresh's inputs (the
  * ≤K+1 smallest/largest deleted values, the ≤K smallest/largest
  * added ones), rebuilding on dirty precisely as the refresh does.
  * After every step the reserves must be exact prefixes of the live
  * sorted multiset and the derived min/max must equal brute force.
  */
class ExtremeReserveSpec extends AnyFunSuite {

  test("random batches: reserve-derived min/max stays exact; prefixes stay prefixes") {
    val rnd = new scala.util.Random(42)
    var totalSteps = 0
    var recomputes = 0
    for (trial <- 1 to 80) {
      val k = 1 + rnd.nextInt(6)
      var live = Vector.fill(rnd.nextInt(30))(rnd.nextInt(15).toDouble)
      var minres: Seq[Double] = live.sorted.take(k)
      var maxres: Seq[Double] = live.sorted.reverse.take(k)
      var nn = live.size.toLong
      for (step <- 1 to 60) {
        totalSteps += 1
        val dels = rnd.shuffle(live).take(rnd.nextInt(live.size + 1))
        var rest = live
        dels.foreach { d =>
          val i = rest.indexOf(d); rest = rest.patch(i, Nil, 1)
        }
        val adds = Vector.fill(rnd.nextInt(8))(rnd.nextInt(15).toDouble)
        val newLive = rest ++ adds
        val st = DbMv.ExtremeReserve(
          minres, maxres, nn,
          dels.sorted.take(k + 1), adds.sorted.take(k),
          dels.sorted.reverse.take(k + 1), adds.sorted.reverse.take(k),
          (adds.size - dels.size).toLong, k)
        assert(st.nn == newLive.size.toLong, s"trial $trial step $step: nn")
        if (st.dirty) {
          recomputes += 1
          minres = newLive.sorted.take(k)
          maxres = newLive.sorted.reverse.take(k)
        } else {
          minres = st.minres
          maxres = st.maxres
        }
        nn = newLive.size.toLong
        live = newLive
        // the invariants the refresh relies on
        assert(minres == live.sorted.take(minres.size),
          s"trial $trial step $step: minres not a prefix")
        assert(maxres == live.sorted.reverse.take(maxres.size),
          s"trial $trial step $step: maxres not a prefix")
        if (live.nonEmpty) {
          assert(minres.nonEmpty && minres.head == live.min,
            s"trial $trial step $step: min")
          assert(maxres.nonEmpty && maxres.head == live.max,
            s"trial $trial step $step: max")
        } else {
          assert(minres.isEmpty && maxres.isEmpty,
            s"trial $trial step $step: empty group keeps residue")
        }
      }
    }
    // the whole point: recomputes are the exception, not the rule
    assert(recomputes < totalSteps / 2,
      s"$recomputes recomputes over $totalSteps steps — reserves never help")
  }

  test("targeted: deleting a whole extreme end drains the prefix and reports dirty") {
    val k = 4
    val live = (1 to 20).map(_.toDouble)
    val minres = live.sorted.take(k)
    val maxres = live.sorted.reverse.take(k)
    // delete the 6 smallest: more than the reserve holds
    val dels = live.sorted.take(6)
    val st = DbMv.ExtremeReserve(minres, maxres, live.size.toLong,
      dels.sorted.take(k + 1), Nil, dels.sorted.reverse.take(k + 1), Nil,
      -dels.size.toLong, k)
    assert(st.dirty)
    // deleting 2 interior values touches nothing and stays clean
    val st2 = DbMv.ExtremeReserve(minres, maxres, live.size.toLong,
      Seq(9.0, 10.0), Nil, Seq(10.0, 9.0), Nil, -2L, k)
    assert(!st2.dirty)
    assert(st2.minres == minres && st2.maxres == maxres)
    // an add smaller than everything enters the min prefix in place
    val st3 = DbMv.ExtremeReserve(minres, maxres, live.size.toLong,
      Nil, Seq(0.5), Nil, Seq(0.5), 1L, k)
    assert(!st3.dirty)
    assert(st3.minres == Seq(0.5, 1.0, 2.0, 3.0))
    assert(st3.maxres == maxres)
  }
}
