package graft.streaming

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll
import graft.model.Counter

/** ScalaCheck invariants for the detector state machine (SURVEY §5.4). */
object DetectorLogicProps extends Properties("DetectorLogic") {

  private val genDeposits: Gen[List[(Double, Long)]] = for {
    n    <- Gen.choose(1, 60)
    amts <- Gen.listOfN(n, Gen.choose(1, 12000).map(_.toDouble))
    gaps <- Gen.listOfN(n, Gen.choose(0L, 200L))
  } yield {
    val times = gaps.scanLeft(1000L)(_ + _).tail
    amts.zip(times)
  }

  property("every deposit emits exactly one flag event") =
    forAll(genDeposits) { ds =>
      DetectorLogic.run(ds)._2.size == ds.size
    }

  property("an open window never predates its deposits") =
    forAll(genDeposits) { ds =>
      val (st, _) = DetectorLogic.run(ds)
      st.rollingPeriodStartUnix == 0L ||
        st.rollingPeriodStartUnix >= 1000L
    }

  property("flag event <=> windowed cumulative sum >= 10,000 with window open") =
    forAll(genDeposits) { ds =>
      val (_, evs) = DetectorLogic.run(ds)
      // Independent re-simulation of the documented semantics.
      var start = 0L; var recv = 0.0
      val expected = ds.map { case (amt, now) =>
        recv += amt
        if (start == 0L) start = now
        else if (now - start > 120L) { start = 0L; recv = 0.0 }
        !(recv >= 10000.0 && start != 0L)
      }
      evs.map(_.flagRemoved) == expected
    }

  property("a far-future deposit resets an open window to zero, or opens one") =
    forAll(genDeposits) { ds =>
      val (before, _) = DetectorLogic.run(ds)
      val late = (5.0, ds.map(_._2).max + 100000L)
      val (st, evs) = DetectorLogic.run(ds :+ late)
      val expected =
        if (before.rollingPeriodStartUnix != 0L) Counter(0L, 0.0) // reset-discard
        else Counter(late._2, before.received + 5.0)              // opens fresh window
      Prop(st == expected && evs.last.flagRemoved)
    }

  property("single deposit >= threshold flags immediately") =
    forAll(Gen.choose(10000, 50000)) { amt =>
      val (_, evs) = DetectorLogic.run(Seq((amt.toDouble, 777L)))
      !evs.head.flagRemoved && evs.head.rollingPeriodStartUnix == 777L
    }
}
