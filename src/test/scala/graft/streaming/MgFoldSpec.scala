package graft.streaming

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamingOps.{mgFold, MgState}

/** The Misra–Gries invariants, property-checked on the pure fold the
  * streaming op applies per row (no Spark session needed):
  *
  *  1. at most k counters are ever held;
  *  2. for EVERY item x (tracked or not):
  *     `count(x) <= f(x) <= count(x) + decrements`
  *     (untracked ⇒ count(x) = 0, so f(x) <= decrements);
  *  3. every item with f(x) > N/(k+1) is tracked — the classical
  *     frequent-items guarantee the bounded state buys. */
class MgFoldSpec extends AnyFunSuite {

  private val streamGen: Gen[List[String]] =
    Gen.chooseNum(0, 200).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf("a", "b", "c", "d", "e", "f", "g", "h")))

  test("Misra-Gries invariants hold on random streams and k") {
    val prop = Prop.forAll(streamGen, Gen.chooseNum(1, 5)) { (items, k) =>
      val st = items.foldLeft(MgState(Map.empty, 0L))((s, i) => mgFold(s, i, k))
      val freq = items.groupBy(identity).map { case (i, xs) => i -> xs.size.toLong }
      val n = items.size.toLong
      val sizeOk = st.counts.size <= k
      val boundsOk = freq.forall { case (item, f) =>
        val c = st.counts.getOrElse(item, 0L)
        c <= f && f <= c + st.decrements
      }
      val frequentTracked = freq.forall { case (item, f) =>
        f <= n / (k + 1) || st.counts.contains(item)
      }
      sizeOk && boundsOk && frequentTracked
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(300), prop)
    assert(res.passed, res.status.toString)
  }

  test("fold order across batches is irrelevant to the single-stream result") {
    // state carried across micro-batches == one fold over the
    // concatenated stream (the checkpoint-continuation contract)
    val prop = Prop.forAll(streamGen, streamGen, Gen.chooseNum(1, 4)) { (b1, b2, k) =>
      val stepwise = (b1 ++ b2).foldLeft(MgState(Map.empty, 0L))((s, i) => mgFold(s, i, k))
      val mid = b1.foldLeft(MgState(Map.empty, 0L))((s, i) => mgFold(s, i, k))
      val resumed = b2.foldLeft(mid)((s, i) => mgFold(s, i, k))
      stepwise == resumed
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(res.passed, res.status.toString)
  }
}
