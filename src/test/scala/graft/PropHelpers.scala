package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Minimal deterministic property harness over raw ScalaCheck Gen
  * (the scalatest-scalacheck bridge isn't available offline). Fixed
  * seed => reproducible CI. */
trait PropHelpers {
  val propRuns = 200

  private def sample[A](g: Gen[A], seed: Seed): A =
    g.pureApply(Gen.Parameters.default, seed)

  def forAll[A, B](ga: Gen[A], gb: Gen[B])(f: (A, B) => Unit): Unit = {
    var s = Seed(42L)
    (1 to propRuns).foreach { _ =>
      f(sample(ga, s), sample(gb, s.next))
      s = s.next.next
    }
  }

  def forAll[A, B, C](ga: Gen[A], gb: Gen[B], gc: Gen[C])(f: (A, B, C) => Unit): Unit = {
    var s = Seed(42L)
    (1 to propRuns).foreach { _ =>
      f(sample(ga, s), sample(gb, s.next), sample(gc, s.next.next))
      s = s.next.next.next
    }
  }

  def forAll[A, B, C, D](ga: Gen[A], gb: Gen[B], gc: Gen[C], gd: Gen[D])(
      f: (A, B, C, D) => Unit): Unit = {
    var s = Seed(42L)
    (1 to propRuns).foreach { _ =>
      f(sample(ga, s), sample(gb, s.next), sample(gc, s.next.next),
        sample(gd, s.next.next.next))
      s = s.next.next.next.next
    }
  }
}
