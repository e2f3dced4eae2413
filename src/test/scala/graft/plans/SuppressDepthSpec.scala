package graft.plans

import org.scalatest.funsuite.AnyFunSuite

/** Pins the r18 ADVICE fix: suppress windows are a DEPTH COUNTER, not a
  * boolean latch — an inner window's `finally` must not clear an outer
  * one (sync's suppressed refresh overlapping an edge refresh()'s
  * canonical capture corrupted the fingerprint with the old flag). */
class SuppressDepthSpec extends AnyFunSuite {

  test("overlapping suppress windows compose") {
    assert(!BalanceMvRewrite.isSuppressed)
    BalanceMvRewrite.suppressed {
      assert(BalanceMvRewrite.isSuppressed)
      BalanceMvRewrite.suppressed {
        assert(BalanceMvRewrite.isSuppressed)
      }
      assert(BalanceMvRewrite.isSuppressed,
        "inner finally cleared the outer window")
    }
    assert(!BalanceMvRewrite.isSuppressed)
  }

  test("concurrent suppress windows do not truncate each other") {
    val entered = new java.util.concurrent.CountDownLatch(1)
    val release = new java.util.concurrent.CountDownLatch(1)
    val other = new Thread(() => {
      BalanceMvRewrite.suppressed {
        entered.countDown()
        release.await()
      }
    })
    other.start()
    entered.await()
    // the other thread holds a window; a full enter/exit on THIS thread
    // must leave it intact
    BalanceMvRewrite.suppressed { assert(BalanceMvRewrite.isSuppressed) }
    assert(BalanceMvRewrite.isSuppressed,
      "this thread's exit truncated the other thread's live window")
    release.countDown()
    other.join(10000)
    assert(!BalanceMvRewrite.isSuppressed)
  }
}
