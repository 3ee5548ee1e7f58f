package graft.tools

import java.util.concurrent.Executors
import graft.fixtures.SyntheticStore
import graft.functions.ImageFunctions

/** Scratch: raw ImageIO decode+aHash scaling without Spark. */
object DecodeScale {
  def main(args: Array[String]): Unit = {
    val perThread = 4000
    // pre-encode a pool of distinct images (ids cycle formats)
    val pool = (1L to 64L).map(id => SyntheticStore.row(id, 32, 160).bytes).toArray
    def work(): Long = {
      var acc = 0L
      var i = 0
      while (i < perThread) {
        acc ^= ImageFunctions.phashOfBytes(pool(i % pool.length)).getOrElse(0L)
        i += 1
      }
      acc
    }
    work() // warm
    for (threads <- Seq(1, 2, 4, 8, 16)) {
      val ex = Executors.newFixedThreadPool(threads)
      val t0 = System.nanoTime()
      val futures = (0 until threads).map(_ => ex.submit(new java.util.concurrent.Callable[Long] {
        def call(): Long = work()
      }))
      futures.foreach(_.get())
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[decode] threads=$threads%2d  ${threads * perThread / sec}%9.0f img/s  ($sec%5.2f s)")
      ex.shutdown()
    }
  }
}
