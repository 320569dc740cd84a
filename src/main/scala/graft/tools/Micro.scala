package graft.tools

import graft.img.Images

/**
 * Kernel-level thread-scaling microbenchmark (no Spark): isolates image
 * decode / pHash DCT scaling from 8 to 32 threads. Used to find the
 * ImageIO serialization bugs documented in BENCH.md §2 and to measure the
 * host's attainable ceiling (even a pure spin loop shows 0.75–0.91 here).
 */
object Micro {
  def main(args: Array[String]): Unit = {
    val png = Images.encode(32, 32, Images.synthRgb(1L, 32, 32), "png")
    val jpg = Images.encode(32, 32, Images.synthRgb(2L, 32, 32), "jpg")
    val rgb32 = Images.synthRgb(3L, 32, 32)
    def run(threads: Int, n: Int, mode: String): Double = {
      val pool = java.util.concurrent.Executors.newFixedThreadPool(threads)
      val t0 = System.nanoTime()
      val tasks = (0 until threads).map { _ =>
        pool.submit(new Runnable {
          def run(): Unit = {
            var i = 0
            while (i < n / threads) {
              mode match {
                case "full"   => Images.phash(if (i % 5 == 0) jpg else png)
                case "dct"    => Images.phashOfRgb(32, 32, rgb32)
                case "decode" => Images.decode(if (i % 5 == 0) jpg else png)
                case "png"    => Images.decode(png)
                case "jpg"    => Images.decode(jpg)
              }
              i += 1
            }
          }
        })
      }
      tasks.foreach(_.get())
      pool.shutdown()
      (System.nanoTime() - t0) / 1e9
    }
    Seq("png", "jpg", "decode", "dct", "full").foreach { mode =>
      run(8, 40000, mode) // warmup
      val t8 = run(8, 200000, mode)
      val t32 = run(32, 200000, mode)
      println(f"$mode%-7s t8=$t8%.2f t32=$t32%.2f speedup=${t8 / t32}%.2f eff=${t8 / t32 / 4}%.2f")
    }
  }
}
