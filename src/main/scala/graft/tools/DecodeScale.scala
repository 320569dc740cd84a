package graft.tools

import graft.data.GeoTables
import graft.img.Images

/** Pure-thread decode+phash scaling probe — NO Spark. Isolates whether the
  * 8→32 task-time inflation seen in ScalePhases (cpu 96 s → ~145 s on the
  * same 1M-image job) lives in the decode kernel (memory-system contention)
  * or in Spark machinery (parquet read, codegen rows, shuffle write).
  *
  * Each thread loops over a private cursor into a SHARED 20k-blob working
  * set (same fixture generator as the bench tables: 16–64 px, 80% PNG /
  * 20% JPEG) doing img_phash — the identical per-row work of the
  * ScalingBench decode stage. Reports throughput at `lo` and `hi` threads,
  * efficiency, bracketed by spin probes.
  */
object DecodeScale {
  def main(args: Array[String]): Unit = {
    val nBlobs = 20000
    val perThreadImages = sys.env.getOrElse("DECODE_SCALE_N", "120000").toInt
    val lo = 8; val hi = 32
    val blobs = new Array[Array[Byte]](nBlobs)
    val phs = new Array[Long](nBlobs)
    (0 until nBlobs).toArray.foreach { i =>
      val r = GeoTables.imageRow(i.toLong)
      blobs(i) = r.bytes; phs(i) = r.phash
    }

    def run(threads: Int): Double = {
      val bad = new java.util.concurrent.atomic.AtomicLong
      val ts = (0 until threads).map { t =>
        new Thread(() => {
          var i = 0
          var idx = (t * 7919) % nBlobs
          while (i < perThreadImages) {
            if (Images.phash(blobs(idx)) != phs(idx)) bad.incrementAndGet()
            idx += 1; if (idx == nBlobs) idx = 0
            i += 1
          }
        })
      }
      val t0 = System.nanoTime()
      ts.foreach(_.start()); ts.foreach(_.join())
      val sec = (System.nanoTime() - t0) / 1e9
      require(bad.get() == 0, s"phash mismatch x${bad.get()}")
      threads.toLong * perThreadImages / sec
    }

    run(hi) // JIT warm
    (1 to sys.env.getOrElse("DECODE_SCALE_REPS", "3").toInt).foreach { _ =>
      val cPre = ScalingBench.probeCeiling(100_000_000L, lo, hi)
      val thLo = run(lo)
      val thHi = run(hi)
      val cPost = ScalingBench.probeCeiling(100_000_000L, lo, hi)
      val eff = (thHi / thLo) / (hi.toDouble / lo)
      println(f"[decode-scale] img/s@$lo=${thLo.toLong} img/s@$hi=${thHi.toLong} eff=$eff%.3f ceil=$cPre%.2f/$cPost%.2f")
    }
  }
}
