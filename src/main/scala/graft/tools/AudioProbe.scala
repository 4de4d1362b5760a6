package graft.tools

import java.util.concurrent.{Callable, Executors, TimeUnit}

import graft.ops.MultimodalOps

/** Pure-JVM probe for the audio synth/decode hot path (dev tool, not
  * driver-run): times WAV synthesis and decode separately, single- vs
  * multi-threaded, OUTSIDE Spark — so scan/encoder machinery and codec
  * cost are separable, and a lock that serializes 32 threads shows up as
  * multi-thread throughput ≤ single-thread. Used to attribute the r11
  * audio_decode bench move (AudioSystem's globally-synchronized per-call
  * provider rescans vs the cached-SPI paths). */
object AudioProbe {
  private def timed(name: String)(f: => Long): Unit = {
    val t0 = System.nanoTime()
    val n = f
    println(f"[audio] $name%-34s ${(System.nanoTime() - t0) / 1e9}%7.2f s  (acc=$n)")
  }

  private def synthRange(lo: Int, hi: Int): Long = {
    var acc = 0L
    var id = lo
    while (id < hi) {
      acc += MultimodalOps.synthWav(100 + id % 400, 8000f, ((id % 9) + 1) / 10.0).length
      id += 1
    }
    acc
  }

  private def decodeRange(payloads: Array[Array[Byte]], lo: Int, hi: Int): Long = {
    var acc = 0L
    var i = lo
    while (i < hi) {
      acc += MultimodalOps.decodeOneAudio(i.toLong, payloads(i)).n_frames
      i += 1
    }
    acc
  }

  private def parallel(threads: Int, n: Int)(f: (Int, Int) => Long): Long = {
    val pool = Executors.newFixedThreadPool(threads)
    val per = n / threads
    val futs = (0 until threads).map { t =>
      pool.submit(new Callable[Long] {
        def call(): Long = f(t * per, if (t == threads - 1) n else (t + 1) * per)
      })
    }
    val acc = futs.map(_.get()).sum
    pool.shutdown(); pool.awaitTermination(1, TimeUnit.MINUTES)
    acc
  }

  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toInt else 50000
    val threads = 32
    synthRange(0, 2000) // warmup: JIT + provider caches
    timed(s"synth x$n 1-thread")(synthRange(0, n))
    timed(s"synth x$n $threads-thread")(parallel(threads, n)(synthRange))
    val payloads = Array.tabulate(n)(id =>
      MultimodalOps.synthWav(100 + id % 400, 8000f, ((id % 9) + 1) / 10.0))
    decodeRange(payloads, 0, 2000) // warmup
    timed(s"decode x$n 1-thread")(decodeRange(payloads, 0, n))
    timed(s"decode x$n $threads-thread")(parallel(threads, n)(decodeRange(payloads, _, _)))
    MultimodalOps.forceAudioSystemSpi = true
    timed(s"synth x$n $threads-thread AudioSystem")(parallel(threads, n)(synthRange))
    timed(s"decode x$n $threads-thread AudioSystem")(parallel(threads, n)(decodeRange(payloads, _, _)))
    MultimodalOps.forceAudioSystemSpi = false
  }
}
