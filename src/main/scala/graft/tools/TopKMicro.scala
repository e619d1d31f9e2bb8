package graft.tools

import graft.functions.TopKBuffer

/** Micro-bench for the [[graft.functions.TopKBuffer]] heap rewrite
  * (round-12 verdict item 5): inserts N uniform (payload, score) pairs
  * at a given k into (a) the production heap buffer and (b) an inline
  * replica of the replaced O(k) replace-min scan, asserts identical
  * selection, and prints both throughputs. Driver-side only — the
  * aggregate's per-insert cost is what bounds update() throughput in
  * every ObjectHashAggregate task.
  *
  * `TopKMicro [k] [n]` — defaults 1024 / 20M.
  */
object TopKMicro {

  // the pre-round-13 algorithm, verbatim semantics: linear worst scan
  private final class ScanBuffer(k: Int) {
    val payloads = new Array[Long](k)
    val scores = new Array[Double](k)
    var size = 0
    private def better(s1: Double, p1: Long, s2: Double, p2: Long) =
      s1 > s2 || (s1 == s2 && p1 < p2)
    def insert(p: Long, s: Double): Unit = {
      if (size < k) { payloads(size) = p; scores(size) = s; size += 1 }
      else {
        var worst = 0
        var i = 1
        while (i < size) {
          if (better(scores(worst), payloads(worst), scores(i), payloads(i)))
            worst = i
          i += 1
        }
        if (better(s, p, scores(worst), payloads(worst))) {
          payloads(worst) = p; scores(worst) = s
        }
      }
    }
    def sortedDesc: Array[(Long, Double)] =
      (0 until size).map(i => (payloads(i), scores(i))).toArray
        .sortWith((a, b) => better(a._2, a._1, b._2, b._1))
  }

  def main(args: Array[String]): Unit = {
    val k = if (args.length > 0) args(0).toInt else 1024
    val n = if (args.length > 1) args(1).toInt else 20000000
    // deterministic splitmix stream — identical input to both buffers
    def stream(f: (Long, Double) => Unit): Unit = {
      var z = 0x2545F4914F6CDD1DL
      var i = 0
      while (i < n) {
        z += 0x9E3779B97F4A7C15L
        var x = z
        x = (x ^ (x >>> 30)) * 0xBF58476D1CE4E5B9L
        x = (x ^ (x >>> 27)) * 0x94D049BB133111EBL
        x ^= x >>> 31
        f(x, (x >>> 11).toDouble / (1L << 53).toDouble)
        i += 1
      }
    }
    // warm both paths once at small n before timing
    for (_ <- 1 to 2) {
      val w1 = new TopKBuffer(k); val w2 = new ScanBuffer(k)
      var i = 0
      while (i < 2000000) { w1.insert(i, (i % 9973) / 9972.0)
        w2.insert(i, (i % 9973) / 9972.0); i += 1 }
    }
    val heap = new TopKBuffer(k)
    val t0 = System.nanoTime()
    stream(heap.insert)
    val heapSec = (System.nanoTime() - t0) / 1e9
    val scan = new ScanBuffer(k)
    val t1 = System.nanoTime()
    stream(scan.insert)
    val scanSec = (System.nanoTime() - t1) / 1e9
    require(heap.sortedDesc.toSeq == scan.sortedDesc.toSeq,
      "selection diverged — heap rewrite is wrong")
    println(f"""{"k":$k,"n":$n,"heap_sec":$heapSec%.2f,""" +
      f""""scan_sec":$scanSec%.2f,"speedup":${scanSec / heapSec}%.1f,""" +
      """"identical_selection":true}""")
  }
}
