package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Small bounded LRU memo for materialized per-(session, corpus)
  * assets (the near-dup pair graph, the cluster-label table). A single
  * slot thrashes build/persist cycles whenever one session alternates
  * corpora — exactly what the leak-check suites and a multi-SF bench
  * do — while unbounded growth would pin every corpus ever touched in
  * executor storage. Eviction unpersists the evicted frame: correct,
  * but a silent recompute cliff for an in-flight consumer still
  * scanning it, which is why the bound sits comfortably above the
  * corpora-per-session count (3 sf dirs + a few suite-planted ones).
  *
  * Lookup and publication take the map lock; the BUILD runs outside it
  * (a pair-graph build is seconds of Spark jobs — holding the lock
  * through it would convoy every concurrent dedup-family caller).
  * Racing builders are benign: the first publisher wins and the
  * loser's frame is unpersisted.
  *
  * INVARIANT (inherited by every asset cached here): the parquet under
  * a given sfDir is immutable for the lifetime of a session — true for
  * the driver's fixed test corpora. Regenerating files in place would
  * serve a stale asset; key the memo by snapshot path (the production
  * shape) if that ever changes.
  */
final class AssetMemo(maxEntries: Int) {

  private val map =
    new java.util.LinkedHashMap[(SparkSession, String), DataFrame](
      16, 0.75f, /* accessOrder = */ true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[(SparkSession, String), DataFrame])
          : Boolean =
        if (size > maxEntries) {
          try e.getValue.unpersist(blocking = false)
          catch { case _: Throwable => () }
          true
        } else false
    }

  def getOrBuild(s: SparkSession, d: String)(
      build: => DataFrame): DataFrame = {
    val key = (s, d)
    val hit = map.synchronized(Option(map.get(key)))
    hit.getOrElse {
      val df = build
      map.synchronized {
        Option(map.get(key)) match {
          case Some(winner) =>
            try df.unpersist(blocking = false)
            catch { case _: Throwable => () }
            winner
          case None =>
            map.put(key, df)
            df
        }
      }
    }
  }
}
