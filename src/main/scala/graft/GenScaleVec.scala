package graft

import org.apache.spark.sql.SparkSession

/** Embeddings-only corpus scaler (round-11 verdict item 2): writes an
  * N× copy of ONLY a testdata directory's `embeddings.parquet`, using
  * the identical id-offset + dimension-rotation scheme as
  * [[GenScale]]'s vector path — norms and intra-copy pairwise cosines
  * are bit-preserved, cross-copy similarity decorrelates, labels keep
  * their cardinality, so mean label-block size grows linearly with the
  * copy count.
  *
  * Exists because the `knn_graph` auto-K rule's sf100 rung
  * (n̄_label ≈ 200k → kInternal = 48) was measured only at sf10 SHAPE
  * (n̄ ≈ 20k); generating the documents/lineitem side of a true sf100
  * corpus costs tens of GB for nothing — the k-NN graph touches only
  * vectors (~0.5 GB at 2M × 64 dims). `GenScaleVec <srcDir> <dstDir>
  * [N]` produces a directory KSweep/Tables.embeddings can read
  * directly.
  */
object GenScaleVec {

  def main(args: Array[String]): Unit = {
    val src = args(0)
    val dst = args(1)
    val copies = if (args.length > 2) args(2).toInt else 10
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    import GenScale.Emb

    val embs = spark.read.parquet(s"$src/embeddings.parquet").as[Emb]
    (0 until copies).map { c =>
      embs.map { e =>
        if (c == 0) e
        else {
          val n = e.embedding.length
          val r = new Array[Float](n)
          var i = 0
          while (i < n) { r(i) = e.embedding((i + c) % n); i += 1 }
          Emb(e.vec_id + c.toLong * 100000000L, r, e.label)
        }
      }
    }.reduce(_ unionAll _).toDF()
      .write.mode("overwrite").parquet(s"$dst/embeddings.parquet")
    val out = spark.read.parquet(s"$dst/embeddings.parquet")
    println(s"[genscalevec] embeddings: ${out.count()} rows " +
      s"(${copies}x of $src)")
    spark.stop()
  }
}
