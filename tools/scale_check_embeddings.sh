#!/bin/bash
# Dev-only: measure wall time + shuffle bytes of the embedding family
# (q113 semanticDedup / q114 incremental / q117 recall audit / q50 LSH
# pairs) over the inflated embedding corpora from
# gen_scale_embeddings.py, at x1/x4/x8 the sf0.1 vector count — each op
# in TWO parameterizations:
#   fixed  — the shipped q-numbers' parameters (nlist=16 / bits=4) at
#            every scale: cells grow in population, exposing the
#            within-cell quadratic the scaladocs document;
#   scaled — nlist (resp. 2^bits) grown with the corpus so per-cell
#            population stays ~constant: the production knob, restoring
#            linear total work.
# Emits SCALE lines; SCALE.md's third table is written from them by
# hand. Run idle — contention inflates everything.
set -e
cd /root/repo
/opt/spark/bin/spark-shell --master 'local[32]' --conf spark.ui.enabled=false \
  --conf spark.sql.shuffle.partitions=32 \
  --conf spark.sql.adaptive.enabled=true \
  --conf spark.sql.session.timeZone=UTC \
  --driver-memory 24g \
  --driver-class-path target/scala-2.13/classes <<'EOF'
import org.apache.spark.scheduler._
import org.apache.spark.sql.functions._
import graft.operators.{Sampling, Similarity, Dedup}
@volatile var shufW = 0L
spark.sparkContext.addSparkListener(new SparkListener {
  override def onStageCompleted(s: SparkListenerStageCompleted): Unit =
    shufW += s.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten
})
graft.GraftSession.ensureConfs(spark)
spark.range(1000000).selectExpr("sum(id)").collect()  // session warmup

def emb(dir: String) = graft.sources.Tables.embeddings(spark, dir)

// one op runner per family member; nlist/bits passed per variant
def ops(dir: String, nlist: Int, bits: Int): Seq[(String, () => org.apache.spark.sql.DataFrame)] = Seq(
  ("semdedup" -> { () =>
    val e = emb(dir)
    val refined = Similarity.kmeansIterate(e, e.filter(col("vec_id") < nlist), iters = 2, dim = 64)
    Similarity.semanticDedup(e, refined, threshold = 0.35, dim = 64)
  }),
  ("incr_semdedup" -> { () =>
    val e = emb(dir)
    val flagged = Sampling.withSplitBucket(e, "vec_id")
      .withColumn("is_new", col("__bucket") < 100).drop("__bucket")
    val old = flagged.filter(!col("is_new"))
    val refined = Similarity.kmeansIterate(old, old.filter(col("vec_id") < nlist), iters = 2, dim = 64)
    Similarity.incrementalSemanticDedup(flagged, "is_new", refined, threshold = 0.35, dim = 64)
  }),
  ("recall_audit" -> { () =>
    val e = emb(dir)
    val refined = Similarity.kmeansIterate(e, e.filter(col("vec_id") < nlist), iters = 2, dim = 64)
    Similarity.annRecallAudit(e.filter(col("vec_id") < 8), e, refined, k = 5,
      nprobe = 4, bits = bits, dim = 64)
  }),
  ("lsh_pairs" -> { () =>
    Dedup.embeddingNearDupPairsLsh(emb(dir), threshold = 0.35, bits = bits, dim = 64)
  }))

val scales = Seq(("x1", 1), ("x4", 4), ("x8", 8))
for ((scale, k) <- scales; variant <- Seq("fixed", "scaled")) {
  val nlist = if (variant == "fixed") 16 else 16 * k
  // 2^bits buckets scaled with the corpus: 4 -> 6 -> 7
  val bits = if (variant == "fixed") 4 else 4 + (math.log(k) / math.log(2)).round.toInt
  val dir = s"/tmp/graft_scale/$scale"
  for ((name, mk) <- ops(dir, nlist, bits)) {
    def once(): Double = {
      val t0 = System.nanoTime
      mk().queryExecution.toRdd.count()
      (System.nanoTime - t0) / 1e9
    }
    val t1 = once()
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    Thread.sleep(1200); shufW = 0L
    val t2 = once()
    Thread.sleep(1200)  // let listener events drain before reading counters
    println(f"SCALE $scale $variant $name nlist=$nlist bits=$bits min=${math.min(t1, t2)}%.3f shufW_MB=${shufW / 1048576.0}%.2f")
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
  }
}
System.exit(0)
EOF
