#!/bin/bash
# Dev-only: measure wall time + shuffle bytes of the round-11 vector
# operators (q128 whiten audit / q129 PQ train+encode / q132 IVFADC
# top-k / q133 residual PQ) over the inflated embedding corpora from
# gen_scale_embeddings.py, at x1/x4/x8 the sf0.1 vector count. One
# parameterization each (the shipped q-number knobs): none of these
# carries a within-cell quadratic — the claim under test is LINEAR wall
# and shuffle in corpus size at fixed (m, ksub, nlist, nprobe), because
# codebooks/centroids/luts are scale-constant broadcasts and each
# vector crosses O(m) exchange rows. Emits SCALE lines; SCALE.md's
# fifth table is written from them by hand. Run idle.
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
import graft.operators.Similarity
@volatile var shufW = 0L
spark.sparkContext.addSparkListener(new SparkListener {
  override def onStageCompleted(s: SparkListenerStageCompleted): Unit =
    shufW += s.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten
})
graft.GraftSession.ensureConfs(spark)
spark.range(1000000).selectExpr("sum(id)").collect()  // session warmup

def emb(dir: String) = graft.sources.Tables.embeddings(spark, dir)

def ops(dir: String): Seq[(String, () => org.apache.spark.sql.DataFrame)] = Seq(
  ("whiten" -> { () => Similarity.whitenAudit(emb(dir), iters = 3, dim = 64) }),
  ("pq_codes" -> { () =>
    val e = emb(dir)
    Similarity.pqEncode(e, Similarity.pqTrain(e, m = 4, ksub = 8, iters = 2, dim = 64),
      m = 4, dim = 64)
  }),
  ("ivfadc" -> { () =>
    val e = emb(dir)
    val cb = Similarity.pqTrain(e, m = 4, ksub = 8, iters = 2, dim = 64)
    val codes = Similarity.pqEncode(e, cb, m = 4, dim = 64)
    val cent = e.filter(col("vec_id") < 16)
    val cells = Similarity.ivfAssign(e, cent, dim = 64).select(col("n_id"), col("c_id"))
    Similarity.ivfAdcTopK(e.filter(col("vec_id") < 8), codes, cells, cent, cb,
      k = 5, nprobe = 4, m = 4, dim = 64)
  }),
  ("resid_codes" -> { () =>
    val e = emb(dir)
    Similarity.pqResidualCodes(e, e.filter(col("vec_id") < 16),
      m = 4, ksub = 8, iters = 2, dim = 64)
  }),
  // round-11 (2): SQ8 distortion audit and the semantic-contamination
  // probe (shipped q138/q139 knobs)
  ("sq8" -> { () => Similarity.sqAudit(emb(dir), dim = 64) }),
  ("sem_contam" -> { () =>
    val e = emb(dir)
    val train = graft.operators.Sampling.withSplitBucket(e, "vec_id")
      .filter(col("__bucket") >= 100).drop("__bucket")
    val refined = Similarity.kmeansIterate(train,
      train.filter(col("vec_id") < 16), iters = 2, dim = 64)
    graft.operators.Decontaminate.semanticContaminationReport(
      e, refined, threshold = 0.5, nprobe = 4, evalPermille = 100, dim = 64)
  }))

for ((scale, _) <- Seq(("x1", 1), ("x4", 4), ("x8", 8))) {
  val dir = s"/tmp/graft_scale/$scale"
  for ((name, mk) <- ops(dir)) {
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
    println(f"SCALE $scale $name min=${math.min(t1, t2)}%.3f shufW_MB=${shufW / 1048576.0}%.2f")
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
  }
}
System.exit(0)
EOF
