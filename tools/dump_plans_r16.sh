#!/bin/bash
# Dev-only: dump `.explain("formatted")` for the named queries into
# plans/r16/<query>_<tag>.txt (tag = before|after). Ids normalized the
# same way as gen_plans.sh so before/after diffs show real changes.
# Usage: tools/dump_plans_r16.sh <tag> <q1,q2,...>
set -e
TAG=${1:?tag}
QS=${2:?query list}
cd /root/repo
mkdir -p plans/r16
/opt/spark/bin/spark-shell --master 'local[8]' --conf spark.ui.enabled=false \
  --conf spark.sql.shuffle.partitions=8 \
  --driver-class-path target/scala-2.13/classes <<EOF
import java.io.PrintWriter
graft.GraftSession.ensureConfs(spark)
val d = "/root/testdata/sf0.01"
def normalizeIds(plan: String): String = {
  val exprIds = scala.collection.mutable.LinkedHashMap.empty[String, Int]
  val step1 = "#(\\\\d+)".r.replaceAllIn(plan,
    m => "#" + exprIds.getOrElseUpdate(m.group(1), exprIds.size + 1))
  val planIds = scala.collection.mutable.LinkedHashMap.empty[String, Int]
  "plan_id=(\\\\d+)".r.replaceAllIn(step1,
    m => "plan_id=" + planIds.getOrElseUpdate(m.group(1), planIds.size + 1))
}
for (name <- "$QS".split(",").toSeq) {
  val df = graft.SparkEntry.queries(name)(spark, d)
  val plan = df.queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)
  new PrintWriter(s"/root/repo/plans/r16/\${name}_$TAG.txt") {
    write(normalizeIds(plan)); close() }
  println(s"WROTE \$name")
}
EOF
