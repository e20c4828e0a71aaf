#!/bin/bash
# Dev-only: regenerate QUERIES.md (query catalog) from SparkEntry.specs.
set -e
cd /root/repo
cat > /tmp/dump_catalog.scala <<'SCALA'
import java.io.PrintWriter
val sb = new StringBuilder
sb ++= "# QUERIES — the driver-checked operator catalog\n\n"
sb ++= "Generated from `SparkEntry.specs` (regenerate: tools/gen_catalog.sh). Every query\n"
sb ++= "has a DuckDB oracle; the driver hash-compares rows/schema/values per round.\n\n"
sb ++= "| query | oracle | what it checks |\n|---|---|---|\n"
for (q <- graft.SparkEntry.specs) {
  val doc = q.doc.replaceAll("\\s+", " ").trim
  val oracle = if (q.oracle.isDefined) "DuckDB" else "rows-only"
  sb ++= s"| ${q.name} | $oracle | $doc |\n"
}
sb ++= s"\nTotal: ${graft.SparkEntry.specs.length} queries, ${graft.SparkEntry.specs.count(_.oracle.isDefined)} oracled.\n"
new PrintWriter("/root/repo/QUERIES.md") { write(sb.toString); close() }
println("CATALOG written")
SCALA
LANG=C.UTF-8 LC_ALL=C.UTF-8 /opt/spark/bin/spark-shell --master 'local[2]' \
  --conf spark.ui.enabled=false --driver-java-options "-Dfile.encoding=UTF-8" \
  --driver-class-path target/scala-2.13/classes -i /tmp/dump_catalog.scala <<< ":quit" 2>/dev/null | grep CATALOG
