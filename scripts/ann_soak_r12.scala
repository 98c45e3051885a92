// ANN soak, round 12: the range/cell-pruned exact re-rank at 10M —
// closing SOAK_ann round-11 reading 3 ("the raw frame must be laid out
// so the fetch prunes instead of scanning"; r11 verdict item 2). The
// r11 leg measured the re-rank fetch at 17.9–29.4 s of the 10M wall
// because pqQuery joined the broadcast shortlist against the ENTIRE
// 1.5 GB raw frame. Round 12 changed two things:
//  - pqQuery materializes the bounded ADC shortlist and pushes a
//    vec_id IN + range predicate into the raw scan (works on any raw
//    frame);
//  - saveRerankRaw writes the raw vectors hive-partitioned by COARSE
//    CELL (the probe key — shortlist ids are uniform over the id
//    space, so id-range stats alone prune nothing; the cell is what
//    the query actually bounds), and loadPqIndexWithRaw serves the
//    fetch from that layout with partition pruning.
// Also regenerates the committed artifact at tmp/pqidx10m_slim in
// format v2 (the version marker landed this round; the r11 artifact
// predates it and is refused by load with the rebuild message).
//
// Run (box otherwise idle, inside tmux):
//   sbt -batch package
//   /opt/spark/bin/spark-shell --master local[32] --driver-memory 48g \
//     --conf spark.ui.enabled=false \
//     --conf spark.sql.shuffle.partitions=64 \
//     --conf spark.sql.extensions=graft.functions.GraftExtensions \
//     --conf spark.sql.session.timeZone=UTC \
//     --jars target/scala-2.13/dataingestspark_2.13-0.1.0.jar \
//     -I scripts/ann_soak_r12.scala
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.operators.Similarity

spark.sparkContext.setLogLevel("WARN")

def time[T](label: String)(f: => T): T = { val t0 = System.nanoTime(); val r = f; println(f"$label%-52s ${(System.nanoTime() - t0) / 1e9}%8.1f s"); r }

val t = Tables(spark, "/root/repo/tmp/sf_ann10m")
val emb = t.embeddings.select(col("vec_id"), col("embedding"))
println(s"vectors = ${emb.count()}")

val idxDir = "/root/repo/tmp/pqidx10m_slim"
val nlist = 1024
val maxTrain = 40960

val idx = time("buildPqIndex (nlist=1024, maxTrain=40960)") { val i = Similarity.buildPqIndexFrom(emb, nlist = nlist, maxTrain = maxTrain, tag = "ann10m-r12"); i.codes.count(); i }
time("savePqIndex (format v2)") { Similarity.savePqIndex(idx, idxDir) }
time("saveRerankRaw (hive-partitioned by cell)") { Similarity.saveRerankRaw(idx, idxDir) }

val queries = emb.filter(col("vec_id") < 10).select(col("vec_id").as("qid"), col("embedding").as("qe"))
queries.count()

// leg A: re-rank against the PLAIN raw frame — r11's shape, now with
// the pushed vec_id IN/range predicate (no layout help)
val a1 = time("rerank plain raw, cold (shortlist=400, nprobe=32)") { Similarity.pqQuery(idx, queries, k = 10, nprobe = 32, rerankShortlist = 400).collect() }
val a2 = time("rerank plain raw, warm") { Similarity.pqQuery(idx, queries, k = 10, nprobe = 32, rerankShortlist = 400).collect() }

// leg B: the cell-partitioned layout — fetch prunes to probed cells
val loaded = time("loadPqIndexWithRaw") { val l = Similarity.loadPqIndexWithRaw(spark, idxDir); l.codes.count(); l }
val b1 = time("rerank cell-layout, cold") { Similarity.pqQuery(loaded, queries, k = 10, nprobe = 32, rerankShortlist = 400).collect() }
val b2 = time("rerank cell-layout, warm") { Similarity.pqQuery(loaded, queries, k = 10, nprobe = 32, rerankShortlist = 400).collect() }

// identity: the layout changes bytes read, never rows
println(s"rows identical plain-vs-layout: ${a2.map(_.toString).toSeq == b2.map(_.toString).toSeq} (${a2.length} rows)")

// pure-ADC batch for the round-over-round reference
time("pqQuery ADC only (k=10, nprobe=32)") { Similarity.pqQuery(loaded, queries, k = 10, nprobe = 32).collect() }

// how many of the layout's cell directories did the pruned fetch read?
val cellDirs = new java.io.File(s"$idxDir/raw").listFiles().count(f => f.isDirectory && f.getName.startsWith("cell="))
println(s"layout cell dirs = $cellDirs (fetch reads <= 10 q x 32 probed cells of them)")
idx.release(); loaded.release()
System.exit(0)
