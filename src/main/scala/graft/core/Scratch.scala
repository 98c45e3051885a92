package graft.core

/** Shuffle-scratch placement (r13 optimization round, guide §2.1/§7.4).
  *
  * Thread-stack sampling of the sf0.1 bench showed executor task
  * workers spending most of their RUNNABLE time in shuffle FILE
  * operations, not compute: `DiskBlockObjectWriter.initialize` (file
  * open), `copyFileStreamNIO` (mmap/unmap per shuffle-output commit)
  * and `writeMetadataFileAndCommit` — ~0.3 s of wall per otherwise
  * sub-millisecond task on this sandbox's overlay rootfs, where file
  * metadata ops cost 10s of ms. Placing `spark.local.dir` on the
  * fastest available scratch cut min-of-reps 15-30% on the star
  * queries and 40-60% on the shuffle-stage-heavy text family
  * (OPTIMIZATION_r13.md §global has the A/B table).
  *
  * This moves WHERE shuffle bytes live within one run; every byte is
  * still computed, written and read back per invocation — nothing is
  * reused across runs (the tmpfs dir holds only Spark's own
  * blockmgr/spill files, deleted on session stop). At warehouse scale
  * the same knob is standard ops guidance: point local dirs at
  * NVMe/SSD scratch, never the OS rootfs (Spark docs, "Tuning").
  *
  * Resolution order: `SPARK_GRAFT_LOCAL_DIR` env override → `/dev/shm`
  * (when writable, the usual Linux tmpfs) → JVM temp dir (Spark's own
  * default behavior).
  */
object Scratch {
  def localDir(): String =
    sys.env.get("SPARK_GRAFT_LOCAL_DIR").getOrElse {
      val shm = new java.io.File("/dev/shm")
      if (shm.isDirectory && shm.canWrite) {
        val d = new java.io.File(shm, "graft-scratch")
        d.mkdirs()
        d.getAbsolutePath
      } else System.getProperty("java.io.tmpdir")
    }
}
