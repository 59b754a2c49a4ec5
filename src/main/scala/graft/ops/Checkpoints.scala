package graft.ops

import org.apache.spark.sql.DataFrame

/** Lineage cuts for iterative operators (VERDICT r5 #6).
  *
  * Every Pregel-style loop here (connected components' star
  * contraction, k-hop BFS, PageRank rounds) compounds its logical
  * plan each round, so the frame carried across iterations must be
  * checkpointed, not merely cached. Two modes:
  *
  *  - default: `localCheckpoint` — executor-local blocks, no I/O
  *    beyond the block store. Correct and fast on local[*], but the
  *    blocks die with their executor: on a real cluster an executor
  *    loss mid-iteration fails the job (no lineage left to recompute
  *    from).
  *  - `spark.graft.checkpointDir=<cluster-visible path>`: reliable
  *    `checkpoint()` into that directory — the production setting;
  *    an executor loss re-reads the checkpoint files instead of
  *    failing. The session's checkpoint dir is initialized from the
  *    conf on first use (SparkContext appends a per-app UUID subdir,
  *    so concurrent apps can share the root path).
  *
  * Both modes are EAGER (the cut materializes immediately), so loop
  * round-count and fixpoint semantics are identical in either mode —
  * the spec runs the same operator through both and pins equality.
  */
object Checkpoints {

  /** Conf key switching iterative lineage cuts to reliable storage. */
  val confKey = "spark.graft.checkpointDir"

  /** Cut `df`'s lineage eagerly; mode per [[confKey]]. */
  def cut(df: DataFrame): DataFrame = {
    val s = df.sparkSession
    s.conf.getOption(confKey).filter(_.nonEmpty) match {
      case Some(dir) =>
        if (s.sparkContext.getCheckpointDir.isEmpty)
          s.sparkContext.setCheckpointDir(dir)
        df.checkpoint()
      case None => df.localCheckpoint()
    }
  }

  /** Release the executor blocks backing a [[cut]] frame.
    * `Dataset.localCheckpoint` persists its RDD OUTSIDE the
    * CacheManager, so `df.unpersist()` is a no-op on a checkpointed
    * frame; release the backing blocks via the public LogicalRDD leaf
    * instead (otherwise every contraction round leaks its edge set
    * until the ContextCleaner's next GC-driven sweep). For reliable
    * checkpoints this drops any in-memory copy; the files themselves
    * are reclaimed by the ContextCleaner when
    * `spark.cleaner.referenceTracking.cleanCheckpoints` is set, or
    * with the directory's lifecycle otherwise. */
  def release(df: DataFrame): Unit =
    df.queryExecution.analyzed.foreach {
      case l: org.apache.spark.sql.execution.LogicalRDD =>
        l.rdd.unpersist(blocking = false)
      case _ => ()
    }
}
