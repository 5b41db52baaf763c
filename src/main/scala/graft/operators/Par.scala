package graft.operators

import org.apache.spark.sql.{Column, DataFrame}

/** Fixture-parallelism guard.
  *
  * The driver's sf* fixtures are single parquet files, so a narrow
  * pipeline over them plans as ONE input split and serializes on a
  * single task. Operators used to bake an unconditional
  * `repartition(key)` into their bodies to unlock parallelism — but at
  * production scale the input arrives as thousands of splits and that
  * shuffle is pure waste (worse: most of those operators aggregate on a
  * key other than the shim's, so the shuffle buys nothing downstream).
  *
  * [[spread]] keeps the fixture behavior and deletes the scale cost: it
  * hash-spreads on `key` only when the input plans to fewer splits than
  * the session's parallelism; many-split input passes through with no
  * shuffle and `eq`-identical plan. Results are partition-independent
  * by the whole-inventory law (PartitionIndependenceSpec), so the gate
  * hashes identically on both paths.
  */
private[graft] object Par {
  /** Threshold: spread only when the input can't occupy the session's
    * cores.
    *
    * Shuffle-bearing inputs pass through untouched BEFORE any `.rdd`
    * call: under AQE, materializing the RDD of a shuffle-bearing plan
    * eagerly executes its upstream query stages (real jobs), so the
    * split-count probe is only safe — "driver-side, no job" — on
    * shuffle-free plans. A plan that already shuffles redistributes by
    * construction and needs no spread anyway. For the shuffle-free
    * case, `df.rdd.getNumPartitions` plans the scan and reports the
    * true split count — file count alone would misread one large
    * splittable file.
    */
  def spread(df: DataFrame, key: Column): DataFrame = {
    import org.apache.spark.sql.catalyst.plans.logical._
    val want = df.sparkSession.sparkContext.defaultParallelism
    // shuffle-inducing operators in the OPTIMIZED LOGICAL plan (physical
    // exchanges are only inserted by EnsureRequirements, after the
    // sparkPlan snapshot — and walking the logical plan runs no jobs)
    val wide = df.queryExecution.optimizedPlan.exists {
      case _: Aggregate | _: Join | _: Sort | _: Window | _: Distinct |
           _: Deduplicate | _: GlobalLimit | _: RepartitionByExpression => true
      case r: Repartition => r.shuffle // coalesce() is a narrow repartition
      case _ => false
    }
    if (wide) df
    else if (df.rdd.getNumPartitions < want) df.repartition(key)
    else df
  }

  /** Deterministically release a `localCheckpoint` frame's blocks.
    *
    * `persist`ed frames release via `unpersist()`, but a local
    * checkpoint's MEMORY_AND_DISK blocks belong to the checkpointed RDD
    * inside the frame's `LogicalRDD` leaf and are otherwise reclaimed
    * only when the driver GCs the frame and the ContextCleaner runs —
    * on a long-running stream that is GC-pressure-dependent
    * accumulation (r21 ADVICE). Callers invoke this once everything
    * derived from the frame is fully materialized; the frame is NOT
    * recomputable afterwards. No-op on non-checkpoint frames and on
    * reliable (file-backed) checkpoints. */
  def releaseLocalCheckpoint(df: DataFrame): Unit =
    df.queryExecution.analyzed match {
      case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd.unpersist(false)
      case _ => ()
    }
}
