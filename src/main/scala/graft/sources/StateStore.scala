package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.types.StructType

/** Keyed-state persistence (SURVEY.md §2.1 S7/S9).
  *
  * The reference dual-writes every state transition to a local file
  * AND an HTTP endpoint, and on startup loads HTTP-preferred with
  * file fallback, failing closed to "no state → fresh init"
  * (state.py:25-38,59-81; manager.py:60-67). In the engine the single
  * source of truth is a path on the cluster FS (the same role the
  * HTTP server plays for the reference's fleet: state that survives
  * the worker), and the fail-closed contract is kept: a missing or
  * empty path yields an EMPTY frame of the declared schema, never an
  * error — a crashed-before-first-checkpoint job restarts clean.
  *
  * Streaming state (RetryStateMachine) doesn't use this — it rides
  * Spark's own checkpointed state store. This is the BATCH analog:
  * jobs that fold state between runs (backfills, resumable scans)
  * persist their keyed state here between executions.
  */
object StateStore {

  /** Load persisted state, or an empty frame with `schema` when the
    * path doesn't exist yet (the reference's `None` → reinit path,
    * state.py:55-57 fail-closed shape check). */
  def loadOrInit(spark: SparkSession, path: String, schema: StructType): DataFrame = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p) && fs.listStatus(p).nonEmpty)
      spark.read.schema(schema).parquet(path)
    else
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
  }

  /** Checkpoint state (overwrite = the reference's write-per-
    * transition collapsed to write-per-batch; Spark's committer makes
    * the swap atomic). */
  def save(state: DataFrame, path: String): Unit =
    state.write.mode(SaveMode.Overwrite).parquet(path)
}
