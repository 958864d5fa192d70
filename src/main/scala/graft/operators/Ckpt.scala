package graft.operators

import org.apache.spark.sql.DataFrame

/** The iterative chains' materialize-and-truncate point (beam rounds,
  * graph maintenance, suffix-array rounds). Default: `localCheckpoint` —
  * executor-local, non-replicated blocks, the right cost at local[*] and
  * for anything recomputable-from-scratch. `-Dgraft.reliableckpt=1`
  * routes the SAME sites through a RELIABLE `checkpoint()` (the
  * `setCheckpointDir` store): local checkpoints die with their executor,
  * so at cluster scale an executor loss AFTER a chain truncated its
  * lineage kills the whole job instead of recomputing (guide §5 caveat —
  * VERDICT r11 flag). A deployment points the checkpoint dir at shared
  * storage; the tmp-dir fallback here keeps the knob runnable at
  * local[*]. Same rows, same plan truncation either way — the knob
  * changes durability, never results. */
object Ckpt {
  def cut(df: DataFrame): DataFrame =
    if (sys.props.get("graft.reliableckpt").contains("1")) {
      val sc = df.sparkSession.sparkContext
      if (sc.getCheckpointDir.isEmpty)
        sc.setCheckpointDir(
          java.nio.file.Files.createTempDirectory("graft_ckpt").toString)
      df.checkpoint()
    } else df.localCheckpoint()
}
