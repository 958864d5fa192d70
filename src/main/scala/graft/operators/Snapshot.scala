package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Snapshot change-data-capture for incremental corpus refresh: a 100 TB
  * training corpus is rebuilt from crawls repeatedly, and reprocessing
  * everything per refresh is the scale-killer — the CDC diff names exactly
  * what changed, and the upsert merge applies a new snapshot without
  * rewriting unchanged data. Not in the reference (its corpus is static
  * .fbin files); the shape is the Delta/Iceberg MERGE INTO contract.
  *
  * Scale shape: both operators are ONE equi-join on the snapshot key —
  * never a cross product, nothing driver-side. At 100 TB the join is
  * shuffle-on-key (or co-located if both snapshots are bucketed by key,
  * the layout a real lakehouse table would already have).
  */
object Snapshot {

  /** Per-key diff of two snapshots: full-outer equi-join on `key`, status
    * from presence + a caller-supplied content-hash column `hashCol`
    * (compare hashes, not payloads — the wide payload never shuffles):
    * `added` (new only), `removed` (old only), `changed` (both, hash
    * differs), `unchanged`. */
  def cdcDiff(oldSnap: DataFrame, newSnap: DataFrame,
      key: String, hashCol: String): DataFrame = {
    val o = oldSnap.select(col(key), col(hashCol).as("old_hash"))
    val n = newSnap.select(col(key), col(hashCol).as("new_hash"))
    o.join(n, Seq(key), "full_outer")
      .select(col(key),
        when(col("old_hash").isNull, lit("added"))
          .when(col("new_hash").isNull, lit("removed"))
          .when(col("old_hash") === col("new_hash"), lit("unchanged"))
          .otherwise(lit("changed")).as("status"),
        col("old_hash"), col("new_hash"))
  }

  /** Upsert merge (MERGE INTO with matched-update + not-matched-insert,
    * no delete clause): the new snapshot wins per key; old keys absent
    * from the new snapshot persist. One left-anti equi-join + union —
    * the old snapshot's surviving rows pass through untouched. */
  def upsertMerge(oldSnap: DataFrame, newSnap: DataFrame, key: String): DataFrame =
    oldSnap.join(newSnap.select(col(key)), Seq(key), "left_anti")
      .unionByName(newSnap)
}
