package graft.transform

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** CDC MERGE apply — the warehouse MERGE statement (WHEN MATCHED
  * UPDATE / WHEN NOT MATCHED INSERT / delete-tombstones) as one
  * declarative full-outer pass. The reference's upsert
  * (details.py-style skip-or-insert, our `Upsert`) only ever ADDS;
  * a change-data-capture feed also carries updates and deletes, and
  * applying it is the canonical nightly job on a replicated table.
  *
  * Law: the CDC batch holds AT MOST ONE row per key (pre-compact a
  * raw feed with `Upsert.latestByKey` — enforced here by contract,
  * not a silent dedup that could hide feed bugs): op `D` removes the
  * key, any other op replaces-or-inserts the row wholesale, keys
  * absent from the feed pass through untouched.
  *
  * Shape at 100 TB: ONE full-outer equi-join on the key — both sides
  * shuffle-partitioned by key, AQE broadcasts a small CDC batch (the
  * common case: a day's changes vs years of table); row payloads ride
  * as single struct columns so the join schema stays two columns wide
  * regardless of table width. No driver data, no per-row lookups —
  * this is what the reference's row-at-a-time cursor loop becomes
  * when set-based.
  */
object Merge {

  def applyCdc(target: DataFrame, cdc: DataFrame, keys: Seq[String],
               opCol: String): DataFrame = {
    val dataCols = target.columns.toSeq
    require(keys.nonEmpty && keys.forall(dataCols.contains),
      s"keys ${keys.mkString(",")} must be target columns")
    require(cdc.columns.toSet == (dataCols :+ opCol).toSet,
      s"cdc must carry exactly the target schema plus '$opCol'; got " +
        cdc.columns.mkString(","))
    require(!dataCols.contains("_t") && !dataCols.contains("_s") &&
      !dataCols.contains("_op"), "column names _t/_s/_op are reserved")
    val t = target.select(
      keys.map(col) :+ struct(dataCols.map(col): _*).as("_t"): _*)
    val s = cdc.select(
      keys.map(col) ++ Seq(col(opCol).as("_op"),
        struct(dataCols.map(col): _*).as("_s")): _*)
    t.join(s, keys, "full_outer")
      .filter(col("_op").isNull || col("_op") =!= "D")
      .select(when(col("_op").isNotNull, col("_s"))
        .otherwise(col("_t")).as("_r"))
      .select(dataCols.map(c => col(s"_r.$c")): _*)
  }
}
