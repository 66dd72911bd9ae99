package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** S9 — schema management/repair, the engine-side analogue of the
  * reference's DDL maintenance (`CREATE TABLE IF NOT EXISTS` +
  * ALTER-based repair when a column's declared type can't hold the
  * data — details.py:169–204, Financilas.py:38–66).
  *
  * Under schema-on-write parquet there is no ALTER: repair happens by
  * CONFORMING frames to the declared schema at the write (or read)
  * boundary —
  *  - a column the target declares but the frame lacks → added as
  *    typed nulls (the ALTER ADD COLUMN case);
  *  - a column whose type drifted → `try_cast` to the declared type,
  *    unrepresentable values degrading to null rather than aborting
  *    the load (the reference's re-type repair, errno 1170 path);
  *  - a column the target doesn't declare → dropped (never silently
  *    carried into a table whose readers don't expect it).
  * Column order follows the target schema, so conformed writes append
  * cleanly to existing tables at any scale — the operation is a pure
  * projection (no shuffle, codegen'd casts).
  */
object SchemaRepair {

  def conform(df: DataFrame, target: StructType): DataFrame =
    df.select(target.fields.map { f =>
      if (df.columns.contains(f.name))
        col(f.name).try_cast(f.dataType.sql).as(f.name)
      else lit(null).cast(f.dataType).as(f.name)
    }.toIndexedSeq: _*)

  /** True when a frame already matches the target names/types in order
    * (nullability is write-compatible in parquet; ignored).
    */
  def conforms(df: DataFrame, target: StructType): Boolean =
    df.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
      target.fields.map(f => (f.name, f.dataType)).toSeq
}
