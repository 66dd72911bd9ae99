package graft.sources

import org.apache.spark.sql.DataFrame

/** O5 — head preview: the reference prints `df.head(10)` after the
  * scrape (main.py:323). Engine analogue of `df.show(n)`, returned as a
  * STRING instead of printed, so library callers (notebooks, loggers,
  * the driver) decide where it goes. Cost discipline: exactly one
  * `take(n+1)` job — n rows to render plus one row to know whether a
  * "more rows" footer is honest; never a full count, never a collect.
  */
object Display {

  def preview(df: DataFrame, n: Int = 10, truncate: Int = 20): String = {
    val header = df.columns.toSeq
    val taken = df.take(n + 1)
    val hasMore = taken.length > n
    val rows = taken.take(n).toSeq.map(_.toSeq.map { v =>
      val s = if (v == null) "NULL" else v.toString
      if (truncate > 0 && s.length > truncate) s.take(truncate - 3) + "..."
      else s
    })
    val widths = header.indices.map { i =>
      (header(i).length +: rows.map(_(i).length)).max
    }
    val rule = widths.map("-" * _).mkString("+", "+", "+")
    def fmt(cells: Seq[String]) =
      cells.zip(widths).map { case (c, w) => c.padTo(w, ' ') }
        .mkString("|", "|", "|")
    val body = Seq(rule, fmt(header), rule) ++ rows.map(fmt) :+ rule
    val footer = if (hasMore) Seq(s"only showing top $n rows") else Seq.empty
    (body ++ footer).mkString("\n")
  }
}
