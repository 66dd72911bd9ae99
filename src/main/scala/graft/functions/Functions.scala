package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Scalar function toolkit — every reference scalar op (SURVEY.md §2.8)
  * re-expressed as codegen-friendly built-in Column compositions. No
  * black-box UDFs: keeping these as expression trees preserves Catalyst
  * constant folding, null propagation, and whole-stage codegen — which is
  * what makes them free at 100 TB.
  *
  * Reference sites cited per function (files under /root/reference/).
  */
object Functions {

  /** P8 — NaN/±Inf → null (reference: details.py:91–101,
    * Financilas.py:101–102, Summary.py:193–196). Spark keeps NaN in
    * doubles; the reference's MySQL sink cannot, so parity requires the
    * guard at ingest.
    */
  def nanToNull(c: Column): Column =
    when(isnan(c) || c === Double.PositiveInfinity || c === Double.NegativeInfinity, lit(null))
      .otherwise(c)

  /** F2 — whitespace collapse (Summary.py:110–114). */
  def collapseWs(c: Column): Column = trim(regexp_replace(c, "\\s+", " "))

  /** Python-truthiness or-chain (`a or b or c`): an operand falls through
    * when null OR empty string — plain `coalesce` only skips nulls, which
    * diverges from every reference coalesce site (e.g. Summary.py:154–173
    * `info.get("sector") or info.get("sectorDisp")`). Returns the last
    * operand verbatim when all are falsy, exactly like Python.
    */
  def pyOr(cs: Column*): Column =
    cs.reduceRight((a, b) => when(a.isNull || a === "", b).otherwise(a))

  /** F3 — clean_text, faithful to Summary.py:110–115: falsy input
    * (null/"") → null; otherwise strip + whitespace-collapse + cap at
    * 200,000 chars. NOTE a whitespace-only input collapses to "" and is
    * RETURNED as "" (not null) — the reference checks falsiness before
    * cleaning, not after.
    */
  def cleanText(c: Column): Column =
    when(c.isNull || c === "", lit(null))
      .otherwise(substring(collapseWs(c), 1, 200000))

  /** F5 — founded year from a business summary:
    * `(?i)\bfounded in (\d{4})\b` → int (Summary.py:118,126–131).
    */
  def foundedYear(c: Column): Column = {
    val m = regexp_extract(c, "(?i)\\bfounded in (\\d{4})\\b", 1)
    when(m === "", lit(null)).otherwise(m).cast("int")
  }

  /** F6 — former company name: `(?i)\bformerly known as ([^.,;]+)`
    * (Summary.py:119,132–135); whitespace-collapsed like the reference's
    * post-processing.
    */
  def formerName(c: Column): Column = {
    val m = collapseWs(regexp_extract(c, "(?i)\\bformerly known as ([^.,;]+)", 1))
    when(m === "", lit(null)).otherwise(m)
  }

  /** F7 — HQ location: `(?i)\bheadquartered in ([^.]+?)(?:\.|$)` then
    * comma-split into (city, state, country). 1 part → city only;
    * 2 parts → city, country; 3+ → city, state, country=re-joined tail
    * (Summary.py:120,137–146).
    */
  def hqParts(c: Column): Column = {
    val loc = collapseWs(regexp_extract(c, "(?i)\\bheadquartered in ([^.]*?)(?:\\.|$)", 1))
    val parts = transform(split(loc, ","), p => trim(p))
    val n = size(parts)
    val city = when(n >= 1 && loc =!= "", element_at(parts, 1))
    val state = when(n >= 3, element_at(parts, 2))
    val country = when(n === 2, element_at(parts, 2))
      .when(n >= 3, array_join(slice(parts, 3, 1000), ", "))
    struct(city.as("hq_city"), state.as("hq_state"), country.as("hq_country"))
  }

  /** F8 — employees: strip non-digits, cast to int (Summary.py:186–198).
    * "1,200" → 1200; "" / all-garbage → null. try_cast, not cast: the
    * reference wraps the conversion in try/except → None, and under
    * Spark's default ANSI mode a digit string that overflows INT would
    * otherwise throw and kill the whole job.
    */
  def digitsToInt(c: Column): Column = {
    val d = regexp_replace(c.cast("string"), "[^0-9]", "")
    when(d === "", lit(null)).otherwise(d).try_cast("int")
  }

  /** F8, type-aware (Summary.py:186–198): the reference branches on the
    * JSON type of fullTimeEmployees — numeric → `int()` truncation,
    * string → digit-strip. Our schema reads the field as string (JSON
    * numbers keep their token text), so branch on numeric shape:
    * "1200.0" → 1200 (truncate), "1,200" → 1200 (strip), garbage → null.
    * The numeric-shape regex covers every JSON number token — sign and
    * exponent forms included — so "-5" → -5 and "1.2e3" → 1200 exactly
    * like Python's int() on the parsed number (not a digit-strip).
    */
  def employeesToInt(c: Column): Column =
    when(c.rlike("^-?[0-9]+(\\.[0-9]+)?([eE][+-]?[0-9]+)?$"),
      // try_cast on the int step: an exponent form can overflow to ±Inf
      // and ANSI double→int would throw (reference: except → None)
      c.cast("double").try_cast("int"))
      .otherwise(digitsToInt(c))

  /** F12 — date parse with never-throw fallback
    * (Financilas.py:86–92): take first 10 chars, parse yyyy-MM-dd,
    * null on failure (caller filters). try_to_date, not to_date: under
    * Spark's default ANSI mode a malformed date string would otherwise
    * throw — the reference skips the row and continues.
    */
  def dateFromPrefix(c: Column): Column =
    try_to_date(substring(c, 1, 10), "yyyy-MM-dd")

  /** F14 — fiscal period: yearly rows pin to 4, else calendar quarter
    * (Financilas.py:68–69,94).
    */
  def periodOf(freq: Column, date: Column): Column =
    when(freq === "yearly", lit(4)).otherwise(quarter(date))

  /** F18 — market-cap string → double USD. Inputs like "32.42B",
    * "760.88M", "297.82K", "3,371.44B" (comma thousands-separators above
    * 1T — main.py:179,208 scrapes these; the reference stores but never
    * parses them, this is the engine's completion of that latent column).
    * Unknown suffix / garbage → null.
    */
  def parseMarketCap(c: Column): Column = {
    val s = upper(trim(regexp_replace(c, ",", "")))
    val num = regexp_extract(s, "^([0-9]*\\.?[0-9]+)([KMBT]?)$", 1)
    val suffix = regexp_extract(s, "^([0-9]*\\.?[0-9]+)([KMBT]?)$", 2)
    val mult = when(suffix === "K", 1e3)
      .when(suffix === "M", 1e6)
      .when(suffix === "B", 1e9)
      .when(suffix === "T", 1e12)
      .otherwise(1.0)
    when(num === "", lit(null)).otherwise(num.cast("double") * mult)
  }

  /** Decimal-exact money arithmetic: the testdata money columns are
    * 2-decimal values stored as doubles. Reconstructing the exact decimal
    * before aggregating makes sums order-independent (decimal addition is
    * exact), so results are reproducible across engines and across
    * cluster sizes — double summation order would drift by ~1 unit at
    * 100 TB row counts.
    */
  def money(c: Column): Column = c.cast(DecimalType(18, 2))

  /** Exact sum of a 2-dp money column, returned as double (exact decimal
    * sum → one rounding at the end → bit-identical everywhere).
    */
  def sumMoney(c: Column): Column = sum(money(c)).cast("double")

  /** Dot product of two double arrays — native codegen'd expression
    * (graft.plans.DotProductExpr), same left-to-right IEEE fold as the
    * previous aggregate+zip_with composition (higher-order functions
    * are CodegenFallback: an interpreted lambda per element plus an
    * intermediate array per row — too slow on the pair-scoring path).
    */
  def dotProduct(a: Column, b: Column): Column =
    graft.plans.VectorExprs.vecDot(a, b)

  /** L2 norm of a double array (native, same fold contract as above). */
  def l2Norm(a: Column): Column =
    graft.plans.VectorExprs.vecL2Norm(a)

  /** Cosine similarity of two double arrays (null-safe on zero norms). */
  def cosineSim(a: Column, b: Column): Column = {
    val denom = l2Norm(a) * l2Norm(b)
    when(denom === 0.0, lit(null)).otherwise(dotProduct(a, b) / denom)
  }

  /** Cast an array<float> to array<double> for exact, engine-portable
    * arithmetic (float→double widening is exact).
    */
  def toDoubleArray(c: Column): Column = transform(c, x => x.cast("double"))
}
