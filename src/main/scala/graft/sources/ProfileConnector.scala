package graft.sources

import java.time.LocalDateTime
import java.time.ZoneOffset
import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.{NamedReference, Transform}
import org.apache.spark.sql.connector.expressions.aggregate.{AggregateFunc, Aggregation, Count, CountStar, Max, Min}
import org.apache.spark.sql.connector.expressions.{SortDirection, SortOrder}
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownAggregates, SupportsPushDownFilters, SupportsPushDownLimit, SupportsPushDownRequiredColumns, SupportsPushDownTopN}
import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThan, GreaterThanOrEqual, In, IsNotNull, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types.{LongType, StringType, StructType, TimestampType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** S4 — the live-connector SHAPE as a real DataSource V2 `TableProvider`
  * (the reference's rate-limited per-symbol Yahoo fetch,
  * details.py:129–154 + 277–305, re-expressed as a first-class Spark
  * source). The sandbox has no network, so the "remote service" is the
  * deterministic RawZoneGen payload law — but every CONNECTOR concern
  * is the real thing:
  *
  *  - **partition planning**: the symbol universe splits into
  *    `numPartitions` contiguous ranges, one `InputPartition` each —
  *    the fetch parallelizes across executors instead of the
  *    reference's single sequential loop;
  *  - **per-partition rate limiting**: each reader paces itself with a
  *    token-interval clock (`maxPerSecond` option, the connector twin
  *    of details.py:27 `SLEEP_SECONDS_BETWEEN_CALLS`) — aggregate
  *    throughput = partitions × rate, the polite-crawl contract a real
  *    API connector must keep PER CONNECTION, not per cluster;
  *  - **column pruning** (`SupportsPushDownRequiredColumns`): a scan
  *    that only needs `symbol`/`loaded_at` never builds the payload —
  *    exactly the q54 touched-bucket probe pattern, where the key
  *    universe is read without paying for the document body;
  *  - **filter pushdown** (`SupportsPushDownFilters`): symbol
  *    equality/IN/range predicates prune the PARTITION PLAN — the
  *    connector fetches only matching symbols, the way
  *    details.py:139–153 fetches per symbol instead of crawling the
  *    universe. The symbol key is strictly increasing in the index
  *    (fixed-width zero pad), so range bounds binary-search to index
  *    bounds EXACTLY; non-matching symbols are never fetched AND
  *    their payloads never built (q187 proves both). Because the
  *    inversion is exact, accepted filters are CONSUMED (no residual
  *    re-evaluation above the scan) — the precision that also
  *    unlocks aggregate pushdown; shapes the law cannot invert stay
  *    residuals and Spark evaluates them above;
  *  - **aggregate pushdown** (`SupportsPushDownAggregates`): a global
  *    COUNT / MIN(symbol) / MAX(symbol) — with or without pushed
  *    symbol filters — folds into ARITHMETIC on the partition plan:
  *    the matching index set is known in closed form, so its size and
  *    boundary symbols are computed without visiting a single symbol,
  *    building a payload, or spending a rate-limit token (q195). The
  *    scan emits one pre-aggregated row under PARTIAL semantics
  *    (Spark's final aggregate merges it — the JDBC-source contract,
  *    safe under any future multi-partition split);
  *  - **limit / top-N pushdown** (`SupportsPushDownLimit` /
  *    `SupportsPushDownTopN`): a `LIMIT k` — the reference's own
  *    point-fetch shape, `Financilas.py:142–144` — chunks the
  *    partition plan to k symbols after the pushed filters, and
  *    `ORDER BY symbol [DESC] LIMIT k` slices the first/last k of the
  *    matching index range (exact: the index order IS the symbol
  *    order). Partial semantics again: Spark keeps its Limit/Sort
  *    above, the connector only stops fetching what the query will
  *    drop (q201).
  *
  * Usage:
  * {{{
  *   spark.read.format(classOf[ProfileConnector].getName)
  *     .option("symbols", "550")        // universe size
  *     .option("numPartitions", "8")    // fetch parallelism
  *     .option("maxPerSecond", "0")     // 0 = unthrottled (tests)
  *     .load()                          // → symbol, payload, loaded_at
  * }}}
  *
  * The emitted rows follow RawZoneGen's fresh-generation law value-for-
  * value (JSON key order and number formatting are irrelevant once
  * `from_json` parses by schema), so `Financials.normalize` over this
  * source converges to the same fact table as the staged raw zone and
  * the DuckDB regenerate-from-law oracle.
  */
class ProfileConnector extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    ProfileConnector.Schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new ProfileConnector.ProfileTable
}

object ProfileConnector {

  val Schema: StructType = new StructType()
    .add("symbol", "string", nullable = false)
    .add("payload", "string", nullable = false)
    .add("loaded_at", TimestampType, nullable = false)

  /** Payload builds actually performed (per JVM) — lets tests assert
    * that a pruned scan never pays for the document body. Executor-side
    * in general; in local mode the same JVM, which is all the test
    * needs.
    */
  val payloadBuilds = new java.util.concurrent.atomic.AtomicLong(0L)

  private[sources] class ProfileTable extends Table with SupportsRead {
    override def name(): String = "graft_profiles"
    override def schema(): StructType = Schema
    override def capabilities(): util.Set[TableCapability] =
      Set(TableCapability.BATCH_READ).asJava
    override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
      new ProfileScanBuilder(
        options.getInt("symbols", 10),
        options.getInt("numPartitions", 4),
        options.getDouble("maxPerSecond", 0.0))
  }

  private class ProfileScanBuilder(symbols: Int, parts: Int,
                                   maxPerSecond: Double)
      extends ScanBuilder with SupportsPushDownRequiredColumns
      with SupportsPushDownFilters with SupportsPushDownAggregates
      with SupportsPushDownLimit with SupportsPushDownTopN {
    private var required: StructType = Schema
    private var accepted: Array[Filter] = Array.empty
    private var aggregated: Option[Aggregation] = None
    private var pushedLimit: Option[Int] = None
    private var limitDesc: Boolean = false
    override def pruneColumns(requiredSchema: StructType): Unit =
      required = requiredSchema
    /** Limit pushdown (`SupportsPushDownLimit`) — the reference's own
      * point-fetch shape (`LIMIT 1` after a key predicate,
      * Financilas.py:142–144): a pushed LIMIT k CHUNKS the partition
      * plan to the first k matching indices, so the connector plans —
      * and fetches — at most k symbols however wide the filtered range
      * is. PARTIAL semantics on purpose (`isPartiallyPushed` stays
      * true): Spark keeps its own Limit above the scan, so correctness
      * never rides on the connector's row arithmetic — the same
      * contract as the partial aggregate push.
      */
    override def pushLimit(l: Int): Boolean = {
      pushedLimit = Some(l)
      true
    }
    // both pushdown traits default this true; Scala wants the diamond
    // resolved explicitly — and true IS the contract here (partial)
    override def isPartiallyPushed(): Boolean = true
    /** Top-N pushdown (`SupportsPushDownTopN`) — ORDER BY symbol
      * LIMIT k: the index law emits symbols in strictly increasing
      * order, so the top-k ascending is the FIRST k matching indices
      * and the top-k descending the LAST k — both closed-form slices
      * of the partition plan, no symbol outside the slice ever
      * planned. Only the bare `symbol` ordering is invertible; any
      * other sort expression returns false and runs unpushed.
      */
    override def pushTopN(orders: Array[SortOrder], l: Int): Boolean = {
      val ok = orders.length == 1 && isSymbolRef(orders(0).expression())
      if (ok) {
        pushedLimit = Some(l)
        limitDesc = orders(0).direction() == SortDirection.DESCENDING
      }
      ok
    }
    override def pushFilters(filters: Array[Filter]): Array[Filter] = {
      accepted = filters.filter(supportsPushdown)
      // accepted filters are CONSUMED (not returned as residuals):
      // the index-law inversion is EXACT for every pushable shape
      // (strictly increasing fixed-width ASCII symbols — binary
      // search on a monotone predicate, regex-validated point
      // lookups), so the scan returns precisely the matching rows
      // and re-evaluation above would be pure overhead. Consumption
      // is also what unlocks aggregate pushdown: Spark only pushes
      // an Aggregate whose child is the bare scan — a residual
      // Filter in between vetoes it. Anything the law cannot invert
      // stays a residual and Spark evaluates it above the scan.
      filters.filterNot(supportsPushdown)
    }
    override def pushedFilters(): Array[Filter] = accepted
    /** Aggregate pushdown (`SupportsPushDownAggregates`) — the DSv2
      * mirror of q160's JDBC pushed aggregates: a global
      * COUNT / MIN(symbol) / MAX(symbol) over the (filter-pruned)
      * symbol universe folds into ARITHMETIC on the partition plan —
      * the count is the size of the matching index set and the
      * min/max are its boundary symbols, so the "fetch" costs O(1):
      * no symbol is visited, no payload built, no rate-limit token
      * spent (spec + q195 prove all three). PARTIAL-pushdown
      * semantics on purpose (`supportCompletePushDown` stays false):
      * the scan emits one pre-aggregated row and Spark's final
      * aggregate merges it — the safe contract under any future
      * multi-partition split, same rule as the JDBC source. Grouped
      * or exotic aggregates stay un-pushed (return false) and run
      * the ordinary scan.
      */
    override def pushAggregation(agg: Aggregation): Boolean = {
      val ok = agg.groupByExpressions.isEmpty &&
        agg.aggregateExpressions.nonEmpty &&
        agg.aggregateExpressions.forall {
          case _: CountStar => true
          case c: Count     => !c.isDistinct && isSymbolRef(c.column)
          case m: Min       => isSymbolRef(m.column)
          case m: Max       => isSymbolRef(m.column)
          case _            => false
        }
      if (ok) aggregated = Some(agg)
      ok
    }
    override def build(): Scan =
      new ProfileScan(symbols, parts, maxPerSecond, required, accepted,
        aggregated, pushedLimit, limitDesc)
  }

  private def isSymbolRef(
      e: org.apache.spark.sql.connector.expressions.Expression): Boolean =
    e match {
      case r: NamedReference =>
        r.fieldNames.length == 1 && r.fieldNames()(0) == "symbol"
      case _ => false
    }

  /** Pushable = symbol predicates the index law inverts exactly. The
    * domain values are pure-ASCII fixed-width ("S%05d"), so Scala's
    * UTF-16 compare and Spark's UTF8String byte compare agree on every
    * (symbol, bound) pair — the first differing position pits an ASCII
    * char against anything, and ASCII orders below every non-ASCII
    * code unit in both encodings.
    */
  private def supportsPushdown(f: Filter): Boolean = f match {
    case EqualTo("symbol", _: String)            => true
    case In("symbol", _)                         => true
    case GreaterThan("symbol", _: String)        => true
    case GreaterThanOrEqual("symbol", _: String) => true
    case LessThan("symbol", _: String)           => true
    case LessThanOrEqual("symbol", _: String)    => true
    case IsNotNull("symbol")                     => true // non-nullable: no-op
    case _                                       => false
  }

  private val SymbolRe = "^S([0-9]{5})$".r

  private class ProfileScan(symbols: Int, parts: Int, maxPerSecond: Double,
                            required: StructType,
                            filters: Array[Filter],
                            aggregation: Option[Aggregation] = None,
                            limit: Option[Int] = None,
                            limitDesc: Boolean = false)
      extends Scan with Batch {
    private def aggSchema(agg: Aggregation): StructType =
      agg.aggregateExpressions.zipWithIndex.foldLeft(new StructType()) {
        case (st, (f, i)) => f match {
          case _: CountStar | _: Count =>
            st.add(s"agg_$i", LongType, nullable = false)
          case _ => st.add(s"agg_$i", StringType, nullable = true)
        }
      }
    override def readSchema(): StructType =
      aggregation.map(aggSchema).getOrElse(required)
    override def toBatch: Batch = this
    // surfaces the accepted filters (and any pushed aggregation) in
    // EXPLAIN (BatchScan renders the scan description) — the q160
    // "prove it from the plan" discipline
    override def description(): String =
      s"graft_profiles PushedFilters: [${filters.mkString(", ")}]" +
        aggregation.fold("")(a =>
          s", PushedAggregates: [${a.aggregateExpressions.mkString(", ")}]") +
        limit.fold("")(l =>
          if (limitDesc) s", PushedTopN: [symbol DESC, $l]"
          else s", PushedLimit: $l")

    /** First index in [0, symbols] where the monotone predicate holds. */
    private def firstIndexWhere(p: Int => Boolean): Int = {
      var lo = 0
      var hi = symbols
      while (lo < hi) {
        val mid = (lo + hi) >>> 1
        if (p(mid)) hi = mid else lo = mid + 1
      }
      lo
    }

    private def parseSymbol(v: String): Option[Int] = v match {
      case SymbolRe(d) =>
        val i = d.toInt
        if (i < symbols) Some(i) else None
      case _ => None
    }

    /** Fold the accepted filters into index bounds (+ an explicit set
      * for equality/IN) — exact because symbol(i) is strictly
      * increasing in i.
      */
    private def filterBounds(): (Int, Int, Option[Set[Int]]) = {
      var lo = 0
      var hi = symbols
      var eq: Option[Set[Int]] = None
      def intersectEq(s: Set[Int]): Unit =
        eq = Some(eq.fold(s)(_ intersect s))
      filters.foreach {
        case EqualTo("symbol", v: String) =>
          intersectEq(parseSymbol(v).toSet)
        case In("symbol", vs) =>
          intersectEq(vs.collect { case s: String => parseSymbol(s) }
            .flatten.toSet)
        case GreaterThan("symbol", v: String) =>
          lo = math.max(lo, firstIndexWhere(Profiles.symbol(_) > v))
        case GreaterThanOrEqual("symbol", v: String) =>
          lo = math.max(lo, firstIndexWhere(Profiles.symbol(_) >= v))
        case LessThan("symbol", v: String) =>
          hi = math.min(hi, firstIndexWhere(Profiles.symbol(_) >= v))
        case LessThanOrEqual("symbol", v: String) =>
          hi = math.min(hi, firstIndexWhere(Profiles.symbol(_) > v))
        case _ => ()
      }
      (lo, hi, eq)
    }

    // a pushed aggregate needs no fetch at all: the matching index
    // set is known arithmetically, so its count and boundary symbols
    // ARE the answer — one pre-aggregated row, zero symbols visited,
    // zero payloads built, zero rate-limit tokens
    private def planAggregated(agg: Aggregation, lo: Int, hi: Int,
                               eq: Option[Set[Int]]): Array[InputPartition] = {
      val idx: IndexedSeq[Int] = eq match {
        case Some(set) => set.filter(i => i >= lo && i < hi).toArray.sorted
        case None      => if (hi <= lo) IndexedSeq.empty
                          else lo until hi
      }
      Array(AggResult(idx.length.toLong,
        idx.headOption.map(Profiles.symbol),
        idx.lastOption.map(Profiles.symbol),
        agg.aggregateExpressions.map {
          case _: CountStar | _: Count => 'c'
          case _: Min                  => 'n'
          case _                       => 'x'
        }.toIndexedSeq))
    }

    override def planInputPartitions(): Array[InputPartition] = {
      val (lo, hi, eq) = filterBounds()
      aggregation match {
        case Some(agg) => planAggregated(agg, lo, hi, eq)
        case None      => planRows(lo, hi, eq)
      }
    }

    private def planRows(lo0: Int, hi0: Int,
                         eq: Option[Set[Int]]): Array[InputPartition] = {
      eq match {
        case Some(set) =>
          // point fetches: chunk the surviving sorted index list —
          // sliced to the pushed limit first (top-k asc = first k,
          // desc = last k; exact because the index order IS the
          // symbol order)
          val all = set.filter(i => i >= lo0 && i < hi0).toArray.sorted
          val idx = limit.fold(all)(l =>
            if (limitDesc) all.takeRight(l) else all.take(l))
          if (idx.isEmpty) Array.empty
          else {
            val n = math.max(1, math.min(parts, idx.length))
            idx.grouped((idx.length + n - 1) / n)
              .map(g => SymbolList(g.toIndexedSeq): InputPartition).toArray
          }
        case None =>
          // a pushed limit shrinks the RANGE itself before partitioning
          val lo = limit.fold(lo0)(l =>
            if (limitDesc) math.max(lo0, hi0 - l) else lo0)
          val hi = limit.fold(hi0)(l =>
            if (limitDesc) hi0 else math.min(hi0, lo0 + l))
          if (hi <= lo) Array.empty
          else {
            val span = hi - lo
            val n = math.max(1, math.min(parts, span))
            // contiguous ranges, remainder spread over the first partitions
            val base = span / n
            val extra = span % n
            val bounds = (0 to n).map(p => lo + p * base + math.min(p, extra))
            (0 until n)
              .map(p => SymbolRange(bounds(p), bounds(p + 1)): InputPartition)
              .toArray
          }
      }
    }
    override def createReaderFactory(): PartitionReaderFactory =
      new ProfileReaderFactory(maxPerSecond, required)
  }

  private case class SymbolRange(start: Int, end: Int) extends InputPartition
  private case class SymbolList(indices: IndexedSeq[Int]) extends InputPartition

  /** One pre-aggregated row: the count plus the boundary symbols of the
    * matching index set, with `shape` recording (positionally) which
    * pushed function each output column feeds — 'c' count, 'n' min,
    * anything else max.
    */
  private case class AggResult(count: Long, min: Option[String],
                               max: Option[String],
                               shape: IndexedSeq[Char]) extends InputPartition

  private class ProfileReaderFactory(maxPerSecond: Double,
                                     required: StructType)
      extends PartitionReaderFactory {
    override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
      partition match {
        case r: SymbolRange =>
          new ProfileReader(r.start until r.end, maxPerSecond, required)
        case l: SymbolList =>
          new ProfileReader(l.indices, maxPerSecond, required)
        case a: AggResult =>
          new PartitionReader[InternalRow] {
            private var emitted = false
            override def next(): Boolean =
              if (emitted) false else { emitted = true; true }
            override def get(): InternalRow = InternalRow.fromSeq(
              a.shape.map {
                case 'c' => a.count
                case 'n' => a.min.map(UTF8String.fromString).orNull
                case _   => a.max.map(UTF8String.fromString).orNull
              })
            override def close(): Unit = ()
          }
      }
  }

  private class ProfileReader(idxs: IndexedSeq[Int], maxPerSecond: Double,
                              required: StructType)
      extends PartitionReader[InternalRow] {
    private var j = -1
    // token-interval pacing: one permit every 1/rate seconds, measured
    // against a monotonic clock — the same "sleep the remainder" shape
    // as the reference's per-call sleep, but per PARTITION, so total
    // throughput scales with the fetch parallelism
    private val intervalNanos =
      if (maxPerSecond > 0) (1e9 / maxPerSecond).toLong else 0L
    private var nextPermit = System.nanoTime()

    override def next(): Boolean = {
      j += 1
      if (j >= idxs.length) return false
      if (intervalNanos > 0) {
        val wait = nextPermit - System.nanoTime()
        if (wait > 0) Thread.sleep(wait / 1000000L, (wait % 1000000L).toInt)
        nextPermit = math.max(nextPermit + intervalNanos, System.nanoTime())
      }
      true
    }

    override def get(): InternalRow = {
      val i = idxs(j)
      val values = required.fieldNames.map {
        case "symbol"    => UTF8String.fromString(Profiles.symbol(i))
        case "payload"   =>
          payloadBuilds.incrementAndGet()
          UTF8String.fromString(Profiles.payloadJson(i))
        case "loaded_at" => Profiles.loadedAtMicros(i)
      }
      InternalRow.fromSeq(values.toIndexedSeq)
    }

    override def close(): Unit = ()
  }
}

/** The RawZoneGen fresh-generation law in plain Scala — the "remote
  * service" this sandboxed connector fetches from. Value-for-value
  * identical to RawZoneGen.payloads(stale = false) (leaf law, info
  * fields, loaded-at parity), so the regenerate-from-law oracles apply
  * unchanged to connector reads.
  */
private[sources] object Profiles {
  import graft.ingest.RawZoneGen.{MetricsPerStatement, QuarterlyDates, Statements, YearlyDates}

  def symbol(i: Int): String = f"S$i%05d"

  def loadedAtMicros(i: Int): Long =
    LocalDateTime.parse(s"2025-08-${15 + i % 2}T00:00:00")
      .toEpochSecond(ZoneOffset.UTC) * 1000000L

  private val Currencies = Array("USD", "EUR", "JPY", "GBP")
  private val Sectors =
    Array("Technology", "Energy", "Healthcare", "Financials", "Utilities")

  private def leaf(i: Int, s: Int, f: Int, d: Int, m: Int): Option[Double] = {
    val k = i.toLong * 31 + s * 17 + f * 13 + d * 7 + m * 3
    if (k % 97 == 0) None
    else Some((k % 1000).toDouble + (k % 7) * 0.25)
  }

  /** Minimal JSON writer for the fixed payload shape: every string in
    * the law is quote/backslash/control-free, so escaping is a no-op by
    * construction (asserted cheaply below in case the law ever grows).
    */
  private def jstr(sb: StringBuilder, s: String): Unit = {
    require(s.forall(c => c >= ' ' && c != '"' && c != '\\'),
      s"payload string needs escaping: $s")
    sb.append('"').append(s).append('"'): Unit
  }

  private def pane(sb: StringBuilder, i: Int, s: Int, f: Int,
                   dates: Seq[String]): Unit = {
    sb.append('{')
    dates.zipWithIndex.foreach { case (dt, d) =>
      if (d > 0) sb.append(',')
      jstr(sb, dt); sb.append(":{")
      (0 until MetricsPerStatement).foreach { m =>
        if (m > 0) sb.append(',')
        jstr(sb, f"${Statements(s)._1}_M$m%02d"); sb.append(':')
        leaf(i, s, f, d, m) match {
          case Some(v) => sb.append(v): Unit
          case None    => sb.append("null"): Unit
        }
      }
      sb.append('}'): Unit
    }
    sb.append('}'): Unit
  }

  def payloadJson(i: Int): String = {
    val sb = new StringBuilder(64 * 1024)
    val former =
      if (i % 3 == 0) s", formerly known as Old Synth $i," else ""
    val hq = (i % 4) match {
      case 0 => " It is headquartered in Austin, Texas, United States."
      case 1 => " It is headquartered in Paris, France."
      case 2 => " It is headquartered in Singapore."
      case _ => ""
    }
    val summary =
      s"Synth Corp $i$former was founded in ${1900 + i % 120}.$hq"
    sb.append("{\"info\":{")
    val info = Seq(
      "symbol" -> symbol(i),
      "longName" -> s"Synth Corp $i",
      "currency" -> Currencies(i % 4),
      "financialCurrency" -> "USD",
      "fullTimeEmployees" -> ((i.toLong * 37) % 90000 + 10).toString,
      "sector" -> Sectors(i % 5),
      "industry" -> s"Industry ${i % 7}",
      "website" -> s"https://synth$i.example",
      "longBusinessSummary" -> summary)
    info.zipWithIndex.foreach { case ((k, v), j) =>
      if (j > 0) sb.append(',')
      jstr(sb, k); sb.append(':'); jstr(sb, v)
    }
    sb.append('}')
    Statements.zipWithIndex.foreach { case ((_, field), s) =>
      sb.append(','); jstr(sb, field); sb.append(":{\"yearly\":")
      pane(sb, i, s, 0, YearlyDates)
      sb.append(",\"quarterly\":")
      pane(sb, i, s, 1, QuarterlyDates)
      sb.append('}'): Unit
    }
    sb.append('}')
    sb.toString
  }
}
