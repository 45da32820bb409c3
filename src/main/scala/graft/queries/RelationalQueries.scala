package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables
import graft.ops.OracleSql.roundD

/** The relational operator surface (SURVEY §2.2): the reference delegates
  * all relational execution to DuckDB SQL, so the capability contract is
  * "ANSI SQL as executed by Spark SQL". Each query here exercises one
  * operator family end-to-end and carries a DuckDB oracle.
  *
  * Determinism rules (the driver hash-compares results):
  *  - every query is fully ordered by a unique key prefix;
  *  - every floating-point aggregate is rounded (sum→2dp, avg→4dp) so
  *    cross-engine accumulation-order ulps can't flip the hash;
  *  - every computed column is aliased identically in Spark and SQL.
  *
  * Scale notes (100 TB): all shapes below are shuffle-minimal — partial
  * aggregation before exchange, top-k via TakeOrderedAndProject (no global
  * sort), dimension joins broadcastable (AQE decides from runtime sizes),
  * filters/projections push down to the parquet scan.
  */
object RelationalQueries {
  type Q = (SparkSession, String) => DataFrame

  // constants used inside the maps below MUST be declared before them:
  // a Scala object initializes vals in declaration order, and a forward
  // reference silently yields null/0 into the interpolated SQL
  /** q18's time-centering origin (2024-01-01T00:00:00Z in ns — the
    * testdata epoch; keeps centered spans exactly representable). */
  val StatsOriginNs = 1704067200000000000L

  private val q19Oracle =
    """SELECT event_type,
      |  string_agg(event_id, ',' ORDER BY event_id) AS ids,
      |  count(*) AS n
      |FROM events WHERE event_id < 200
      |GROUP BY event_type ORDER BY event_type""".stripMargin

  val queries: Map[String, Q] = Map(
    // ---- aggregate: TPC-H Q1 shape (partial agg → 6-group exchange) ----
    "q01_pricing_summary" -> ((s, dir) => {
      Tables.load(s, dir, "lineitem")
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          round(sum(col("l_quantity")), 2).as("sum_qty"),
          round(sum(col("l_extendedprice")), 2).as("sum_base"),
          round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("sum_disc"),
          round(avg(col("l_quantity")), 4).as("avg_qty"),
          count(lit(1)).as("cnt"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }),

    // ---- the BENCHMARK.md group-by/top-k shape (BASELINE.md) ----
    "q02_topk_groupby" -> ((s, dir) => {
      Tables.load(s, dir, "part")
        .groupBy(col("p_brand"), col("p_type"))
        .agg(count(lit(1)).as("c"), round(avg(col("p_retailprice"))).as("m"))
        .orderBy(col("c").desc, col("p_brand"), col("p_type"))
        .limit(10)
    }),

    // ---- multi-join + aggregate (revenue per nation) ----
    "q03_join_revenue" -> ((s, dir) => {
      val li = Tables.load(s, dir, "lineitem")
      val o = Tables.load(s, dir, "orders")
      val c = Tables.load(s, dir, "customer")
      val n = Tables.load(s, dir, "nation")
      li.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .join(n, col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(
          round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("revenue"),
          count(lit(1)).as("cnt"))
        .orderBy(col("n_name"))
    }),

    // ---- filter + projection (pushdown check: PushedFilters non-empty) ----
    "q04_filter_scan" -> ((s, dir) => {
      Tables.load(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1998-01-01").cast("timestamp")
          && col("l_discount") > 0.05 && col("l_quantity") < 25)
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    }),

    // ---- window functions: rank / row_number / running sum ----
    "q05_window_rank" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      Tables.load(s, dir, "orders")
        .select(
          col("o_custkey"), col("o_orderkey"),
          rank().over(w).as("rk"),
          row_number().over(w).as("rn"),
          round(sum(col("o_totalprice"))
            .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)), 2)
            .as("running"))
        .filter(col("rn") <= 3)
        .orderBy(col("o_custkey"), col("rn"))
    }),

    // ---- distinct aggregation ----
    "q06_distinct_agg" -> ((s, dir) => {
      Tables.load(s, dir, "orders")
        .agg(
          countDistinct(col("o_custkey")).as("n_cust"),
          countDistinct(col("o_orderpriority")).as("n_prio"),
          count(lit(1)).as("n"))
    }),

    // ---- scalar subquery (threshold computed from the same table) ----
    "q07_subquery_avg" -> ((s, dir) => {
      Tables.views(s, dir).sql(
        """SELECT o_orderkey, o_totalprice FROM orders
          |WHERE o_totalprice > (SELECT round(avg(o_totalprice), 2) FROM orders)
          |ORDER BY o_orderkey""".stripMargin)
    }),

    // ---- semi join (EXISTS) ----
    "q08_semijoin" -> ((s, dir) => {
      val c = Tables.load(s, dir, "customer")
      val o = Tables.load(s, dir, "orders").filter(col("o_totalprice") > 200000)
      c.join(o, col("c_custkey") === col("o_custkey"), "left_semi")
        .select("c_custkey", "c_name")
        .orderBy(col("c_custkey"))
    }),

    // ---- anti join (NOT EXISTS) ----
    "q09_antijoin" -> ((s, dir) => {
      val c = Tables.load(s, dir, "customer")
      val o = Tables.load(s, dir, "orders")
      c.join(o, col("c_custkey") === col("o_custkey"), "left_anti")
        .select("c_custkey", "c_acctbal")
        .orderBy(col("c_custkey"))
    }),

    // ---- set operations: INTERSECT / EXCEPT / UNION (distinct forms) ----
    "q10_setops" -> ((s, dir) => {
      val o = Tables.load(s, dir, "orders")
      val c = Tables.load(s, dir, "customer")
      val a = o.filter(col("o_orderstatus") === "F").select(col("o_custkey").as("k"))
      val b = o.filter(col("o_orderstatus") === "O").select(col("o_custkey").as("k"))
      val e = c.filter(col("c_acctbal") < 0).select(col("c_custkey").as("k"))
        .except(o.select(col("o_custkey").as("k")))
      a.intersect(b).union(e).distinct().orderBy(col("k"))
    }),

    // ---- rollup + grouping markers ----
    "q11_rollup" -> ((s, dir) => {
      val c = Tables.load(s, dir, "customer")
      val n = Tables.load(s, dir, "nation")
      val r = Tables.load(s, dir, "region")
      c.join(n, col("c_nationkey") === col("n_nationkey"))
        .join(r, col("n_regionkey") === col("r_regionkey"))
        .rollup(col("r_name"), col("n_name"))
        .agg(
          count(lit(1)).as("c"),
          grouping(col("r_name")).cast("int").as("gr"),
          grouping(col("n_name")).cast("int").as("gn"))
        .orderBy(col("r_name").asc_nulls_first, col("n_name").asc_nulls_first)
    }),

    // ---- scalar functions: string / case / conditional ----
    "q12_scalar_funcs" -> ((s, dir) => {
      Tables.load(s, dir, "orders")
        .select(
          col("o_orderkey"),
          upper(col("o_orderpriority")).as("prio_u"),
          substring(col("o_orderpriority"), 1, 1).as("st"),
          when(col("o_totalprice") > 100000, "big").otherwise("small").as("sz"),
          length(col("o_orderpriority")).as("plen"),
          concat(col("o_orderstatus"), lit("-"), col("o_orderpriority")).as("tag"),
          coalesce(nullif(col("o_orderstatus"), lit("O")), lit("X")).as("nf"))
        .orderBy(col("o_orderkey"))
    }),

    // ---- event-time bucketing (hour tumbling window over the stream table;
    //      ts is int64 ns — the reference's time model) ----
    "q13_time_buckets" -> ((s, dir) => {
      Tables.load(s, dir, "events")
        .groupBy(
          // FLOOR-divide (pmod device, review r10): the oracle's
          // date_trunc('hour') floors for pre-epoch timestamps while
          // DIV truncates toward zero — latent at test SFs, a contract
          // divergence regardless
          expr("((ts - pmod(ts, 3600000000000L)) DIV 3600000000000L)" +
            " * 3600000").as("bucket_ms"),
          col("event_type"))
        .agg(
          count(lit(1)).as("n"),
          round(sum(col("value")), 2).as("sum_v"),
          round(avg(col("value")), 4).as("avg_v"))
        .orderBy(col("bucket_ms"), col("event_type"))
    }),

    // ---- ClickHouse alias functions (graft.functions) ----
    "q14_ch_aliases" -> ((s, dir) => {
      Tables.views(s, dir).sql(
        """SELECT o_orderkey,
          |  toString(o_orderkey) AS k_str,
          |  toInt64(toString(o_orderkey)) AS k_rt,
          |  toInt64OrNull(o_orderstatus) AS st_null,
          |  toInt64OrZero(o_orderstatus) AS st_zero,
          |  toFloatOrZero(o_orderpriority) AS prio_f,
          |  match(o_orderpriority, '1%') AS m1
          |FROM orders ORDER BY o_orderkey""".stripMargin)
    }),

    // ---- epoch_ns time filter (the reference's canonical query shape:
    //      stored int64-ns column filtered by an epoch_ns(literal)) ----
    "q15_epoch_ns_filter" -> ((s, dir) => {
      Tables.views(s, dir).sql(
        s"""SELECT event_id, ${Tables.EventTsUsSql} AS ts_ns
          |FROM events
          |WHERE ts >= epoch_ns(TIMESTAMP '2024-01-15 00:00:00')
          |ORDER BY event_id""".stripMargin)
    }),

    // ---- JSON extraction over the props column (per-row JSON parse is
    //      the cost; loadSpread fans the single-file scan out — no sort:
    //      nothing downstream needs order (the driver's compare is
    //      order-insensitive), and a global sort bolted onto a map-only
    //      projection would be pure overhead at any scale) ----
    "q16_json_extract" -> ((s, dir) => {
      // from_json with an EXPLICIT schema (VERDICT r7 #4), not
      // get_json_object: the path-extract API re-tokenizes the whole
      // JSON per call (k calls = k parses at 100 TB), while from_json
      // parses once into a struct — the right shape for multi-key
      // extraction. The field stays STRING + cast (not LONG in the
      // schema): from_json's LongType treats a quoted "12" as malformed
      // → null, where the oracle's json_extract_string + CAST yields 12
      // — extract-as-string keeps the two engines value-identical for
      // every JSON value shape.
      // r14 extension (VERDICT r13 #4): the raw-preserving trio rides
      // the same scan — k_raw via DuckDB's own raw extractor
      // (json_extract of a NUMBER is its literal spelling on both
      // engines; only container/root slices could differ on interior
      // whitespace, so those stay spec-gated), k_type/root_type via a
      // name map from DuckDB's json_type to the CH enum names.
      Tables.loadSpread(s, dir, "events")
        .select(
          col("event_id"),
          from_json(col("props"),
            org.apache.spark.sql.types.StructType.fromDDL("k STRING"))
            .getField("k").cast("long").as("k"),
          expr("JSONExtractRaw(props, 'k')").as("k_raw"),
          expr("JSONType(props, 'k')").as("k_type"),
          expr("JSONType(props)").as("root_type"))
    }),

    // ---- grouped statistics: stddev / correlation-with-time / covar
    //      per series — single-pass co-moment aggregates, partial-agged.
    //      Time axis CENTERED to seconds since the data origin before
    //      the co-moments: raw ns epochs (~1.7e18) would put the
    //      accumulation-order ulps at hundreds absolute, past any
    //      rounding; centered spans stay exact (< 2^53 ns) and one IEEE
    //      division is engine-identical. roundD absorbs the rest ----
    "q18_grouped_stats" -> ((s, dir) => {
      Tables.load(s, dir, "events")
        .select(col("event_type"), col("value"),
          (expr(s"${Tables.EventTsUsSql} - $StatsOriginNs").cast("double") /
            lit(1e9)).as("td"))
        .groupBy(col("event_type"))
        .agg(round(stddev_samp(col("value")), 4).as("sd"),
          round(corr(col("value"), col("td")), 4).as("corr_vt"),
          round(covar_samp(col("value"), col("td")), 4).as("cov_vt"),
          count(lit(1)).as("n"))
        .orderBy(col("event_type"))
    }),

    // ---- ordered string aggregation (listagg/string_agg family):
    //      deterministic via explicit element ordering — collect_list
    //      alone is partition-order-dependent, array_sort pins it ----
    "q19_string_agg" -> ((s, dir) => {
      Tables.load(s, dir, "events")
        .filter(col("event_id") < 200)
        .groupBy(col("event_type"))
        .agg(
          array_join(array_sort(collect_list(col("event_id"))), ",").as("ids"),
          count(lit(1)).as("n"))
        .orderBy(col("event_type"))
    }),

    // ---- ClickHouse aggregate combinators (graft.functions): -If gates,
    //      argMax/argMin (latest-value idiom, tie-broken by the unique
    //      event_id), uniqExact. All partial-agg map-side like their base
    //      aggregates; `uniq` (HLL++) is spec-tested instead — approx
    //      counts aren't comparable across engines ----
    "q20_ch_aggregates" -> ((s, dir) => {
      Tables.views(s, dir).sql(
        """SELECT event_type,
          |  countIf(value > 0.5) AS n_hi,
          |  round(sumIf(value, event_id % 2 = 0), 2) AS sum_even,
          |  round(avgIf(value, event_id % 2 = 1), 4) AS avg_odd,
          |  minIf(value, value > 0.25) AS min_q,
          |  maxIf(value, event_id < 1000) AS max_lo,
          |  argMax(value, event_id) AS last_v,
          |  argMin(value, event_id) AS first_v,
          |  uniqExact(user_id) AS n_users
          |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin)
    }),

    // ---- event-time RANGE frame (the moving-window metrics query: per
    //      series, stats over the trailing hour BY TIME, not row count —
    //      uneven arrival gaps make ROWS frames wrong). Aggregates are
    //      deliberately order-independent (count/min/max): ties on the
    //      µs-truncated key enter the frame as a SET in both engines, so
    //      the result replays exactly, where a double SUM would depend
    //      on intra-frame order. One shuffle on the partition key; at
    //      100 TB per-series data sorts within its hash partition ----
    "q21_range_frame" -> ((s, dir) => {
      Tables.views(s, dir).sql(
        s"""SELECT event_id, event_type,
          |  count(*) OVER w AS n_1h,
          |  min(value) OVER w AS min_1h,
          |  max(value) OVER w AS max_1h
          |FROM (SELECT event_id, event_type, ${Tables.EventTsUsSql} AS t, value
          |      FROM events)
          |WINDOW w AS (PARTITION BY event_type ORDER BY t
          |  RANGE BETWEEN 3600000000000 PRECEDING AND CURRENT ROW)
          |ORDER BY event_id""".stripMargin)
    }),

    // ---- exact percentiles per series (THE metrics query: p50/p90/p99
    //      latency). Spark's `percentile` is an exact sort-based
    //      aggregate with linear interpolation — same definition as
    //      DuckDB quantile_cont; partial-agged per group, one shuffle.
    //      At 100 TB swap in percentile_approx (t-digest) for a fixed-
    //      memory sketch; exact is right while an oracle must replay ----
    "q17_percentiles" -> ((s, dir) => {
      // exact-vs-sketch routed by largest group (StatsOps — VERDICT r8
      // #7): test SFs stay deep inside the exact regime, so the oracle
      // replays the exact number; past 10 M values in one group the
      // same call plans approx_percentile (fixed-memory t-digest)
      graft.ops.StatsOps.groupedPercentiles(
        Tables.load(s, dir, "events"), "event_type", "value",
        Seq(0.5 -> "p50", 0.9 -> "p90", 0.99 -> "p99"))
        .orderBy(col("event_type"))
    }),

    // ---- ClickHouse sequenceMatch / sequenceCount (behavioral funnel
    //      conditions over a user's event-time-ordered stream). The
    //      per-user stream renders as a symbol string (one char per
    //      event type, ordered by (ts, event_id) — the unique id breaks
    //      same-µs ties identically in both engines); the pattern
    //      '(?1).*(?2).*(?3)' = view→click→purchase is a regex over it.
    //      sequenceCount uses LAZY gaps ('.*?'): leftmost-shortest
    //      non-overlapping matches — exactly CH's earliest-completion
    //      chain scan, and identical between Java regex and RE2. One
    //      shuffle on user_id; the symbol string is bounded by a user's
    //      event count (pair it with sessionized spans at 100 TB if
    //      single users can span millions of events) ----
    "q22_sequence_match" -> ((s, dir) => {
      Tables.load(s, dir, "events")
        .select(col("user_id"),
          // µs-truncated sort key (the eventTsUs discipline): DuckDB
          // compares µs timestamps, so sub-µs ns must not order ties
          struct(expr(Tables.EventTsUsSql).as("t"), col("event_id"),
            substring(col("event_type"), 1, 1).as("sym")).as("e"))
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_events"),
          array_join(transform(array_sort(collect_list(col("e"))),
            x => x("sym")), "").as("__seq"))
        .select(col("user_id"), col("n_events"),
          col("__seq").rlike("v.*c.*p").as("matched"),
          regexp_count(col("__seq"), lit("v.*?c.*?p")).as("n_seq"))
        .orderBy(col("user_id"))
    }),

    // ---- ClickHouse hash-family sampling (r13): `cityHash64(k) % N`
    //      is the canonical CH sampling idiom; the kernels are the
    //      bit-exact v1.0.2 / SipHash-2-4 implementations in
    //      functions/ChHashes.scala (vector-pinned in ChHashSpec).
    //      The key domain is reduced mod 256 so the oracle can carry
    //      the full hash artifact as rendered constants — the same
    //      inductive-verification pattern as the trained-model oracles:
    //      DuckDB re-derives the sample counts and extrema FROM the
    //      rendered (m → hash, bucket) table, so any per-row
    //      disagreement between Spark's codegen'd kernel and the
    //      rendered values breaks the match. Hashes compare as
    //      zero-padded 20-digit strings (UInt64-as-string, the
    //      reference's own int64 output convention). Scale shape: pure
    //      map-side projection + one 25-group aggregate. ----
    //      (r14, VERDICT r13 #3: the WHOLE family is gated here, not
    //      just the two most common names — halfMD5, intHash64 with a
    //      second %-sampling face, intHash32, URLHash's trailing-slash
    //      strip, and the multi-arg Hash128to64 fold all project
    //      through the same rendered-artifact oracle. r15 late adds
    //      farmFingerprint64, the Guava-golden-pinned farm member.)
    "q23_ch_hash_sample" -> ((s, dir) => {
      Tables.views(s, dir).sql(
        """SELECT c_nationkey,
          |  count(*) AS n_cust,
          |  count_if(cityHash64(toString(c_custkey % 256)) % 10 = 7) AS n_sampled,
          |  count_if(intHash64(c_custkey % 256) % 10 = 3) AS n_i64_sampled,
          |  max(lpad(toString(cityHash64(toString(c_custkey % 256))), 20, '0')) AS max_city,
          |  min(lpad(toString(sipHash64(toString(c_custkey % 256))), 20, '0')) AS min_sip,
          |  max(lpad(toString(halfMD5(toString(c_custkey % 256))), 20, '0')) AS max_md5,
          |  min(lpad(toString(intHash64(c_custkey % 256)), 20, '0')) AS min_i64,
          |  max(lpad(toString(intHash32(c_custkey % 256)), 10, '0')) AS max_i32,
          |  min(lpad(toString(URLHash(concat('http://g.io/', toString(c_custkey % 256), '/'))), 20, '0')) AS min_url,
          |  max(lpad(toString(cityHash64(toString(c_custkey % 256), 'q23')), 20, '0')) AS max_city2,
          |  max(sipHash128(toString(c_custkey % 256))) AS max_sip128,
          |  min(sipHash128Reference(toString(c_custkey % 256), 'q23')) AS min_sip128r,
          |  min(lpad(toString(farmFingerprint64(toString(c_custkey % 256))), 20, '0')) AS min_farm
          |FROM customer GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin)
    }),

    // ---- IPv6 family round-trip (r13): the RFC 4291 parse and RFC
    //      5952 canonical format are inverse on canonical text, so the
    //      oracle needs NO IPv6 support — DuckDB computes the expected
    //      canonical strings directly with printf while Spark derives
    //      them through IPv6StringToNum→IPv6NumToString over the
    //      EXPANDED (zero-padded, uncompressed) spelling. Covers: full
    //      8-group parse, longest-zero-run compression, leading-zero
    //      stripping, bare-IPv4 promotion to the ::ffff: mapped form
    //      with dotted rendering, strict isIPv6String (dotted quad is
    //      false), and toIPv6OrNull's null-not-throw contract. Pure
    //      map-side projection — no shuffle but the output sort. ----
    "q24_ipv6_roundtrip" -> ((s, dir) => {
      Tables.views(s, dir).sql(
        """SELECT c_custkey,
          |  IPv6NumToString(IPv6StringToNum(printf(
          |    '2001:0db8:0000:0000:0000:0000:%04x:%04x',
          |    1 + c_custkey % 65535, 1 + c_nationkey % 65535))) AS canon,
          |  IPv6NumToString(toIPv6(printf('%d.%d.%d.%d',
          |    c_custkey % 256, (c_custkey DIV 7) % 256,
          |    c_nationkey % 256, (c_custkey DIV 3) % 256))) AS mapped,
          |  isIPv6String(printf('2001:db8::%x', 1 + c_custkey % 65535)) AS is6,
          |  isIPv6String(printf('%d.%d.%d.%d', c_custkey % 256, 1, 2, 3)) AS not6,
          |  toIPv6OrNull(printf('xyz:%d', c_custkey)) IS NULL AS bad_null
          |FROM customer ORDER BY c_custkey""".stripMargin)
    }),

    // ---- ngram family (r13): ngramDistance / the CaseInsensitive
    //      variant / ngramSearch through the q23 inductive-oracle
    //      pattern — the key domain is reduced mod 64 and DuckDB
    //      carries the kernel's own outputs as rendered constants, so
    //      any per-row disagreement between the codegen'd expression
    //      and the driver-rendered value breaks the hash match. Scores
    //      compare as printf('%.4f') TEXT on both sides (identical
    //      Java/DuckDB %f rounding; no float-type schema skew). ----
    "q25_ngram_scores" -> ((s, dir) => {
      Tables.views(s, dir).sql(
        """SELECT c_custkey,
          |  printf('%.4f', CAST(ngramDistance(
          |    concat('seg_', lpad(toString(c_custkey % 64), 3, '0')),
          |    'seg_000') AS DOUBLE)) AS dist,
          |  printf('%.4f', CAST(ngramDistanceCaseInsensitive(
          |    upper(concat('seg_', lpad(toString(c_custkey % 64), 3, '0'))),
          |    'seg_000') AS DOUBLE)) AS dist_ci,
          |  printf('%.4f', CAST(ngramSearch(
          |    concat('seg_', lpad(toString(c_custkey % 64), 3, '0')),
          |    '_000') AS DOUBLE)) AS srch
          |FROM customer ORDER BY c_custkey""".stripMargin)
    }),

    // ---- r14 render/exp builders, oracle-gated: DuckDB's own bar()
    //      renders the identical eighth-block string (probed across
    //      every residue; only its space-padding differs — rtrim'd in
    //      the oracle), roundToExp2 replays as 1 << (bits-1) via
    //      bin(), intExp10 as the literal '1' + zeros string ----
    "q26_render_funcs" -> ((s, dir) => {
      Tables.views(s, dir).sql(
        """SELECT c_custkey,
          |  bar(c_custkey % 7, 0, 7, 10) AS b,
          |  bar(c_custkey % 3, 0, 0, 10) AS b_degen,
          |  bar(nullif(c_custkey % 3, 1), 0, 0, 10) AS b_null,
          |  roundToExp2(c_custkey) AS r2,
          |  CAST(intExp10(CAST(c_custkey % 20 AS INT)) AS STRING) AS e10
          |FROM customer ORDER BY c_custkey""".stripMargin)
    }),

    // ---- erf (r15 late, the last closeable 400 entry): the q23
    //      inductive-oracle pattern — the key domain reduces mod 256
    //      to x in [-4, 4) (plus an integer-cast face crossing the
    //      saturation edge), and DuckDB carries the kernel's own
    //      outputs as rendered %.17e constants (17 significant digits
    //      uniquely identify a double; both sides Java-format), so any
    //      per-row disagreement between the codegen'd expression and
    //      the driver-rendered correctly-rounded kernel breaks the
    //      hash match. Pure map-side projection. ----
    "q27_erf_scalar" -> ((s, dir) => {
      Tables.views(s, dir).sql(
        """SELECT c_custkey,
          |  printf('%.17e', erf((c_custkey % 256 - 128) / 32.0)) AS e,
          |  printf('%.17e', erf(CAST(c_custkey % 7 AS INT))) AS e_int,
          |  erf(CAST(NULL AS DOUBLE)) IS NULL AS e_null
          |FROM customer ORDER BY c_custkey""".stripMargin)
    }),
  )

  /** q25's rendered ngram artifact: the same kernel the expressions
    * call, applied driver-side to the reduced domain (m → scores as
    * %.4f text). */
  private def q25NgramMap: String = {
    import org.apache.spark.unsafe.types.UTF8String
    def u(s: String) = UTF8String.fromString(s)
    def f4(v: Float) = String.format(java.util.Locale.ROOT, "%.4f",
      java.lang.Double.valueOf(v.toDouble))
    (0 until 64).map { m =>
      val seg = f"seg_$m%03d"
      val dist = f4(graft.functions.ChNgram.distance(u(seg), u("seg_000"), ci = false))
      val distCi = f4(graft.functions.ChNgram.distance(
        u(seg.toUpperCase(java.util.Locale.ROOT)), u("seg_000"), ci = true))
      val srch = f4(graft.functions.ChNgram.search(u(seg), u("_000"), ci = false))
      s"($m, '$dist', '$distCi', '$srch')"
    }.mkString(",\n      ")
  }

  /** q23's rendered hash artifact: the bit-exact kernels applied to the
    * reduced key domain 0..255 (driver-side, same JVM code the
    * expressions call). r14 widens the row to the WHOLE family:
    * (m, city, city-bucket, sip, md5, i64, i64-bucket, i32, url,
    * city-2-arg-fold), each unsigned rendered as zero-padded text. */
  private def q23HashMap: String = {
    import graft.functions.ChHash
    def pad(h: Long, w: Int = 20) = {
      val s = java.lang.Long.toUnsignedString(h)
      "0" * (w - s.length) + s
    }
    def bucket(h: Long) =
      new java.math.BigInteger(java.lang.Long.toUnsignedString(h))
        .mod(java.math.BigInteger.TEN).intValue
    (0 until 256).map { m =>
      val bytes = String.valueOf(m).getBytes("UTF-8")
      val c = ChHash.cityHash64(bytes)
      val sip = ChHash.sipHash64(bytes)
      val md5 = ChHash.halfMD5(bytes)
      val i64 = ChHash.intHash64(m.toLong)
      val i32 = ChHash.intHash32(m.toLong)
      // URLHash strips exactly ONE trailing /?# before cityHash64
      val url = ChHash.cityHash64(s"http://g.io/$m".getBytes("UTF-8"))
      val city2 = ChHash.hash128to64(c,
        ChHash.cityHash64("q23".getBytes("UTF-8")))
      // r15: the 128-bit pair — single-arg CH fold + a 2-arg paper-
      // variant fold (the combiner re-hashes the 32-byte concat)
      import ChHash.{hexLower => hx}
      val sip128 = hx(ChHash.sipHash128(bytes, ref = false))
      val sip128r = hx(ChHash.sip128Combine(
        ChHash.sipHash128(bytes, ref = true),
        ChHash.sipHash128("q23".getBytes("UTF-8"), ref = true), ref = true))
      // r15 late: the farm-family portable member (Guava-golden-pinned)
      val farm = ChHash.farmFingerprint64(bytes)
      s"($m, '${pad(c)}', ${bucket(c)}, '${pad(sip)}', '${pad(md5)}', " +
        s"'${pad(i64)}', ${bucket(i64)}, '${pad(i32, 10)}', " +
        s"'${pad(url)}', '${pad(city2)}', '$sip128', '$sip128r', " +
        s"'${pad(farm)}')"
    }.mkString(",\n      ")
  }

  /** q27's rendered erf artifact: the correctly-rounded kernel applied
    * driver-side to the reduced domains (same JVM code the expression
    * calls), as %.17e text — 17 significant digits round-trip a double
    * exactly, and both sides render through java.util.Formatter
    * (Spark's printf), so the strings are bit-faithful. */
  private def erf17e(x: Double): String =
    String.format(java.util.Locale.US, "%.17e",
      java.lang.Double.valueOf(graft.functions.ChErf.erf(x)))

  private def q27ErfMap: String =
    (0 until 256).map(m => s"($m, '${erf17e((m - 128) / 32.0)}')")
      .mkString(",\n      ")

  private def q27Erf7Map: String =
    (0 until 7).map(k => s"($k, '${erf17e(k.toDouble)}')")
      .mkString(",\n      ")

  val oracle: Map[String, String] = Map(
    "q23_ch_hash_sample" ->
      s"""WITH hmap(m, city_h, bucket, sip_h, md5_h, i64_h, i64_b,
         |          i32_h, url_h, city2_h, sip128_h, sip128r_h,
         |          farm_h) AS (VALUES
         |      $q23HashMap)
         |SELECT c_nationkey, count(*) AS n_cust,
         |  count(*) FILTER (WHERE bucket = 7) AS n_sampled,
         |  count(*) FILTER (WHERE i64_b = 3) AS n_i64_sampled,
         |  max(city_h) AS max_city, min(sip_h) AS min_sip,
         |  max(md5_h) AS max_md5, min(i64_h) AS min_i64,
         |  max(i32_h) AS max_i32, min(url_h) AS min_url,
         |  max(city2_h) AS max_city2,
         |  max(sip128_h) AS max_sip128, min(sip128r_h) AS min_sip128r,
         |  min(farm_h) AS min_farm
         |FROM customer JOIN hmap ON (c_custkey % 256) = m
         |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin,
    "q24_ipv6_roundtrip" ->
      """SELECT c_custkey,
        |  printf('2001:db8::%x:%x',
        |    1 + c_custkey % 65535, 1 + c_nationkey % 65535) AS canon,
        |  printf('::ffff:%d.%d.%d.%d',
        |    c_custkey % 256, (c_custkey // 7) % 256,
        |    c_nationkey % 256, (c_custkey // 3) % 256) AS mapped,
        |  true AS is6, false AS not6, true AS bad_null
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "q25_ngram_scores" ->
      s"""WITH nmap(m, dist, dist_ci, srch) AS (VALUES
         |      $q25NgramMap)
         |SELECT c_custkey, n.dist AS dist, n.dist_ci AS dist_ci,
         |  n.srch AS srch
         |FROM customer JOIN nmap n ON (c_custkey % 64) = n.m
         |ORDER BY c_custkey""".stripMargin,
    "q26_render_funcs" ->
      """SELECT c_custkey,
        |  rtrim(bar(c_custkey % 7, 0, 7, 10)) AS b,
        |  rtrim(bar(c_custkey % 3, 0, 0, 10)) AS b_degen,
        |  rtrim(bar(nullif(c_custkey % 3, 1), 0, 0, 10)) AS b_null,
        |  CASE WHEN c_custkey < 1 THEN CAST(0 AS BIGINT)
        |       ELSE (CAST(1 AS BIGINT) << (length(bin(c_custkey)) - 1))
        |  END AS r2,
        |  '1' || repeat('0', CAST(c_custkey % 20 AS INT)) AS e10
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "q27_erf_scalar" ->
      s"""WITH emap(m, e_txt) AS (VALUES
         |      $q27ErfMap),
         |    e7(k, e7_txt) AS (VALUES
         |      $q27Erf7Map)
         |SELECT c_custkey, e_txt AS e, e7_txt AS e_int, true AS e_null
         |FROM customer
         |JOIN emap ON (c_custkey % 256) = m
         |JOIN e7 ON (c_custkey % 7) = k
         |ORDER BY c_custkey""".stripMargin,
    "q22_sequence_match" ->
      """WITH seqs AS (
        |  SELECT user_id, count(*) AS n_events,
        |    string_agg(substr(event_type, 1, 1), ''
        |      ORDER BY ts, event_id) AS seq
        |  FROM events GROUP BY user_id)
        |SELECT user_id, n_events,
        |  regexp_matches(seq, 'v.*c.*p') AS matched,
        |  len(regexp_extract_all(seq, 'v.*?c.*?p')) AS n_seq
        |FROM seqs ORDER BY user_id""".stripMargin,
    "q01_pricing_summary" ->
      s"""SELECT l_returnflag, l_linestatus,
         |  ${roundD("sum(l_quantity)", 2)} AS sum_qty,
         |  ${roundD("sum(l_extendedprice)", 2)} AS sum_base,
         |  ${roundD("sum(l_extendedprice * (1.0 - l_discount))", 2)} AS sum_disc,
         |  ${roundD("avg(l_quantity)", 4)} AS avg_qty,
         |  count(*) AS cnt
         |FROM lineitem GROUP BY l_returnflag, l_linestatus
         |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q02_topk_groupby" ->
      s"""SELECT p_brand, p_type, count(*) AS c, ${roundD("avg(p_retailprice)", 0)} AS m
         |FROM part GROUP BY p_brand, p_type
         |ORDER BY c DESC, p_brand, p_type LIMIT 10""".stripMargin,
    "q03_join_revenue" ->
      s"""SELECT n_name,
         |  ${roundD("sum(l_extendedprice * (1.0 - l_discount))", 2)} AS revenue,
         |  count(*) AS cnt
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN nation ON c_nationkey = n_nationkey
         |GROUP BY n_name ORDER BY n_name""".stripMargin,
    "q04_filter_scan" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1998-01-01'
        |  AND l_discount > 0.05 AND l_quantity < 25
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q05_window_rank" ->
      s"""SELECT * FROM (
         |  SELECT o_custkey, o_orderkey,
         |    rank() OVER w AS rk,
         |    row_number() OVER w AS rn,
         |    ${roundD(
               """sum(o_totalprice) OVER (PARTITION BY o_custkey
                 |      ORDER BY o_totalprice DESC, o_orderkey
                 |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)""".stripMargin, 2)} AS running
         |  FROM orders
         |  WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
         |) t WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin,
    "q06_distinct_agg" ->
      """SELECT count(DISTINCT o_custkey) AS n_cust,
        |  count(DISTINCT o_orderpriority) AS n_prio,
        |  count(*) AS n
        |FROM orders""".stripMargin,
    "q07_subquery_avg" ->
      s"""SELECT o_orderkey, o_totalprice FROM orders
         |WHERE o_totalprice > (SELECT ${roundD("avg(o_totalprice)", 2)} FROM orders)
         |ORDER BY o_orderkey""".stripMargin,
    "q08_semijoin" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_totalprice > 200000)
        |ORDER BY c_custkey""".stripMargin,
    "q09_antijoin" ->
      """SELECT c_custkey, c_acctbal FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin,
    "q10_setops" ->
      """SELECT k FROM (
        |  (SELECT o_custkey AS k FROM orders WHERE o_orderstatus = 'F'
        |   INTERSECT
        |   SELECT o_custkey AS k FROM orders WHERE o_orderstatus = 'O')
        |  UNION
        |  (SELECT c_custkey AS k FROM customer WHERE c_acctbal < 0
        |   EXCEPT
        |   SELECT o_custkey AS k FROM orders)
        |) t ORDER BY k""".stripMargin,
    "q11_rollup" ->
      """SELECT r_name, n_name, count(*) AS c,
        |  CAST(grouping(r_name) AS INT) AS gr,
        |  CAST(grouping(n_name) AS INT) AS gn
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY ROLLUP(r_name, n_name)
        |ORDER BY r_name NULLS FIRST, n_name NULLS FIRST""".stripMargin,
    "q12_scalar_funcs" ->
      """SELECT o_orderkey,
        |  upper(o_orderpriority) AS prio_u,
        |  substring(o_orderpriority, 1, 1) AS st,
        |  CASE WHEN o_totalprice > 100000 THEN 'big' ELSE 'small' END AS sz,
        |  length(o_orderpriority) AS plen,
        |  concat(o_orderstatus, '-', o_orderpriority) AS tag,
        |  coalesce(nullif(o_orderstatus, 'O'), 'X') AS nf
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "q13_time_buckets" ->
      s"""SELECT epoch_ms(date_trunc('hour', ts)) AS bucket_ms, event_type,
         |  count(*) AS n, ${roundD("sum(value)", 2)} AS sum_v,
         |  ${roundD("avg(value)", 4)} AS avg_v
         |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q14_ch_aliases" ->
      """SELECT o_orderkey,
        |  CAST(o_orderkey AS VARCHAR) AS k_str,
        |  CAST(CAST(o_orderkey AS VARCHAR) AS BIGINT) AS k_rt,
        |  TRY_CAST(o_orderstatus AS BIGINT) AS st_null,
        |  COALESCE(TRY_CAST(o_orderstatus AS BIGINT), 0) AS st_zero,
        |  COALESCE(TRY_CAST(o_orderpriority AS DOUBLE), 0) AS prio_f,
        |  (o_orderpriority LIKE '1%') AS m1
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "q15_epoch_ns_filter" ->
      """SELECT event_id, epoch_ns(ts) AS ts_ns
        |FROM events
        |WHERE epoch_ns(ts) >= epoch_ns(TIMESTAMP '2024-01-15 00:00:00')
        |ORDER BY event_id""".stripMargin,
    "q16_json_extract" ->
      """SELECT event_id,
        |  CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
        |  CASE WHEN props IS NULL THEN NULL
        |       ELSE COALESCE(CAST(json_extract(props, '$.k') AS VARCHAR), '')
        |  END AS k_raw,
        |  CASE json_type(props, '$.k')
        |    WHEN 'UBIGINT' THEN 'UInt64' WHEN 'BIGINT' THEN 'Int64'
        |    WHEN 'DOUBLE' THEN 'Double' WHEN 'VARCHAR' THEN 'String'
        |    WHEN 'OBJECT' THEN 'Object' WHEN 'ARRAY' THEN 'Array'
        |    WHEN 'BOOLEAN' THEN 'Bool' ELSE 'Null' END AS k_type,
        |  CASE json_type(props)
        |    WHEN 'UBIGINT' THEN 'UInt64' WHEN 'BIGINT' THEN 'Int64'
        |    WHEN 'DOUBLE' THEN 'Double' WHEN 'VARCHAR' THEN 'String'
        |    WHEN 'OBJECT' THEN 'Object' WHEN 'ARRAY' THEN 'Array'
        |    WHEN 'BOOLEAN' THEN 'Bool' ELSE 'Null' END AS root_type
        |FROM events ORDER BY event_id""".stripMargin,
    "q21_range_frame" ->
      """SELECT event_id, event_type,
        |  count(*) OVER w AS n_1h,
        |  min(value) OVER w AS min_1h,
        |  max(value) OVER w AS max_1h
        |FROM (SELECT event_id, event_type, epoch_ns(ts) AS t, value
        |      FROM events)
        |WINDOW w AS (PARTITION BY event_type ORDER BY t
        |  RANGE BETWEEN 3600000000000 PRECEDING AND CURRENT ROW)
        |ORDER BY event_id""".stripMargin,
    "q17_percentiles" ->
      s"""SELECT event_type,
         |  ${roundD("quantile_cont(value, 0.5)", 4)} AS p50,
         |  ${roundD("quantile_cont(value, 0.9)", 4)} AS p90,
         |  ${roundD("quantile_cont(value, 0.99)", 4)} AS p99,
         |  count(*) AS n
         |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q19_string_agg" -> q19Oracle,
    "q20_ch_aggregates" ->
      s"""SELECT event_type,
         |  count(CASE WHEN value > 0.5 THEN 1 END) AS n_hi,
         |  ${roundD("sum(CASE WHEN event_id % 2 = 0 THEN value END)", 2)} AS sum_even,
         |  ${roundD("avg(CASE WHEN event_id % 2 = 1 THEN value END)", 4)} AS avg_odd,
         |  min(CASE WHEN value > 0.25 THEN value END) AS min_q,
         |  max(CASE WHEN event_id < 1000 THEN value END) AS max_lo,
         |  arg_max(value, event_id) AS last_v,
         |  arg_min(value, event_id) AS first_v,
         |  count(DISTINCT user_id) AS n_users
         |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q18_grouped_stats" ->
      s"""SELECT event_type,
         |  ${roundD("stddev_samp(value)", 4)} AS sd,
         |  ${roundD(s"corr(value, CAST(epoch_ns(ts) - $StatsOriginNs AS DOUBLE) / 1e9)", 4)} AS corr_vt,
         |  ${roundD(s"covar_samp(value, CAST(epoch_ns(ts) - $StatsOriginNs AS DOUBLE) / 1e9)", 4)} AS cov_vt,
         |  count(*) AS n
         |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
  )

}
