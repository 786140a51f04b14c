"""DuckDB oracle SQL for every entry in __spark_entry__.queries().

Each string mirrors the Spark query's arithmetic exactly (same rounding
points, same tie-breaks, same hash primitives — see
influxdb_ha_spark/operators/hashing.py for the shared conventions).
Tables region..embeddings are pre-registered views on the same parquet.
"""

from __future__ import annotations

from influxdb_ha_spark.operators.hashing import (
    MERSENNE_P, duck_hash64, duck_shingles, duck_tokens, minhash_coeffs)
from influxdb_ha_spark.operators.pipeline import PII_PATTERNS as _PII
from influxdb_ha_spark.operators.text import LANGS, STOPWORDS

NOW_NS = 1_717_200_000_000_000_000
JAN1 = 1_704_067_200_000_000_000
FEB1 = 1_706_745_600_000_000_000
HOUR = 3_600_000_000_000
DAY = 24 * HOUR

TOKS = duck_tokens("text")
EV_TIME = "epoch_ns(ts)"


def fr(x: str, k: int) -> str:
    """Deterministic rounding mirror of __spark_entry__._fr."""
    s = 10 ** k
    return f"(floor(({x}) * {s}.0 + 0.5) / {s}.0)"


def dsum(col: str, scale: int = 2) -> str:
    """Exact DECIMAL-accumulated sum mirror of __spark_entry__._dsum."""
    return f"(sum(({col})::DECIMAL(28,{scale}))::DOUBLE)"


def _shingles_cte(k: int = 3) -> str:
    """doc_id → word k-shingle list (mirror of shingles_expr)."""
    return f"""
      SELECT doc_id,
             CASE WHEN len({TOKS}) < {k} THEN []::VARCHAR[]
                  ELSE [array_to_string(({TOKS})[i:i+{k - 1}], ' ')
                        FOR i IN generate_series(1, len({TOKS}) - {k - 1})]
             END AS sh
      FROM documents"""


def _minhash_sig_sql(num_perm: int = 16, k: int = 3) -> str:
    """sh CTE → doc_id + signature list (mirror of minhash_signatures):
    shingles hashed once, then the permutations run over the numeric list."""
    coeffs = minhash_coeffs(num_perm)
    h = duck_hash64("s")
    mh = [f"list_min(list_transform(hh, h -> ({a} * h + {b}) % {MERSENNE_P}))"
          for a, b in coeffs]
    return (f"SELECT doc_id, [{', '.join(mh)}] AS s FROM ("
            f"SELECT doc_id, list_transform(sh, s -> {h} % {MERSENNE_P}) AS hh "
            f"FROM sh WHERE len(sh) > 0)")


def _bands_sql(bands: int = 4, rows: int = 4) -> str:
    parts = []
    for i in range(bands):
        key = " || ',' || ".join(
            f"s[{i * rows + j + 1}]::VARCHAR" for j in range(rows))
        parts.append(f"SELECT doc_id, {i} AS band_id, md5({key}) AS band_key FROM sig")
    return " UNION ALL ".join(parts)


def _candidates_sql(k: int = 3) -> str:
    return f"""
      WITH sh AS ({_shingles_cte(k)}),
      sig AS ({_minhash_sig_sql(16, k)}),
      bands AS ({_bands_sql()})
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, false AS truncated
      FROM bands a JOIN bands b USING (band_id, band_key)
      WHERE a.doc_id < b.doc_id
      GROUP BY 1, 2, 3"""


def _near_dups_sql(k: int, threshold: float) -> str:
    return f"""
      WITH sh AS ({_shingles_cte(k)}),
      sig AS ({_minhash_sig_sql(16, k)}),
      bands AS ({_bands_sql()}),
      cand AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b
        FROM bands a JOIN bands b USING (band_id, band_key)
        WHERE a.doc_id < b.doc_id GROUP BY 1, 2),
      shd AS (SELECT doc_id, list_distinct(sh) AS sh FROM sh)
      SELECT id_a, id_b,
             round(len(list_filter(sa.sh, x -> list_contains(sb.sh, x)))::DOUBLE
                   / len(list_distinct(list_concat(sa.sh, sb.sh)))::DOUBLE,
                   6) AS jaccard
      FROM cand JOIN shd sa ON sa.doc_id = id_a JOIN shd sb ON sb.doc_id = id_b
      WHERE round(len(list_filter(sa.sh, x -> list_contains(sb.sh, x)))::DOUBLE
                  / len(list_distinct(list_concat(sa.sh, sb.sh)))::DOUBLE,
                  6) >= {threshold}"""


def _cos(a: str, b: str, dim: int = 64) -> str:
    """Sequential-fold cosine mirroring F.aggregate/zip_with exactly."""
    dot = (f"list_reduce([{a}[i] * {b}[i] FOR i IN generate_series(1, {dim})], "
           f"(x, y) -> x + y)")
    na = (f"sqrt(list_reduce([{a}[i] * {a}[i] FOR i IN generate_series(1, {dim})], "
          f"(x, y) -> x + y))")
    nb = (f"sqrt(list_reduce([{b}[i] * {b}[i] FOR i IN generate_series(1, {dim})], "
          f"(x, y) -> x + y))")
    return f"({dot} / ({na} * {nb}))"


def _simhash_sql(bits: int = 32) -> str:
    h = duck_hash64("tok")
    sums = ", ".join(
        f"sum(CASE WHEN (({h} >> {j}) & 1) = 1 THEN 1 ELSE -1 END) AS b{j}"
        for j in range(bits))
    terms = " + ".join(
        f"CASE WHEN b{j} > 0 THEN {1 << j}::BIGINT ELSE 0::BIGINT END"
        for j in range(bits))
    return f"""
      WITH toks AS (SELECT doc_id, unnest({TOKS}) AS tok FROM documents),
      s AS (SELECT doc_id, {sums} FROM toks GROUP BY doc_id)
      SELECT doc_id, ({terms})::BIGINT AS simhash FROM s"""


def _lang_hits(lang: str) -> str:
    words = ", ".join(f"'{w}'" for w in STOPWORDS[lang])
    return f"len(list_filter({TOKS}, x -> list_contains([{words}], x)))"


_EN_WORDS = ", ".join(f"'{w}'" for w in STOPWORDS["en"])

_FILLSRC = f"""
      agg AS (
        SELECT ({EV_TIME} // {6 * HOUR}) * {6 * HOUR} AS time, sum(value) AS mv
        FROM events
        WHERE {EV_TIME} >= {JAN1} AND {EV_TIME} < {FEB1}
          AND event_type = 'signup'
        GROUP BY 1),
      spine AS (
        SELECT unnest(generate_series({JAN1}, {FEB1} - 1, {6 * HOUR})) AS time),
      j AS (SELECT s.time, a.mv FROM spine s LEFT JOIN agg a USING (time))"""


def build_oracles() -> dict[str, str]:
    o: dict[str, str] = {}

    # shared text-expression mirrors (operators/text.py conventions)
    mean_wl = (f"CASE WHEN len({TOKS}) > 0 THEN "
               f"list_reduce(list_transform({TOKS}, x -> length(x)), "
               f"(a, b) -> a + b)::DOUBLE / len({TOKS}) ELSE 0.0 END")
    punct = (r"(length(text) - length(regexp_replace(text, '[^\w\s]', '', 'g')))")

    # -- aggregations ------------------------------------------------------
    o["agg_salted"] = f"""
      SELECT l_returnflag, {dsum('l_quantity')} AS sum_qty,
             count(l_quantity) AS n, max(l_quantity) AS max_qty
      FROM lineitem GROUP BY 1"""
    o["agg_count"] = """
      SELECT l_returnflag, l_linestatus, count(*) AS n_rows,
             count(l_quantity) AS n_qty
      FROM lineitem GROUP BY 1, 2"""
    o["agg_sum"] = f"""
      SELECT l_returnflag, l_linestatus,
             {dsum('l_quantity')} AS sum_qty,
             {dsum('l_extendedprice')} AS sum_price
      FROM lineitem GROUP BY 1, 2"""
    o["agg_mean"] = f"""
      SELECT l_returnflag, l_linestatus,
             {dsum('l_quantity')} / count(l_quantity) AS mean_qty,
             {dsum('l_extendedprice')} / count(l_extendedprice) AS mean_price,
             {dsum('l_discount')} / count(l_discount) AS mean_disc
      FROM lineitem GROUP BY 1, 2"""
    o["agg_min_max_spread"] = """
      SELECT l_returnflag, l_linestatus,
             min(l_quantity) AS min_qty, max(l_quantity) AS max_qty,
             min(l_extendedprice) AS min_price, max(l_extendedprice) AS max_price,
             max(l_extendedprice) - min(l_extendedprice) AS spread_price
      FROM lineitem GROUP BY 1, 2"""
    o["agg_stddev"] = f"""
      SELECT l_returnflag, l_linestatus,
             {fr('stddev(l_quantity)', 4)} AS stddev_qty,
             {fr('stddev(l_discount)', 6)} AS stddev_disc
      FROM lineitem GROUP BY 1, 2"""
    o["agg_median_percentile"] = f"""
      SELECT l_returnflag, l_linestatus,
             {fr('median(l_quantity)', 4)} AS median_qty,
             {fr('quantile_cont(l_quantity, 0.9)', 4)} AS p90_qty,
             {fr('quantile_cont(l_extendedprice, 0.5)', 4)} AS p50_price
      FROM lineitem GROUP BY 1, 2"""
    o["agg_mode"] = """
      WITH c AS (
        SELECT l_returnflag, l_quantity, count(*) AS n
        FROM lineitem GROUP BY 1, 2),
      r AS (
        SELECT *, row_number() OVER (PARTITION BY l_returnflag
                                     ORDER BY n DESC, l_quantity ASC) AS rk
        FROM c)
      SELECT l_returnflag, l_quantity AS mode_qty, n AS mode_count
      FROM r WHERE rk = 1"""
    o["agg_count_distinct"] = """
      SELECT l_returnflag, count(DISTINCT l_partkey) AS nd_part,
             count(DISTINCT l_suppkey) AS nd_supp
      FROM lineitem GROUP BY 1"""
    # tolerance-boolean contract for the HLL sketch: oracle asserts the
    # sketch landed within 5% of the exact count (always-true on its side)
    o["agg_approx_distinct"] = """
      SELECT l_returnflag, count(DISTINCT l_partkey) AS exact_nd_part,
             TRUE AS within_5pct
      FROM lineitem GROUP BY 1"""
    o["agg_first_last"] = f"""
      SELECT event_type,
             min_by(value, {EV_TIME}) AS first_value,
             max_by(value, {EV_TIME}) AS last_value,
             min({EV_TIME}) AS first_time, max({EV_TIME}) AS last_time
      FROM events GROUP BY 1"""
    o["agg_top_bottom"] = """
      WITH t AS (
        SELECT *, row_number() OVER (PARTITION BY l_returnflag
          ORDER BY l_extendedprice DESC, l_orderkey ASC, l_linenumber ASC) AS rank
        FROM lineitem),
      b AS (
        SELECT *, row_number() OVER (PARTITION BY l_returnflag
          ORDER BY l_extendedprice ASC, l_orderkey ASC, l_linenumber ASC) AS rank
        FROM lineitem)
      SELECT 'top' AS which, l_returnflag, rank, l_orderkey, l_linenumber,
             l_extendedprice FROM t WHERE rank <= 3
      UNION ALL
      SELECT 'bottom' AS which, l_returnflag, rank, l_orderkey, l_linenumber,
             l_extendedprice FROM b WHERE rank <= 3"""
    o["tpch_q1"] = f"""
      SELECT l_returnflag, l_linestatus,
             {dsum('l_quantity')} AS sum_qty,
             {dsum('l_extendedprice')} AS sum_base_price,
             {dsum('l_extendedprice * (1 - l_discount)', 4)} AS sum_disc_price,
             {dsum('l_extendedprice * (1 - l_discount) * (1 + l_tax)', 6)} AS sum_charge,
             {dsum('l_quantity')} / count(*) AS avg_qty,
             {dsum('l_extendedprice')} / count(*) AS avg_price,
             {dsum('l_discount')} / count(*) AS avg_disc,
             count(*) AS count_order
      FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
      GROUP BY 1, 2"""

    # -- joins -------------------------------------------------------------
    o["join_revenue_by_segment"] = f"""
      SELECT c_mktsegment, {dsum('o_totalprice')} AS revenue,
             count(*) AS n_orders
      FROM orders JOIN customer ON o_custkey = c_custkey
      GROUP BY 1"""
    o["join_brand_revenue"] = f"""
      SELECT p_brand, {dsum('l_extendedprice')} AS revenue,
             {dsum('l_quantity')} / count(*) AS avg_qty
      FROM lineitem JOIN part ON l_partkey = p_partkey
      GROUP BY 1"""
    o["join_nation_customers"] = f"""
      SELECT r_name, count(*) AS n_customers,
             {dsum('c_acctbal')} AS sum_acctbal
      FROM customer
      JOIN nation ON c_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      GROUP BY 1"""

    # -- InfluxQL frontend -------------------------------------------------
    o["iq_mean_1h"] = f"""
      WITH a AS (
        SELECT ({EV_TIME} // {HOUR}) * {HOUR} AS time,
               sum(value) AS sv, count(value) AS n
        FROM events WHERE {EV_TIME} <= {NOW_NS} GROUP BY 1)
      SELECT time, (floor(sv * 100 + 0.5) / 100) / n AS mean_value, n
      FROM a"""
    o["iq_mean_1d_tag"] = f"""
      WITH a AS (
        SELECT ({EV_TIME} // {DAY}) * {DAY} AS time, event_type,
               sum(value) AS sv, count(value) AS n
        FROM events GROUP BY 1, 2)
      SELECT time, event_type,
             (floor(sv * 100 + 0.5) / 100) / n AS mean_value,
             floor(sv * 100 + 0.5) / 100 AS sum_value
      FROM a"""
    o["iq_raw_limit"] = f"""
      SELECT {EV_TIME} AS time, value, event_id
      FROM events
      WHERE {EV_TIME} >= {JAN1} AND {EV_TIME} < {JAN1 + 7 * DAY}
        AND event_type = 'click'
      ORDER BY time LIMIT 100"""
    o["iq_fill_zero"] = f"""
      WITH {_FILLSRC}
      SELECT time, {fr('coalesce(mv, 0)', 4)} AS mv FROM j"""
    o["iq_fill_previous"] = f"""
      WITH {_FILLSRC}
      SELECT time,
             {fr("coalesce(mv, last_value(mv IGNORE NULLS) OVER "
                 "(ORDER BY time ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING))", 4)}
               AS mv
      FROM j"""
    o["iq_fill_linear"] = f"""
      WITH {_FILLSRC},
      l AS (
        SELECT time, mv,
          last_value(mv IGNORE NULLS) OVER
            (ORDER BY time ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pv,
          last_value(CASE WHEN mv IS NOT NULL THEN time END IGNORE NULLS) OVER
            (ORDER BY time ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pb,
          first_value(mv IGNORE NULLS) OVER
            (ORDER BY time ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS nv,
          first_value(CASE WHEN mv IS NOT NULL THEN time END IGNORE NULLS) OVER
            (ORDER BY time ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS nb
        FROM j)
      SELECT time,
             {fr("coalesce(mv, pv + (nv - pv) * ((time - pb)::DOUBLE / (nb - pb)::DOUBLE))", 4)}
               AS mv
      FROM l"""
    o["iq_top5"] = f"""
      WITH r AS (
        SELECT {EV_TIME} AS time, event_type, value,
               row_number() OVER (PARTITION BY event_type
                                  ORDER BY value DESC, {EV_TIME} ASC) AS rn
        FROM events)
      SELECT time, event_type, value AS top_value FROM r WHERE rn <= 5"""
    o["iq_math_over_agg"] = f"""
      SELECT event_type,
             abs(round(sum(value) / count(value) * -3.55)) AS scaled,
             {fr('sum(value) / count(value)', 4)} AS ratio
      FROM events GROUP BY 1"""
    o["iq_spread_tag"] = """
      SELECT event_type, max(value) - min(value) AS spread_value,
             max(value) AS max_value
      FROM events GROUP BY 1"""
    o["iq_distinct"] = "SELECT DISTINCT user_id FROM events"
    o["iq_where_math"] = f"""
      SELECT event_type, count(value) AS n, {fr('sum(value)', 2)} AS sv
      FROM events
      WHERE value * 2 > 100 AND abs(value - 50) > 5
      GROUP BY 1"""
    o["iq_count_distinct"] = """
      SELECT event_type, count(DISTINCT user_id) AS u
      FROM events GROUP BY 1"""
    # replay of transforms.holt_winters' fixed-parameter recurrence
    # (alpha=0.5, beta=0.1): level/trend carried through a recursive CTE,
    # then 5 forecast steps from the last bucket
    o["iq_holt_winters"] = f"""
      WITH RECURSIVE b AS (
        SELECT ({EV_TIME} // {DAY}) * {DAY} AS time, avg(value) AS y
        FROM events
        WHERE {EV_TIME} >= {JAN1} AND {EV_TIME} < {JAN1 + 14 * DAY}
        GROUP BY 1),
      i AS (SELECT row_number() OVER (ORDER BY time) - 1 AS i, time, y
            FROM b),
      hw(t, lvl, tr) AS (
        SELECT 0,
               (SELECT y FROM i WHERE i = 0),
               (SELECT y FROM i WHERE i = 1) - (SELECT y FROM i WHERE i = 0)
        UNION ALL
        SELECT hw.t + 1,
               0.5 * i.y + 0.5 * (hw.lvl + hw.tr),
               0.1 * ((0.5 * i.y + 0.5 * (hw.lvl + hw.tr)) - hw.lvl)
                 + 0.9 * hw.tr
        FROM hw JOIN i ON i.i = hw.t + 1),
      fin AS (SELECT lvl, tr FROM hw ORDER BY t DESC LIMIT 1),
      lastb AS (SELECT max(time) AS tlast FROM i)
      SELECT lastb.tlast + h * {DAY} AS time,
             {fr('fin.lvl + h * fin.tr', 4)} AS hw
      FROM fin, lastb, (SELECT unnest(generate_series(1, 5)) AS h)"""
    # sample(f,10) = rows with the 10 smallest md5-hashes of time — the
    # engine's deterministic systematic sample, reproduced exactly
    o["iq_sample"] = f"""
      SELECT {EV_TIME} AS time, value AS sample
      FROM events
      ORDER BY {duck_hash64(f"({EV_TIME})::VARCHAR")} ASC, time ASC
      LIMIT 10"""
    o["iq_slimit"] = """
      WITH a AS (SELECT event_type, sum(value) AS sv, count(value) AS n
                 FROM events GROUP BY 1),
      r AS (SELECT *, dense_rank() OVER (ORDER BY event_type) AS rk FROM a)
      SELECT event_type, (floor(sv * 100 + 0.5) / 100) / n AS mv
      FROM r WHERE rk > 1 AND rk <= 3"""

    # -- transforms --------------------------------------------------------
    w = f"OVER (PARTITION BY event_type ORDER BY {EV_TIME})"
    o["tr_difference"] = f"""
      WITH d AS (
        SELECT {EV_TIME} AS time, event_type,
               value - lag(value) {w} AS difference
        FROM events)
      SELECT time, event_type, {fr('difference', 4)} AS difference
      FROM d WHERE difference IS NOT NULL"""
    o["tr_derivative"] = f"""
      WITH d AS (
        SELECT {EV_TIME} AS time, event_type,
               (value - lag(value) {w})
                 / ({EV_TIME} - lag({EV_TIME}) {w})::DOUBLE
                 * {float(HOUR)} AS derivative
        FROM events)
      SELECT time, event_type, {fr('derivative', 4)} AS derivative
      FROM d WHERE derivative IS NOT NULL"""
    o["tr_cumulative_sum"] = f"""
      SELECT {EV_TIME} AS time, event_type,
             {fr("sum(value) OVER (PARTITION BY event_type ORDER BY " + EV_TIME +
                 " ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)", 4)}
             AS cumulative_sum
      FROM events"""
    o["tr_elapsed"] = f"""
      WITH d AS (
        SELECT {EV_TIME} AS time, event_type,
               floor(({EV_TIME} - lag({EV_TIME}) {w}) / 1000000000.0)::BIGINT
                 AS elapsed
        FROM events)
      SELECT time, event_type, elapsed FROM d WHERE elapsed IS NOT NULL"""
    o["tr_moving_average"] = f"""
      WITH d AS (
        SELECT {EV_TIME} AS time, event_type,
               avg(value) OVER (PARTITION BY event_type ORDER BY {EV_TIME}
                 ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS ma,
               count(value) OVER (PARTITION BY event_type ORDER BY {EV_TIME}
                 ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS c
        FROM events)
      SELECT time, event_type, {fr('ma', 4)} AS moving_average
      FROM d WHERE c >= 7"""
    # EMA recurrence replayed exactly: same (1-a)*prev + a*x operand
    # order as the Spark-side float64 loop (alpha = 2/(10+1))
    _ema_a = repr(2.0 / 11)
    o["tr_ema"] = f"""
      WITH RECURSIVE
      p AS MATERIALIZED (SELECT event_type AS s, {EV_TIME} AS t, value AS v,
                   row_number() OVER (PARTITION BY event_type
                                      ORDER BY {EV_TIME}) AS r
            FROM events WHERE value IS NOT NULL),
      e(s, r, t, y) AS (
        SELECT s, r, t, v FROM p WHERE r = 1
        UNION ALL
        SELECT p.s, p.r, p.t, (1.0 - {_ema_a}) * e.y + {_ema_a} * p.v
        FROM e JOIN p ON p.s = e.s AND p.r = e.r + 1)
      SELECT t AS time, s AS event_type, {fr('y', 6)} AS ema FROM e"""
    # DEMA: the recursion carries BOTH chained EMA states (y2 updates from
    # the just-updated y1), mirroring the Spark-side loop's operand order
    o["tr_dema"] = f"""
      WITH RECURSIVE
      p AS MATERIALIZED (SELECT event_type AS s, {EV_TIME} AS t, value AS v,
                   row_number() OVER (PARTITION BY event_type
                                      ORDER BY {EV_TIME}) AS r
            FROM events WHERE value IS NOT NULL),
      e(s, r, t, y1, y2) AS (
        SELECT s, r, t, v, v FROM p WHERE r = 1
        UNION ALL
        SELECT p.s, p.r, p.t,
               (1.0 - {_ema_a}) * e.y1 + {_ema_a} * p.v,
               (1.0 - {_ema_a}) * e.y2 + {_ema_a}
                 * ((1.0 - {_ema_a}) * e.y1 + {_ema_a} * p.v)
        FROM e JOIN p ON p.s = e.s AND p.r = e.r + 1)
      SELECT t AS time, s AS event_type,
             {fr('2.0 * y1 - y2', 6)} AS dema FROM e"""
    # KAMA(10): ER per row from an exact lag(x,10) numerator and a
    # sequential fold over the trailing 10 deltas (sliced from a
    # per-series ordered list — windowed SUM would not pin the float
    # order); then the adaptive recurrence replays the Spark loop
    _kc1 = repr(2.0 / 3.0 - 2.0 / 31.0)
    _kc2 = repr(2.0 / 31.0)
    o["tr_kama"] = f"""
      WITH RECURSIVE
      p AS (SELECT event_type AS s, {EV_TIME} AS t, value AS x,
                   abs(value - lag(value) OVER w) AS d,
                   lag(value, 10) OVER w AS xlag,
                   row_number() OVER w AS r
            FROM events
            WINDOW w AS (PARTITION BY event_type ORDER BY {EV_TIME})),
      dl AS MATERIALIZED (SELECT s, list(d ORDER BY r) AS ds
             FROM p WHERE r >= 2 GROUP BY s),
      sc AS (SELECT p.s, p.t, p.x, p.r,
                    list_reduce(dl.ds[(p.r - 10):(p.r - 1)],
                                (a, b) -> a + b) AS path,
                    abs(p.x - p.xlag) AS chg
             FROM p JOIN dl ON dl.s = p.s WHERE p.r >= 11),
      sc2 AS MATERIALIZED (SELECT s, t, x, r,
                     pow((CASE WHEN path > 0 THEN chg / path ELSE 0.0 END)
                         * {_kc1} + {_kc2}, 2) AS sc
              FROM sc),
      e(s, r, t, y) AS (
        (SELECT s, r, t, x FROM sc2 WHERE r = 11)
        UNION ALL
        SELECT p2.s, p2.r, p2.t, e.y + p2.sc * (p2.x - e.y)
        FROM e JOIN sc2 p2 ON p2.s = e.s AND p2.r = e.r + 1)
      SELECT t AS time, s AS event_type, {fr('y', 6)} AS kama FROM e"""
    # Wilder RSI(14): warmup = sequential fold over the first 14 gains /
    # losses (time order), then the smoothing recursion carries both
    # averages; expression shapes mirror the Spark-side loop exactly
    o["tr_rsi"] = f"""
      WITH RECURSIVE
      d AS (SELECT event_type AS s, {EV_TIME} AS t,
                   greatest(value - lag(value) OVER w, 0.0) AS g,
                   greatest(lag(value) OVER w - value, 0.0) AS l,
                   row_number() OVER w - 1 AS r
            FROM events
            WINDOW w AS (PARTITION BY event_type ORDER BY {EV_TIME})),
      dd AS MATERIALIZED (SELECT * FROM d WHERE r >= 1),
      warm AS (
        SELECT s,
               list_reduce(list(g ORDER BY r) [1:14], (x, y) -> x + y)
                 / 14 AS ag,
               list_reduce(list(l ORDER BY r) [1:14], (x, y) -> x + y)
                 / 14 AS al
        FROM dd WHERE r <= 14 GROUP BY s),
      e(s, r, t, ag, al) AS (
        (SELECT dd.s, 14, dd.t, warm.ag, warm.al
         FROM dd JOIN warm ON warm.s = dd.s WHERE dd.r = 14)
        UNION ALL
        SELECT p.s, p.r, p.t,
               (e.ag * 13.0 + p.g) / 14,
               (e.al * 13.0 + p.l) / 14
        FROM e JOIN dd p ON p.s = e.s AND p.r = e.r + 1)
      SELECT t AS time, s AS event_type,
             {fr('CASE WHEN al = 0.0 THEN 100.0 '
                 'ELSE 100.0 - 100.0 / (1.0 + ag / al) END', 6)} AS rsi
      FROM e"""
    # CMO over the trailing 14 deltas: lag + conditional sums, emitted
    # once 14 deltas exist — mirrors the Spark window exactly
    o["tr_cmo"] = f"""
      WITH d AS (
        SELECT {EV_TIME} AS time, event_type,
               value - lag(value) OVER (PARTITION BY event_type
                                        ORDER BY {EV_TIME}) AS dv
        FROM events),
      s AS (
        SELECT time, event_type,
               sum(CASE WHEN dv > 0 THEN dv ELSE 0.0 END) OVER w AS up,
               sum(CASE WHEN dv < 0 THEN -dv ELSE 0.0 END) OVER w AS dn,
               count(dv) OVER w AS c
        FROM d WINDOW w AS (PARTITION BY event_type ORDER BY time
                            ROWS BETWEEN 13 PRECEDING AND CURRENT ROW))
      SELECT time, event_type,
             {fr('CASE WHEN up + dn > 0 '
                 'THEN 100.0 * (up - dn) / (up + dn) ELSE 0.0 END', 6)}
               AS cmo
      FROM s WHERE c >= 14"""
    o["tr_integral"] = f"""
      WITH d AS (
        SELECT event_type,
               (value + lag(value) {w}) / 2.0
                 * ({EV_TIME} - lag({EV_TIME}) {w})::DOUBLE / {float(HOUR)}
                 AS trap
        FROM events)
      SELECT event_type, {fr('sum(trap)', 2)} AS integral
      FROM d GROUP BY 1"""
    o["tr_histogram"] = """
      SELECT event_type,
             (CASE WHEN value < 0 THEN 0
                   WHEN value >= 200 THEN 21
                   ELSE floor(value / 10.0)::INT + 1 END)::BIGINT AS bucket,
             count(*) AS bucket_count
      FROM events GROUP BY 1, 2"""

    # -- sort/limit/dedup --------------------------------------------------
    ev_cols = f"event_id, {EV_TIME} AS time, user_id, event_type, value, props"
    o["dedup_points"] = f"""
      SELECT DISTINCT * FROM (
        SELECT {ev_cols} FROM events
        UNION ALL
        SELECT {ev_cols} FROM events)"""
    o["limit_offset"] = f"""
      SELECT {EV_TIME} AS time, event_id, event_type, value
      FROM events ORDER BY time, event_id LIMIT 200 OFFSET 50"""

    # -- meta --------------------------------------------------------------
    names = ", ".join(f"('{n}')" for n in sorted(
        ["region", "nation", "customer", "supplier", "part", "orders",
         "lineitem", "events", "documents", "embeddings"]))
    o["show_measurements"] = f"SELECT name FROM (VALUES {names}) t(name)"
    o["show_tag_values"] = """
      SELECT DISTINCT 'event_type' AS key, event_type AS value FROM events"""
    o["show_series"] = """
      SELECT DISTINCT 'events,event_type=' || event_type AS key FROM events"""
    o["show_cardinality"] = """
      SELECT count(DISTINCT event_type) AS series_card,
             count(DISTINCT event_type) AS tag_value_card,
             4 AS field_key_card
      FROM events"""
    # Bare SHOW <x> CARDINALITY is HLL-ESTIMATED (InfluxDB 1.x
    # semantics; server.py:_show): replay the m=256 sketch of
    # operators/sketch.hll_distinct in SQL over the same meta-scan row
    # identities, concat_ws null-skip included, fr6 then floor(+0.5).
    from influxdb_ha_spark.operators.sketch import (
        HLL_M as _HM, HLL_NUMER as _HN)

    def _hll_est_sub(sel: str, alias: str) -> str:
        raw = f"{_HN!r} / s_total::DOUBLE"
        est = (f"CASE WHEN {raw} <= {2.5 * _HM!r} AND v_empty > 0 "
               f"THEN {float(_HM)!r} * ln({float(_HM)!r}"
               f" / v_empty::DOUBLE) ELSE {raw} END")
        return f"""(WITH vv AS ({sel}),
      hhc AS (SELECT {duck_hash64('v')} AS h FROM vv
              WHERE v IS NOT NULL),
      bbc AS (SELECT h % {_HM} AS j, CASE WHEN h // {_HM} = 0 THEN 53
                   ELSE 53 - length(bin(h // {_HM})) END AS rho
              FROM hhc),
      regsc AS (SELECT j, max(rho) AS m FROM bbc GROUP BY 1),
      ffc AS (SELECT count(*)::BIGINT AS used,
                    sum(1::BIGINT << (53 - m)::INT)::BIGINT AS s_used
              FROM regsc),
      ttc AS (SELECT ({_HM} - used)::BIGINT AS v_empty,
                    (s_used + ({_HM} - used)
                     * (1::BIGINT << 53))::BIGINT AS s_total
              FROM ffc)
      SELECT floor(coalesce({fr(est, 6)}, 0.0) + 0.5)::BIGINT
             AS {alias} FROM ttc)"""

    _series_sel = ("SELECT DISTINCT CASE WHEN event_type IS NULL "
                   "THEN 'events,event_type' "
                   "ELSE 'events,event_type=' || event_type END AS v "
                   "FROM events")
    _tagv_sel = ("SELECT DISTINCT CASE WHEN event_type IS NULL "
                 "THEN 'event_type' "
                 "ELSE 'event_type' || chr(31) || event_type END AS v "
                 "FROM events")
    o["show_cardinality_est"] = (
        "SELECT s.series_card_est, t.tag_value_card_est FROM "
        + _hll_est_sub(_series_sel, "series_card_est") + " s, "
        + _hll_est_sub(_tagv_sel, "tag_value_card_est") + " t")
    # schema-derived meta: the oracle states the known schema roles
    o["show_tag_keys"] = """
      SELECT 'events' AS measurement, 'event_type' AS tagKey"""
    o["show_field_keys"] = """
      SELECT 'events' AS measurement, unnest(['value','event_id','user_id',
             'props']) AS fieldKey"""
    o["cq_backfill"] = f"""
      SELECT ({EV_TIME} // {DAY}) * {DAY} AS time, event_type,
             count(value) AS n
      FROM events GROUP BY 1, 2"""

    # -- LLM ops -----------------------------------------------------------
    o["doc_exact_dedup"] = """
      SELECT md5(text) AS digest, min(doc_id) AS doc_id
      FROM documents GROUP BY 1"""
    o["doc_pack_sequences"] = f"""
      WITH t AS (SELECT doc_id, len({TOKS})::BIGINT AS n_tokens
                 FROM documents),
           c AS (SELECT doc_id, n_tokens,
                        (sum(n_tokens) OVER (ORDER BY doc_id
                          ROWS UNBOUNDED PRECEDING))::BIGINT AS cum
                 FROM t)
      SELECT doc_id, n_tokens,
             (cum - n_tokens) AS token_offset,
             ((cum - n_tokens) // 512) AS first_seq,
             ((CASE WHEN n_tokens > 0 THEN cum - 1
                    ELSE cum - n_tokens END) // 512) AS last_seq
      FROM c"""
    _em, _ip, _ph = (p for _, p, _r in _PII)
    o["doc_pii_scrub"] = f"""
      WITH s AS (
        SELECT doc_id,
               text || ' contact user' || doc_id || '@example.com ip 10.0.'
                    || (doc_id % 256) || '.7 call 555-'
                    || lpad((doc_id % 10000)::VARCHAR, 4, '0') AS t0
        FROM documents),
      a AS (SELECT doc_id,
                   len(regexp_extract_all(t0, '{_em}'))::BIGINT AS n_emails,
                   regexp_replace(t0, '{_em}', '<EMAIL>', 'g') AS t1 FROM s),
      b AS (SELECT doc_id, n_emails,
                   len(regexp_extract_all(t1, '{_ip}'))::BIGINT AS n_ips,
                   regexp_replace(t1, '{_ip}', '<IP>', 'g') AS t2 FROM a),
      c AS (SELECT doc_id, n_emails, n_ips,
                   len(regexp_extract_all(t2, '{_ph}'))::BIGINT AS n_phones,
                   regexp_replace(t2, '{_ph}', '<PHONE>', 'g') AS t3 FROM b)
      SELECT doc_id, n_emails, n_ips, n_phones, md5(t3) AS scrubbed_md5
      FROM c"""
    o["doc_repetition"] = f"""
      WITH sh AS ({_shingles_cte(2)}),
           ex AS (SELECT doc_id, unnest(sh) AS g FROM sh),
           cnt AS (SELECT doc_id, g, count(*) AS n FROM ex GROUP BY 1, 2)
      SELECT doc_id, sum(n)::BIGINT AS n_grams,
             count(*)::BIGINT AS n_distinct_grams,
             {fr('1.0 - count(*) / (sum(n)::DOUBLE)', 6)} AS dup_gram_frac,
             {fr('max(n) / (sum(n)::DOUBLE)', 6)} AS top_gram_frac
      FROM cnt GROUP BY 1"""
    o["doc_quality_filter"] = f"""
      WITH b AS (
        SELECT doc_id, len({TOKS}) AS n_words,
               {_lang_hits('en')} AS sw,
               {mean_wl} AS mwl,
               CASE WHEN length(text) > 0
                    THEN {punct} / length(text)::DOUBLE
                    ELSE 0.0 END AS pr
        FROM documents)
      SELECT doc_id,
             (n_words >= 10 AND n_words <= 100000) AS ok_len,
             (mwl >= 3.0 AND mwl <= 10.0) AS ok_mean_word_len,
             (sw >= 2) AS ok_stopwords,
             (pr <= 0.1) AS ok_punct,
             ((n_words >= 10 AND n_words <= 100000) AND (mwl >= 3.0 AND mwl <= 10.0)
              AND (sw >= 2) AND (pr <= 0.1)) AS keep
      FROM b"""
    o["doc_weighted_sample"] = f"""
      SELECT doc_id, source FROM documents
      WHERE {duck_hash64('doc_id::VARCHAR')} % 1000000 <
            CASE source WHEN 'src0' THEN 1000000
                        WHEN 'src1' THEN 500000
                        WHEN 'src2' THEN 250000
                        ELSE 100000 END"""
    _l2 = ("sqrt(list_reduce(list_transform(embedding, "
           "x -> x::DOUBLE * x::DOUBLE), (a, b) -> a + b))")
    o["emb_dim_stats"] = f"""
      WITH ex AS (SELECT i - 1 AS dim, embedding[i]::DOUBLE AS v
                  FROM embeddings, generate_series(1, 64) AS g(i))
      SELECT dim, {fr('min(v)', 6)} AS dim_min, {fr('max(v)', 6)} AS dim_max,
             {fr('avg(v)', 6)} AS dim_mean, count(*)::BIGINT AS n
      FROM ex GROUP BY 1"""
    o["emb_normalize"] = f"""
      WITH n AS (SELECT vec_id, {_l2} AS norm, embedding[1]::DOUBLE AS e0
                 FROM embeddings)
      SELECT vec_id, {fr('norm', 6)} AS norm,
             {fr('e0 / (CASE WHEN norm > 0 THEN norm ELSE 1.0 END)', 6)} AS v0
      FROM n"""
    o["emb_quantize"] = """
      WITH ex AS (SELECT vec_id, i - 1 AS dim, embedding[i]::DOUBLE AS v
                  FROM embeddings, generate_series(1, 64) AS g(i)),
           st AS (SELECT dim, min(v) AS mn, max(v) AS mx FROM ex GROUP BY 1)
      SELECT e.vec_id, e.dim,
             (CASE WHEN s.mx > s.mn THEN least(255, greatest(0,
                floor((e.v - s.mn) / (s.mx - s.mn) * 256)))
              ELSE 0 END)::INTEGER AS q
      FROM ex e JOIN st s USING (dim)"""
    o["doc_fingerprint_dedup"] = f"""
      SELECT md5(array_to_string(list_sort(list_distinct({TOKS})), ' '))
               AS fingerprint,
             min(doc_id) AS doc_id, count(*) AS n_docs
      FROM documents GROUP BY 1"""
    # canonical-document election: same fingerprint key as
    # doc_fingerprint_dedup; within a cluster the (source-priority, id)
    # first row wins; every doc keeps an audit row
    # r8 (ADVICE): TRY_CAST mirrors Spark's null-on-non-numeric cast
    # (a bare ::BIGINT would THROW on a non-'srcN' source), and NULLS
    # LAST is pinned explicitly to match the operator's asc_nulls_last
    # — the contract is total over arbitrary sources, not just the
    # clean fixture
    o["doc_canonical"] = f"""
      WITH d AS (SELECT doc_id,
                   md5(array_to_string(list_sort(list_distinct({TOKS})), ' '))
                     AS fingerprint,
                   TRY_CAST(substring(source, 4, 8) AS BIGINT) AS prio
                 FROM documents WHERE text IS NOT NULL)
      SELECT doc_id, fingerprint,
             first_value(doc_id) OVER w AS canonical_id,
             doc_id = first_value(doc_id) OVER w AS is_canonical
      FROM d
      WINDOW w AS (PARTITION BY fingerprint
                   ORDER BY prio ASC NULLS LAST, doc_id ASC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"""
    o["doc_minhash_sig"] = f"""
      WITH sh AS ({_shingles_cte(3)}),
      sig AS ({_minhash_sig_sql(16, 3)})
      SELECT doc_id, (g - 1)::INT AS perm, u AS minhash
      FROM (SELECT doc_id, unnest(s) AS u, generate_subscripts(s, 1) AS g
            FROM sig)"""
    o["doc_minhash_candidates"] = _candidates_sql(3)
    o["doc_near_dups"] = _near_dups_sql(3, 0.7)
    # cross-snapshot dedup screen: the near-dup pair set filtered to
    # pairs straddling the new/reference split, oriented new -> ref
    # (MATERIALIZED: nd is referenced once but carries the whole
    # shingle+banding pipeline — keep DuckDB from re-inlining it into
    # both CASE branches' join probes)
    o["doc_cross_dedup"] = f"""
      WITH nd AS MATERIALIZED ({_near_dups_sql(3, 0.7)}),
      s AS (SELECT doc_id,
                   TRY_CAST(substring(source, 4, 8) AS BIGINT) < 10 AS nw
            FROM documents)
      SELECT CASE WHEN sa.nw THEN nd.id_a ELSE nd.id_b END AS new_id,
             CASE WHEN sa.nw THEN nd.id_b ELSE nd.id_a END AS ref_id,
             nd.jaccard
      FROM nd JOIN s sa ON sa.doc_id = nd.id_a
              JOIN s sb ON sb.doc_id = nd.id_b
      WHERE sa.nw != sb.nw"""
    # `nd` is referenced twice by `e` (both edge directions) — without
    # MATERIALIZED DuckDB inlines and recomputes the whole minhash+verify
    # pipeline per reference (~2× the oracle wall time)
    o["doc_dedup_clusters"] = f"""
      WITH RECURSIVE nd AS MATERIALIZED ({_near_dups_sql(3, 0.7)}),
      e AS (SELECT id_a AS a, id_b AS b FROM nd
            UNION SELECT id_b, id_a FROM nd),
      reach(a, b) AS (
        SELECT a, b FROM e
        UNION
        SELECT r.a, e.b FROM reach r JOIN e ON r.b = e.a
        WHERE e.b != r.a),
      m AS (SELECT a, min(b) AS mb FROM reach GROUP BY a)
      SELECT a AS doc_id, least(a, mb) AS cluster FROM m"""
    # surviving corpus after cluster-representative dedup: everything
    # except non-min members of a duplicate component
    o["doc_dedup_apply"] = f"""
      WITH RECURSIVE nd AS MATERIALIZED ({_near_dups_sql(3, 0.7)}),
      e AS (SELECT id_a AS a, id_b AS b FROM nd
            UNION SELECT id_b, id_a FROM nd),
      reach(a, b) AS (
        SELECT a, b FROM e
        UNION
        SELECT r.a, e.b FROM reach r JOIN e ON r.b = e.a
        WHERE e.b != r.a),
      m AS (SELECT a, min(b) AS mb FROM reach GROUP BY a),
      losers AS (SELECT a FROM m WHERE least(a, mb) != a)
      SELECT doc_id FROM documents
      WHERE doc_id NOT IN (SELECT a FROM losers)"""
    o["doc_ngram_jaccard"] = _near_dups_sql(2, 0.5)
    # n-gram test-set decontamination: distinct 3-gram overlap between the
    # benchmark subset (doc_id % 97 = 0) and the rest of the corpus
    o["doc_decontaminate"] = f"""
      WITH sh AS ({_shingles_cte(3)}),
      ev AS (SELECT DISTINCT unnest(list_distinct(sh)) AS g
             FROM sh WHERE doc_id % 97 = 0),
      tr AS (SELECT doc_id, unnest(list_distinct(sh)) AS g
             FROM sh WHERE doc_id % 97 <> 0)
      SELECT tr.doc_id, count(*) AS n_shared_shingles
      FROM tr JOIN ev USING (g) GROUP BY 1"""
    # JSON property-bag extraction over events.props
    o["ev_json_props"] = f"""
      SELECT event_type, count(k) AS n,
             {fr('avg(k)', 6)} AS avg_k,
             min(k) AS min_k, max(k) AS max_k
      FROM (SELECT event_type, CAST(props->>'k' AS BIGINT) AS k
            FROM events)
      GROUP BY event_type"""
    # bloom prefilter + exact verify ≡ the exact operator (no false
    # negatives; false positives die in the verify join)
    o["doc_decontaminate_bloom"] = o["doc_decontaminate"]
    # normalized contamination fraction (Brown et al. 2020 appendix C):
    # EVERY train doc, distinct-5-gram overlap with the % 89 benchmark
    # subset; denominator = the doc's own distinct-gram count
    o["doc_ngram_overlap"] = f"""
      WITH sh AS ({_shingles_cte(5)}),
      ev AS (SELECT DISTINCT unnest(list_distinct(sh)) AS g
             FROM sh WHERE doc_id % 89 = 0 AND sh IS NOT NULL),
      tot AS (SELECT doc_id,
                     len(list_distinct(sh))::BIGINT AS n_ngrams
              FROM sh WHERE doc_id % 89 <> 0 AND sh IS NOT NULL),
      tr AS (SELECT doc_id, unnest(list_distinct(sh)) AS g
             FROM sh WHERE doc_id % 89 <> 0),
      shared AS (SELECT tr.doc_id, count(*) AS n_shared
                 FROM tr JOIN ev USING (g) GROUP BY 1),
      f AS (SELECT t.doc_id, t.n_ngrams,
                   coalesce(s.n_shared, 0)::BIGINT AS n_shared
            FROM tot t LEFT JOIN shared s USING (doc_id)),
      z AS (SELECT doc_id, n_ngrams, n_shared,
                   CASE WHEN n_ngrams > 0 THEN
                     {fr('(n_shared::DOUBLE) / (n_ngrams::DOUBLE)', 6)}
                   ELSE 0.0 END AS overlap_frac
            FROM f)
      SELECT doc_id, n_ngrams, n_shared, overlap_frac,
             overlap_frac > 0.1 AS contaminated
      FROM z"""
    # token-budget mixing: per-source integer token totals -> exact
    # integer ppm thresholds (floor divisions replay the driver's
    # Python integer arithmetic literally), hash-threshold keep flags
    o["doc_token_mixture"] = f"""
      WITH d AS (SELECT doc_id, source, len({TOKS})::BIGINT AS n_tokens
                 FROM documents WHERE text IS NOT NULL),
      s AS (SELECT source, sum(n_tokens)::BIGINT AS st FROM d GROUP BY 1),
      w AS (SELECT source, st,
                   CASE source WHEN 'src0' THEN 300000
                               WHEN 'src1' THEN 200000
                               WHEN 'src2' THEN 100000
                               ELSE 0 END AS wppm
            FROM s),
      r AS (SELECT source,
                   CASE WHEN st > 0 THEN least(1000000,
                        ((5000::BIGINT * wppm) // 1000000) * 1000000 // st)
                   ELSE 0 END AS thr
            FROM w)
      SELECT d.doc_id, d.source, d.n_tokens,
             ({duck_hash64("d.doc_id::VARCHAR")} % 1000000) < r.thr AS keep
      FROM d JOIN r USING (source)"""
    o["doc_train_test_split"] = f"""
      SELECT doc_id,
             CASE WHEN {duck_hash64('doc_id::VARCHAR')} % 100 < 10
                  THEN 'test' ELSE 'train' END AS split
      FROM documents"""
    o["doc_stratified_sample"] = f"""
      WITH r AS (
        SELECT source, doc_id,
               row_number() OVER (PARTITION BY source
                 ORDER BY {duck_hash64('doc_id::VARCHAR')} ASC, doc_id ASC)
                 AS rk
        FROM documents)
      SELECT source, doc_id FROM r WHERE rk <= 10"""
    o["doc_simhash"] = _simhash_sql(32)
    o["doc_simhash_near"] = f"""
      WITH sk AS ({_simhash_sql(32)})
      SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             bit_count(xor(a.simhash, b.simhash)) AS hamming
      FROM sk a JOIN sk b ON a.doc_id < b.doc_id
      WHERE bit_count(xor(a.simhash, b.simhash)) <= 3"""
    # exact-substring dedup (Lee et al. 2021): positioned k-token span
    # hashes → df-capped posting join → diagonal row_number staircase.
    # Replays substring_duplicates(k=8, min_run_tokens=12, max_df=50)
    # term for term — same md5-64 span hash, same BETWEEN df window,
    # same distinct-doc pair expansion, same k-1 run-length offset
    _ssk, _ssdf, _ssmr = 8, 50, 12
    o["doc_substring_dup"] = f"""
      WITH t AS (SELECT doc_id, {TOKS} AS tk FROM documents
                 WHERE text IS NOT NULL),
      sp0 AS (SELECT doc_id,
              [{{'pos': i - 1,
                 'h': {duck_hash64(f"array_to_string(tk[i:i+{_ssk - 1}], ' ')")}}}
               FOR i IN generate_series(1, len(tk) - {_ssk - 1})] AS hs
              FROM t WHERE len(tk) >= {_ssk}),
      sp1 AS (SELECT doc_id, unnest(hs) AS s FROM sp0),
      sp AS (SELECT doc_id, s.pos AS pos, s.h AS h FROM sp1),
      dfc AS (SELECT h FROM sp GROUP BY h
              HAVING count(*) BETWEEN 2 AND {_ssdf}),
      m AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.pos AS pa,
                   a.pos - b.pos AS diag
            FROM sp a JOIN dfc USING (h) JOIN sp b USING (h)
            WHERE a.doc_id < b.doc_id),
      r AS (SELECT id_a, id_b, diag, pa,
                   pa - row_number() OVER (PARTITION BY id_a, id_b, diag
                                           ORDER BY pa) AS st
            FROM m),
      runs AS (SELECT id_a, id_b, count(*) + {_ssk - 1} AS run_len
               FROM r GROUP BY id_a, id_b, diag, st)
      SELECT id_a, id_b, max(run_len) AS max_run_tokens,
             count(*) AS n_runs
      FROM runs WHERE run_len >= {_ssmr} GROUP BY id_a, id_b"""
    # BPE training replay: 8 UNROLLED merge stages (the MMR-unroll
    # precedent — each stage's argmax is sequential by definition).
    # Stage k: weighted adjacent-pair counts over word table w{k-1},
    # argmax with the (count DESC, a ASC, b ASC) tie-break, then the
    # SAME run-parity merge algebra the Spark side applies (occurrence
    # indices -> x-i run keys -> every-other-in-run -> rebuild); DuckDB
    # lambda indices are 1-based vs Spark's 0-based, which cancels in
    # the parity arithmetic. The corpus appears once, in w0.
    _bpe_stages = []
    _bpe_finals = []
    for _k in range(1, 9):
        _p = f"w{_k - 1}"
        _bpe_stages.append(f"""
      pc{_k} AS MATERIALIZED (SELECT p.a AS a, p.b AS b, sum(cnt) AS c
            FROM (SELECT cnt,
                    unnest([{{'a': syms[i], 'b': syms[i + 1]}}
                            FOR i IN generate_series(1, len(syms) - 1)]) AS p
                  FROM {_p} WHERE len(syms) >= 2)
            GROUP BY 1, 2),
      m{_k} AS MATERIALIZED (SELECT a, b, c FROM pc{_k}
                ORDER BY c DESC, a ASC, b ASC LIMIT 1),
      w{_k} AS MATERIALIZED (SELECT w, cnt, syms2 AS syms FROM (
        SELECT w, cnt,
          [i FOR i IN generate_series(1, len(syms) - 1)
             IF syms[i] = m.a AND syms[i + 1] = m.b] AS occ,
          list_transform(occ, (x, i) -> x - i) AS rs,
          list_filter(occ, (x, i) ->
            (i - list_position(rs, x - i)) % 2 = 0) AS ch,
          list_filter(list_transform(generate_series(1, len(syms)), p ->
            CASE WHEN list_contains(ch, p) THEN m.a || m.b
                 WHEN list_contains(ch, p - 1) THEN NULL
                 ELSE syms[p] END), x -> x IS NOT NULL) AS syms2
        FROM {_p}, m{_k} m)
        -- merges exhausted before stage {_k}: carry the last generation
        -- forward, matching bpe_train's loop break (r5 review — the
        -- cross join above would otherwise empty every later stage and
        -- doc_bpe_encode's vocab with it)
        UNION ALL SELECT w, cnt, syms FROM {_p}
        WHERE NOT EXISTS (SELECT 1 FROM m{_k}))""")
        _bpe_finals.append(
            f"SELECT {_k} AS rank, a AS \"left\", b AS \"right\", "
            f"c::BIGINT AS pair_count FROM m{_k}")
    _bpe_with = (f"""
      WITH t AS (SELECT doc_id, {TOKS} AS tk
                 FROM documents WHERE text IS NOT NULL),
      wc AS (SELECT w, count(*) AS cnt
             FROM (SELECT unnest(tk) AS w FROM t) GROUP BY 1),
      w0 AS MATERIALIZED (SELECT w, cnt,
                    list_append([w[i] FOR i IN
                                 generate_series(1, len(w))], '</w>') AS syms
             FROM wc),"""
      + ",".join(_bpe_stages))
    o["doc_bpe_train"] = (_bpe_with + """
      """ + " UNION ALL ".join(_bpe_finals))
    # encode = the SAME trained chain's final word table as the encoder:
    # per-doc words join (word -> segment count), one sum per doc
    o["doc_bpe_encode"] = (_bpe_with + """,
      voc AS (SELECT w, len(syms)::BIGINT AS n_tokens FROM w8),
      ex AS (SELECT doc_id, unnest(tk) AS w FROM t)
      SELECT ex.doc_id, count(*)::BIGINT AS n_words,
             sum(coalesce(voc.n_tokens, len(ex.w) + 1))::BIGINT
               AS n_bpe_tokens
      FROM ex LEFT JOIN voc USING (w) GROUP BY 1""")
    # DSIR (Xie et al. 2023): add-1-smoothed log-likelihood ratio of the
    # target (lang='en') hashed unigram+bigram model to the raw model.
    # ln() here and math.log in the operator's Python weight table share
    # libm — the lm_score precedent; fold order mirrors Spark's
    # aggregate() left fold via list_prepend(0.0, ...)
    _dsB = 1024
    _dsH = duck_hash64("array_to_string(tk[i:i+1], ' ')")
    o["doc_dsir_scores"] = f"""
      WITH t AS (SELECT doc_id, coalesce(lang = 'en', FALSE) AS is_t,
                        {TOKS} AS tk
                 FROM documents WHERE text IS NOT NULL),
      f AS (SELECT doc_id, is_t,
              list_concat(
                list_transform(tk, x -> {duck_hash64('x')} % {_dsB}),
                CASE WHEN len(tk) < 2 THEN []::BIGINT[] ELSE
                  [{_dsH} % {_dsB}
                   FOR i IN generate_series(1, len(tk) - 1)] END) AS bs
            FROM t),
      ex AS (SELECT is_t, unnest(bs) AS b FROM f),
      ct AS (SELECT b, count(*) AS c FROM ex WHERE is_t GROUP BY b),
      cr AS (SELECT b, count(*) AS c FROM ex WHERE NOT is_t GROUP BY b),
      -- coalesce: a one-sided corpus (every doc target, or none)
      -- leaves ct/cr empty and sum() NULL, which would NULL every
      -- weight while the Python side smooths finitely (r5 review)
      nt AS (SELECT coalesce(sum(c), 0) AS n FROM ct),
      nr AS (SELECT coalesce(sum(c), 0) AS n FROM cr),
      w AS (SELECT g.b,
              ln((coalesce(ct.c, 0) + 1.0) / (nt.n + {_dsB}.0))
            - ln((coalesce(cr.c, 0) + 1.0) / (nr.n + {_dsB}.0)) AS w
            FROM generate_series(0, {_dsB - 1}) g(b)
            LEFT JOIN ct ON ct.b = g.b LEFT JOIN cr ON cr.b = g.b
            CROSS JOIN nt CROSS JOIN nr),
      wa AS (SELECT list(w ORDER BY b) AS arr FROM w)
      SELECT f.doc_id, len(f.bs)::BIGINT AS n_feats,
             floor(list_reduce(list_prepend(0.0,
               list_transform(f.bs, x -> wa.arr[(x + 1)::INT])),
               (a, y) -> a + y) * 1e6 + 0.5) / 1e6 AS dsir_logratio
      FROM f CROSS JOIN wa"""

    emb_cast = "SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings"
    cos_qc = _cos("q.v", "c.v")
    o["emb_brute_topk"] = f"""
      WITH e AS ({emb_cast}),
      q AS (SELECT * FROM e WHERE vec_id < 10),
      scored AS (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               round({cos_qc}, 6) AS cosine
        FROM e c CROSS JOIN q WHERE c.vec_id != q.vec_id),
      r AS (SELECT *, row_number() OVER (PARTITION BY query_id
              ORDER BY cosine DESC, neighbor_id ASC) AS rank FROM scored)
      SELECT query_id, neighbor_id, cosine, rank FROM r WHERE rank <= 5"""
    # structural invariants of distributed Lloyd's: k centroids of input
    # dim with finite coords, every vector assigned (training itself is
    # iterative — not SQL-expressible)
    o["emb_kmeans_train"] = """
      SELECT 8 AS k, max(len(embedding)) AS dim,
             TRUE AS centroids_finite, count(*) AS n_assigned
      FROM embeddings"""
    # PCA: the eigendecomposition itself is not SQL-expressible, but the
    # gate's VALUE columns are — total and top-k-axes per-dim population
    # variance recomputed here from raw vectors with the identical
    # decimal-moment + floor-micro-unit chain (integer-exact compare);
    # the booleans are Spark-side falsifiable invariants vs TRUE
    o["emb_pca"] = """
      WITH ex AS (SELECT i - 1 AS dim, embedding[i]::DOUBLE AS x
                  FROM embeddings, generate_series(1, 64) AS g(i)),
      s AS (SELECT dim, sum(CAST(x AS DECIMAL(28,10)))::DOUBLE AS s1,
                   sum(CAST(x * x AS DECIMAL(28,10)))::DOUBLE AS s2,
                   count(*) AS n
            FROM ex GROUP BY 1),
      v AS (SELECT dim,
                   floor((s2 / n - (s1 / n) * (s1 / n)) * 1e6 + 0.5)::BIGINT
                     AS vm
            FROM s)
      SELECT 8 AS k, 64 AS dim, (SELECT max(n) FROM s)::BIGINT AS n_rows,
             (SELECT sum(vm) FROM v)::BIGINT AS total_var_micro,
             (SELECT sum(vm) FROM
               (SELECT vm FROM v ORDER BY vm DESC LIMIT 8))::BIGINT
               AS axes_var_topk_micro,
             TRUE AS trace_ok, TRUE AS orthonormal_ok,
             TRUE AS pca_beats_axes, TRUE AS proj_energy_ok"""
    # PQ is trained iteratively (not SQL-expressible) — the gate mirrors
    # the structural invariants + recall floor (see q_emb_pq_topk)
    o["emb_pq_topk"] = f"""
      WITH e AS ({emb_cast})
      SELECT vec_id AS query_id, 5::BIGINT AS n_results,
             TRUE AS valid, TRUE AS recall_ok
      FROM e WHERE vec_id < 10"""
    # IVF+PQ composite: PQ training is iterative (not SQL-expressible)
    # so n_results/valid/in_probed/recall_ok are Spark-computed
    # invariants vs expected constants — but `probed` is replayed
    # INDEPENDENTLY here from the raw vectors (same assignment CTE as
    # emb_ivf_topk, nprobe=2), so a cosine / tie-break / assignment
    # regression mismatches the gate even though both of Spark's own
    # checks would agree with each other
    o["emb_ivfpq_topk"] = f"""
      WITH e AS ({emb_cast}),
      q AS (SELECT * FROM e WHERE vec_id < 10),
      cent AS (SELECT vec_id AS centroid_id, v FROM e WHERE vec_id < 8),
      p0 AS (
        SELECT q.vec_id AS query_id, c.centroid_id,
               row_number() OVER (PARTITION BY q.vec_id
                 ORDER BY {_cos("q.v", "c.v")} DESC, c.centroid_id ASC) AS r
        FROM q CROSS JOIN cent c)
      SELECT query_id, 5::BIGINT AS n_results, TRUE AS valid,
             TRUE AS in_probed,
             array_to_string(list_sort(list(centroid_id)), ',') AS probed,
             TRUE AS recall_ok
      FROM p0 WHERE r <= 2 GROUP BY query_id"""
    o["emb_ivf_topk"] = f"""
      WITH e AS ({emb_cast}),
      q AS (SELECT * FROM e WHERE vec_id < 10),
      cent AS (SELECT vec_id AS centroid_id, v FROM e WHERE vec_id < 8),
      assign0 AS (
        SELECT q.vec_id, c.centroid_id, {_cos("q.v", "c.v")} AS sim,
               row_number() OVER (PARTITION BY q.vec_id
                 ORDER BY {_cos("q.v", "c.v")} DESC, c.centroid_id ASC) AS r
        FROM e q CROSS JOIN cent c),
      assigned AS (SELECT vec_id AS neighbor_id, centroid_id
                   FROM assign0 WHERE r = 1),
      probes0 AS (
        SELECT q.vec_id AS query_id, c.centroid_id,
               row_number() OVER (PARTITION BY q.vec_id
                 ORDER BY {_cos("q.v", "c.v")} DESC, c.centroid_id ASC) AS r
        FROM q CROSS JOIN cent c),
      probes AS (SELECT query_id, centroid_id FROM probes0 WHERE r <= 2),
      cand AS (
        SELECT p.query_id, a.neighbor_id
        FROM probes p JOIN assigned a USING (centroid_id)
        WHERE a.neighbor_id != p.query_id),
      scored AS (
        SELECT cand.query_id, cand.neighbor_id,
               round({_cos("qe.v", "ne.v")}, 6) AS cosine
        FROM cand
        JOIN e qe ON qe.vec_id = cand.query_id
        JOIN e ne ON ne.vec_id = cand.neighbor_id),
      r AS (SELECT *, row_number() OVER (PARTITION BY query_id
              ORDER BY cosine DESC, neighbor_id ASC) AS rank FROM scored)
      SELECT query_id, neighbor_id, cosine, rank FROM r WHERE rank <= 5"""
    # Recall@k: composed VERBATIM from the two result-set oracles
    # above (nested WITH in subqueries), so the eval can never drift
    # from the definitions it grades
    # Per-cluster purity: the IVF assignment CTE (sim DESC, centroid
    # ASC argmax) + one (centroid, label) count, majority by the pinned
    # (count DESC, label ASC) tie-break, one round-6 division
    o["emb_cluster_purity"] = f"""
      WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v
                 FROM embeddings WHERE label IS NOT NULL),
      cent AS (SELECT vec_id AS centroid_id, embedding::DOUBLE[] AS v
               FROM embeddings WHERE vec_id < 8),
      assign0 AS (
        SELECT e.vec_id, e.label, c.centroid_id,
               row_number() OVER (PARTITION BY e.vec_id
                 ORDER BY {_cos("e.v", "c.v")} DESC, c.centroid_id ASC) AS r
        FROM e CROSS JOIN cent c),
      a AS (SELECT vec_id, label, centroid_id FROM assign0 WHERE r = 1),
      cl AS (SELECT centroid_id, label, count(*)::BIGINT AS n
             FROM a GROUP BY 1, 2),
      sizes AS (SELECT centroid_id, sum(n)::BIGINT AS n_vectors
                FROM cl GROUP BY 1),
      best0 AS (SELECT centroid_id, label, n,
                       row_number() OVER (PARTITION BY centroid_id
                         ORDER BY n DESC, label ASC) AS r
                FROM cl),
      best AS (SELECT centroid_id, label AS majority_label,
                      n AS n_majority FROM best0 WHERE r = 1)
      SELECT s.centroid_id, s.n_vectors, b.majority_label, b.n_majority,
             {fr('b.n_majority::DOUBLE / s.n_vectors::DOUBLE', 6)} AS purity
      FROM sizes s JOIN best b USING (centroid_id)"""
    # Distance-to-centroid outlier screen: the IVF assignment CTE over
    # ALL vectors, round-6 cosine to the assigned centroid, bottom-5%
    # per cluster by the exact integer rank rule (no interpolation)
    o["emb_outliers"] = f"""
      WITH e AS ({emb_cast.replace('embedding', 'embedding')}),
      ec AS (SELECT vec_id, v FROM e),
      cent AS (SELECT vec_id AS centroid_id, v FROM e WHERE vec_id < 8),
      assign0 AS (
        SELECT ec.vec_id, c.centroid_id, {_cos("ec.v", "c.v")} AS sim,
               row_number() OVER (PARTITION BY ec.vec_id
                 ORDER BY {_cos("ec.v", "c.v")} DESC, c.centroid_id ASC)
                 AS r
        FROM ec CROSS JOIN cent c),
      a AS (SELECT vec_id, centroid_id, round(sim, 6) AS cosine
            FROM assign0 WHERE r = 1),
      rk AS (SELECT *, row_number() OVER (PARTITION BY centroid_id
                 ORDER BY cosine ASC, vec_id ASC) AS rank,
                 count(*) OVER (PARTITION BY centroid_id) AS n
             FROM a)
      SELECT vec_id, centroid_id, cosine, rank::INT AS rank,
             (100 * rank <= 5 * n) AS is_outlier
      FROM rk"""
    o["emb_recall"] = f"""
      WITH ann AS ({o['emb_ivf_topk']}),
      exact AS ({o['emb_brute_topk']}),
      en AS (SELECT query_id, count(*)::BIGINT AS n_exact
             FROM exact GROUP BY 1),
      hn AS (SELECT e.query_id, count(*)::BIGINT AS n_hits
             FROM exact e JOIN ann a
               ON a.query_id = e.query_id
              AND a.neighbor_id = e.neighbor_id
             GROUP BY 1)
      SELECT en.query_id, en.n_exact,
             coalesce(hn.n_hits, 0)::BIGINT AS n_hits,
             {fr('coalesce(hn.n_hits, 0)::DOUBLE / en.n_exact::DOUBLE', 6)}
               AS recall
      FROM en LEFT JOIN hn ON hn.query_id = en.query_id"""
    # kNN graph: the IVF replay with queries = the whole corpus. Probe
    # lists (r <= nprobe) and home buckets (r = 1) come from the same
    # (sim DESC, centroid_id ASC) ranking the Spark side's in-row
    # comparator sort applies; candidates = probe ⋈ home on the bucket.
    o["emb_knn_graph"] = f"""
      WITH e AS ({emb_cast}),
      cent AS (SELECT vec_id AS centroid_id, v FROM e
               WHERE vec_id % 64 = 0),
      pr AS (
        SELECT q.vec_id, c.centroid_id,
               row_number() OVER (PARTITION BY q.vec_id
                 ORDER BY {_cos("q.v", "c.v")} DESC, c.centroid_id ASC) AS r
        FROM e q CROSS JOIN cent c),
      home AS (SELECT vec_id AS neighbor_id, centroid_id FROM pr WHERE r = 1),
      probes AS (SELECT vec_id, centroid_id FROM pr WHERE r <= 2),
      cand AS (
        SELECT DISTINCT p.vec_id, h.neighbor_id
        FROM probes p JOIN home h USING (centroid_id)
        WHERE h.neighbor_id != p.vec_id),
      scored AS (
        SELECT cand.vec_id, cand.neighbor_id,
               round({_cos("ae.v", "ne.v")}, 6) AS cosine
        FROM cand
        JOIN e ae ON ae.vec_id = cand.vec_id
        JOIN e ne ON ne.vec_id = cand.neighbor_id),
      r AS (SELECT *, row_number() OVER (PARTITION BY vec_id
              ORDER BY cosine DESC, neighbor_id ASC) AS rank FROM scored)
      SELECT vec_id, neighbor_id, cosine, rank FROM r WHERE rank <= 5"""
    # MMR greedy selection unrolled as k SQL stages (the greedy argmax is
    # sequential by definition; k=5 is fixed in the contract query, so
    # the loop unrolls exactly): stage t anti-joins the pool against
    # picks 1..t-1, computes each survivor's redundancy = max pairwise
    # cosine to the chosen set, and picks argmax(0.5*simq - 0.5*red)
    # with the lowest-id tie-break — the same float expression and tie
    # order as the applyInPandas loop (similarity.py mmr_rerank)
    _mmr_steps = []
    for _t_ in range(2, 6):
        _mmr_steps.append(f"""
      a{_t_} AS (SELECT p.* FROM pool p LEFT JOIN ch{_t_ - 1} x
                   ON x.query_id = p.query_id
                  AND x.neighbor_id = p.neighbor_id
                 WHERE x.neighbor_id IS NULL),
      r{_t_} AS (SELECT a.query_id, a.neighbor_id, a.simq,
                        max(pw.sim) AS red
                 FROM a{_t_} a
                 JOIN pw ON pw.query_id = a.query_id
                        AND pw.a_id = a.neighbor_id
                 JOIN ch{_t_ - 1} c ON c.query_id = pw.query_id
                                   AND c.neighbor_id = pw.b_id
                 GROUP BY a.query_id, a.neighbor_id, a.simq),
      p{_t_} AS (SELECT query_id, neighbor_id, {_t_} AS rank,
                        {fr('0.5 * simq - 0.5 * red', 6)} AS mmr_score
                 FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                         ORDER BY (0.5 * simq - 0.5 * red) DESC,
                                  neighbor_id ASC) AS rn
                       FROM r{_t_}) WHERE rn = 1),
      ch{_t_} AS (SELECT query_id, neighbor_id FROM ch{_t_ - 1}
                  UNION ALL
                  SELECT query_id, neighbor_id FROM p{_t_})""")
    o["emb_mmr_topk"] = f"""
      WITH e AS ({emb_cast}),
      q AS (SELECT * FROM e WHERE vec_id < 10),
      scored AS (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               round({cos_qc}, 6) AS simq
        FROM e c CROSS JOIN q WHERE c.vec_id != q.vec_id),
      pool AS (SELECT query_id, neighbor_id, simq
               FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                       ORDER BY simq DESC, neighbor_id ASC) AS rk
                     FROM scored) WHERE rk <= 20),
      pv AS (SELECT p.query_id, p.neighbor_id, p.simq, e.v
             FROM pool p JOIN e ON e.vec_id = p.neighbor_id),
      pw AS MATERIALIZED (
        SELECT a.query_id, a.neighbor_id AS a_id,
               b.neighbor_id AS b_id, {_cos("a.v", "b.v")} AS sim
        FROM pv a JOIN pv b ON a.query_id = b.query_id),
      p1 AS (SELECT query_id, neighbor_id, 1 AS rank,
                    {fr('0.5 * simq - 0.5 * 0.0', 6)} AS mmr_score
             FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                     ORDER BY (0.5 * simq - 0.5 * 0.0) DESC,
                              neighbor_id ASC) AS rn
                   FROM pool) WHERE rn = 1),
      ch1 AS (SELECT query_id, neighbor_id FROM p1),{','.join(_mmr_steps)}
      SELECT * FROM p1 UNION ALL SELECT * FROM p2
      UNION ALL SELECT * FROM p3 UNION ALL SELECT * FROM p4
      UNION ALL SELECT * FROM p5"""
    # mirrors synthesize_image_payload's generating arithmetic — the Spark
    # side PARSES these dims back out of real PNG/JPEG/GIF headers
    o["mm_resize"] = """
      WITH d AS (
        SELECT doc_id, doc_id % 4096 + 1 AS width,
               octet_length(encode(text)) % 4096 + 1 AS height
        FROM documents WHERE text IS NOT NULL)
      SELECT doc_id, width, height, 256 AS out_w, 256 AS out_h,
             round(256.0 / width, 6) AS scale_x,
             round(256.0 / height, 6) AS scale_y
      FROM d"""
    # closed-form mirror of synthesize_bmp_payload + resize_image: NN
    # resample of pixel(x,y) = (x*7 + y*13 + id) % 256 from (id%16+4 ×
    # id%12+3) down to 8×8 with src = (dst*src_dim)//dst_dim
    o["mm_resize_px"] = """
      WITH d AS (SELECT doc_id, doc_id % 16 + 4 AS w, doc_id % 12 + 3 AS h
                 FROM documents WHERE text IS NOT NULL),
           g AS (SELECT sx.g AS x, sy.g AS y
                 FROM generate_series(0, 7) sx(g), generate_series(0, 7) sy(g)),
           px AS (SELECT d.doc_id, d.w, d.h,
                         (((g.x * d.w) // 8) * 7 + ((g.y * d.h) // 8) * 13
                          + d.doc_id) % 256 AS v,
                         g.x, g.y
                  FROM d, g)
      SELECT doc_id, w::BIGINT AS width, h::BIGINT AS height,
             8::BIGINT AS out_w, 8::BIGINT AS out_h,
             round(avg(v), 6) AS mean_px,
             max(CASE WHEN x = 7 AND y = 7 THEN v END)::BIGINT AS corner_px
      FROM px GROUP BY doc_id, w, h"""
    # same closed-form resample as mm_resize_px, over the PNG dims formula
    # (w = id%14+5, h = id%10+4) — the Spark side really inflates and
    # un-filters the raster it aggregates
    o["mm_png_px"] = """
      WITH d AS (SELECT doc_id, doc_id % 14 + 5 AS w, doc_id % 10 + 4 AS h
                 FROM documents WHERE text IS NOT NULL),
           g AS (SELECT sx.g AS x, sy.g AS y
                 FROM generate_series(0, 7) sx(g), generate_series(0, 7) sy(g)),
           px AS (SELECT d.doc_id, d.w, d.h,
                         (((g.x * d.w) // 8) * 7 + ((g.y * d.h) // 8) * 13
                          + d.doc_id) % 256 AS v,
                         g.x, g.y
                  FROM d, g)
      SELECT doc_id, w::BIGINT AS width, h::BIGINT AS height,
             8::BIGINT AS out_w, 8::BIGINT AS out_h,
             round(avg(v), 6) AS mean_px,
             max(CASE WHEN x = 7 AND y = 7 THEN v END)::BIGINT AS corner_px
      FROM px GROUP BY doc_id, w, h"""
    # JPEG dims are 8-aligned (w = (id%4+2)*8, h = (id%3+2)*8) and every
    # 8x8 block is constant with value (bx*17 + by*29 + id) % 256; with
    # DC quantizer step 8 the lossy codec round-trips those blocks
    # bit-exactly, so the full decode has a closed-form mirror: the
    # resampled pixel at (x, y) reads block (sx//8, sy//8) with
    # sx = x*w//8
    o["mm_jpeg_px"] = """
      WITH d AS (SELECT doc_id, (doc_id % 4 + 2) * 8 AS w,
                        (doc_id % 3 + 2) * 8 AS h
                 FROM documents WHERE text IS NOT NULL),
           g AS (SELECT sx.g AS x, sy.g AS y
                 FROM generate_series(0, 7) sx(g), generate_series(0, 7) sy(g)),
           px AS (SELECT d.doc_id, d.w, d.h,
                         ((((g.x * d.w) // 8) // 8) * 17
                          + (((g.y * d.h) // 8) // 8) * 29
                          + d.doc_id) % 256 AS v,
                         g.x, g.y
                  FROM d, g)
      SELECT doc_id, w::BIGINT AS width, h::BIGINT AS height,
             8::BIGINT AS out_w, 8::BIGINT AS out_h,
             round(avg(v), 6) AS mean_px,
             max(CASE WHEN x = 7 AND y = 7 THEN v END)::BIGINT AS corner_px
      FROM px GROUP BY doc_id, w, h"""
    # 4:2:0 twin: dims are 16-aligned (w = (id%3+2)*16, h = (id%2+2)*16)
    # and every 16x16 MACROBLOCK is a constant gray (mx*23 + my*31 + id)
    # % 256 with r=g=b (chroma exactly 128 -> sub/upsample exact, DC-only
    # luma with quantizer step 8 -> bit-exact round trip); the resampled
    # pixel at (x, y) reads macroblock (sx//16, sy//16), sx = x*w//8
    o["mm_jpeg_px_420"] = """
      WITH d AS (SELECT doc_id, (doc_id % 3 + 2) * 16 AS w,
                        (doc_id % 2 + 2) * 16 AS h
                 FROM documents WHERE text IS NOT NULL),
           g AS (SELECT sx.g AS x, sy.g AS y
                 FROM generate_series(0, 7) sx(g), generate_series(0, 7) sy(g)),
           px AS (SELECT d.doc_id, d.w, d.h,
                         ((((g.x * d.w) // 8) // 16) * 23
                          + (((g.y * d.h) // 8) // 16) * 31
                          + d.doc_id) % 256 AS v,
                         g.x, g.y
                  FROM d, g)
      SELECT doc_id, w::BIGINT AS width, h::BIGINT AS height,
             8::BIGINT AS out_w, 8::BIGINT AS out_h,
             round(avg(v), 6) AS mean_px,
             max(CASE WHEN x = 7 AND y = 7 THEN v END)::BIGINT AS corner_px
      FROM px GROUP BY doc_id, w, h"""
    o["mm_audio"] = """
      WITH p AS (SELECT doc_id, (doc_id * 97) % 30000 + 1000 AS amp,
                        (doc_id % 50 + 20) * 2 AS n_samples
                 FROM documents),
           w AS (SELECT doc_id, amp,
                        ceil(n_samples / 16.0)::INT AS n_win FROM p)
      SELECT doc_id, t.wdx::INT AS window, 8000 AS sample_rate,
             floor(amp / 32768.0 * 1000000 + 0.5) / 1000000 AS energy
      FROM w, unnest(generate_series(0, n_win - 1)) AS t(wdx)"""
    o["text_lm_score"] = f"""
      WITH tok AS (SELECT doc_id, unnest({TOKS}) AS t FROM documents),
           cnt AS (SELECT t, count(*) AS c FROM tok GROUP BY 1),
           tot AS (SELECT sum(c) AS n FROM cnt),
           voc AS (SELECT t, c FROM cnt ORDER BY c DESC, t ASC LIMIT 16)
      SELECT tok.doc_id, count(*)::BIGINT AS n_tokens,
             {fr('avg(CASE WHEN voc.c IS NOT NULL '
                 'THEN ln(voc.c / tot.n) ELSE ln(0.5 / tot.n) END)', 6)}
               AS lm_score,
             {fr('(count(*) - count(voc.c)) / count(*)::DOUBLE', 6)}
               AS oov_frac
      FROM tok LEFT JOIN voc ON tok.t = voc.t CROSS JOIN tot
      GROUP BY 1"""
    # BM25 replay: same Lucene idf, same left-assoc per-term sum in
    # sorted-term order, tf/dl from the shared tokenizer; avgdl is the
    # identical IEEE division of the two exact integers
    _bm_terms = ["hash", "join", "merge", "spark"]
    _bm_stats = ", ".join(
        f"sum(list_contains(toks, '{t}')::BIGINT) AS df{i}"
        for i, t in enumerate(_bm_terms))
    _bm_sum = " + ".join(
        f"(ln((s.n - s.df{i} + 0.5) / (s.df{i} + 0.5) + 1.0) * "
        f"(len(list_filter(d.toks, x -> x = '{t}'))::DOUBLE * 2.2) / "
        f"(len(list_filter(d.toks, x -> x = '{t}'))::DOUBLE + "
        f"1.2 * (0.25 + 0.75 * d.dl / (s.sdl / s.n))))"
        for i, t in enumerate(_bm_terms))
    # token Shannon entropy: H = ln(n) - (1/n)*sum c*ln(c). DuckDB's ln
    # and the Spark side's driver-computed math.log literals share libm,
    # and both engines fold the per-token terms in lexicographically
    # sorted distinct-token order, so the chained doubles are identical
    o["text_entropy"] = f"""
      WITH d AS (SELECT doc_id, {TOKS} AS tk
                 FROM documents WHERE text IS NOT NULL),
      c AS (SELECT doc_id, tk,
                   list_transform(list_sort(list_distinct(tk)),
                     x -> len(list_filter(tk, y -> y = x))) AS cs
            FROM d),
      h AS (SELECT doc_id, len(tk)::BIGINT AS n_tokens,
                   len(cs)::BIGINT AS n_distinct,
                   CASE WHEN len(tk) = 0 THEN 0.0 ELSE
                     ln(len(tk)::DOUBLE)
                     - list_reduce(list_prepend(0.0,
                         list_transform(cs, c ->
                           c::DOUBLE * ln(c::DOUBLE))),
                         (a, y) -> a + y) / len(tk)::DOUBLE END AS h
            FROM c)
      SELECT doc_id, n_tokens, n_distinct,
             floor(h * 1e6 + 0.5) / 1e6 AS entropy,
             CASE WHEN n_distinct <= 1 THEN 0.0 ELSE
               floor(h / ln(n_distinct::DOUBLE) * 1e6 + 0.5) / 1e6
             END AS entropy_norm
      FROM h"""
    # hashed-TF clustering: exact integer bucket counts -> cosine argmax
    # over the 8 seed-doc centroids; _cos's left list_reduce fold mirrors
    # assign_centroids' aggregate(zip_with(...)) bit-for-bit (dim = 64 =
    # n_buckets)
    o["text_cluster"] = f"""
      WITH d AS (SELECT doc_id, {TOKS} AS tk
                 FROM documents WHERE text IS NOT NULL),
      h AS (SELECT doc_id,
                   list_transform(tk, t -> {duck_hash64('t')} % 64) AS hs
            FROM d),
      v AS (SELECT doc_id,
                   list_transform(range(0, 64), i ->
                     CAST(len(list_filter(hs, x -> x = i)) AS DOUBLE)) AS tf,
                   len(hs)::BIGINT AS n_tokens
            FROM h),
      cent AS (SELECT doc_id AS centroid_id, tf FROM v
               ORDER BY doc_id LIMIT 8),
      a AS (SELECT v.doc_id, v.n_tokens, c.centroid_id,
                   row_number() OVER (PARTITION BY v.doc_id
                     ORDER BY {_cos("v.tf", "c.tf")} DESC,
                              c.centroid_id ASC) AS r
            FROM v CROSS JOIN cent c)
      SELECT doc_id, n_tokens, centroid_id FROM a WHERE r = 1"""
    o["text_bm25"] = f"""
      WITH d AS (SELECT doc_id, {TOKS} AS toks, len({TOKS}) AS dl
                 FROM documents),
      s AS (SELECT count(*) AS n, sum(dl) AS sdl, {_bm_stats} FROM d)
      SELECT doc_id, round(0.0 + {_bm_sum}, 6) AS score
      FROM d CROSS JOIN s
      WHERE round(0.0 + {_bm_sum}, 6) > 0
      ORDER BY score DESC, doc_id ASC LIMIT 10"""
    # Hybrid retrieval RRF: the bm25 top-20 and the cosine top-20 around
    # vector 0, ranks from (score desc, id asc), fused left-assoc
    # lex-then-sem as 1/(60+rank) with absent lists contributing 0
    o["emb_hybrid_rrf"] = f"""
      WITH d AS (SELECT doc_id, {TOKS} AS toks, len({TOKS}) AS dl
                 FROM documents),
      s AS (SELECT count(*) AS n, sum(dl) AS sdl, {_bm_stats} FROM d),
      bm AS (SELECT doc_id AS id, round(0.0 + {_bm_sum}, 6) AS score
             FROM d CROSS JOIN s
             WHERE round(0.0 + {_bm_sum}, 6) > 0
             ORDER BY score DESC, doc_id ASC LIMIT 20),
      lexr AS (SELECT id, row_number() OVER (
                 ORDER BY score DESC, id ASC) AS rank_lex FROM bm),
      e AS ({emb_cast}),
      q AS (SELECT * FROM e WHERE vec_id = 0),
      sc AS (SELECT c.vec_id AS id, round({cos_qc}, 6) AS score
             FROM e c CROSS JOIN q WHERE c.vec_id != q.vec_id
             ORDER BY score DESC, id ASC LIMIT 20),
      semr AS (SELECT id, row_number() OVER (
                 ORDER BY score DESC, id ASC) AS rank_sem FROM sc),
      f AS (SELECT COALESCE(l.id, r.id) AS id, l.rank_lex, r.rank_sem,
                   round(COALESCE(1.0 / (60 + l.rank_lex), 0.0)
                         + COALESCE(1.0 / (60 + r.rank_sem), 0.0), 6)
                   AS rrf_score
            FROM lexr l FULL OUTER JOIN semr r ON l.id = r.id)
      SELECT id, rank_lex, rank_sem, rrf_score FROM f
      ORDER BY rrf_score DESC, id ASC LIMIT 10"""

    # k-anonymity report: one GROUPING SETS pass over the QI cells
    # (full set + every leave-one-out), per-set violation fold at k=5
    # t-closeness: ordered-EMD in cross-multiplied integers over the
    # group x bucket spine; single reported floor division to ppm
    o["priv_t_closeness"] = """
      WITH b AS (SELECT c_nationkey AS q0, c_mktsegment AS q1,
                        floor(c_acctbal / 1000.0)::BIGINT AS s
                 FROM customer WHERE c_acctbal IS NOT NULL),
      cells AS (SELECT q0, q1, s, count(*)::BIGINT AS c FROM b
                GROUP BY 1, 2, 3),
      gl AS (SELECT s, count(*)::BIGINT AS gc FROM b GROUP BY 1),
      gstats AS (SELECT sum(gc)::BIGINT AS n, count(*)::BIGINT AS nb
                 FROM gl),
      gcum AS (SELECT s, sum(gc) OVER (ORDER BY s)::BIGINT AS cumg
               FROM gl),
      grp AS (SELECT q0, q1, sum(c)::BIGINT AS ng FROM cells
              GROUP BY 1, 2),
      spine AS (SELECT grp.q0, grp.q1, grp.ng, gl.s FROM grp, gl),
      fl AS (SELECT sp.q0, sp.q1, sp.ng, sp.s,
                      COALESCE(cells.c, 0)::BIGINT AS c
               FROM spine sp LEFT JOIN cells
                 ON cells.q0 = sp.q0 AND cells.q1 = sp.q1
                AND cells.s = sp.s),
      terms AS (SELECT f.q0, f.q1, f.ng,
                       abs(sum(f.c) OVER (PARTITION BY f.q0, f.q1
                                          ORDER BY f.s)::BIGINT
                           * gstats.n
                           - gcum.cumg * f.ng)::BIGINT AS term,
                       gstats.n AS n, gstats.nb AS nb
                FROM fl f
                JOIN gcum ON gcum.s = f.s, gstats)
      SELECT q0 AS c_nationkey, q1 AS c_mktsegment,
             min(ng)::BIGINT AS n_rows,
             (CASE WHEN min(nb) <= 1 THEN 0
                   ELSE (sum(term) * 1000000)
                        // (min(ng) * min(n) * (min(nb) - 1))
              END)::BIGINT AS t_ppm,
             (CASE WHEN min(nb) <= 1 THEN 0
                   ELSE (sum(term) * 1000000)
                        // (min(ng) * min(n) * (min(nb) - 1))
              END) > 200000 AS at_risk
      FROM terms GROUP BY 1, 2"""

    # l-diversity histogram: (QI, sensitive) cells -> per-group
    # distinct counts -> per-l histogram with the at-risk flag
    o["priv_l_diversity"] = """
      WITH c AS (SELECT c_nationkey AS q0, c_mktsegment AS q1,
                        floor(c_acctbal / 1000.0)::BIGINT AS s,
                        count(*)::BIGINT AS n
                 FROM customer GROUP BY 1, 2, 3),
      g AS (SELECT q0, q1, count(*)::BIGINT AS l_distinct,
                   sum(n)::BIGINT AS rws
            FROM c GROUP BY 1, 2)
      SELECT l_distinct, count(*)::BIGINT AS n_groups,
             sum(rws)::BIGINT AS n_rows,
             (l_distinct < 3) AS at_risk
      FROM g GROUP BY 1"""

    o["priv_k_anonymity"] = """
      WITH b AS (SELECT c_nationkey AS q0, c_mktsegment AS q1,
                        floor(c_acctbal / 1000.0)::BIGINT AS q2
                 FROM customer),
      g AS (SELECT q0, q1, q2, count(*)::BIGINT AS n,
                   (GROUPING(q0) + 2 * GROUPING(q1)
                    + 4 * GROUPING(q2))::BIGINT AS lvl
            FROM b GROUP BY GROUPING SETS
              ((q0, q1, q2), (q1, q2), (q0, q2), (q0, q1)))
      SELECT lvl AS level,
             CASE lvl WHEN 1 THEN 'c_nationkey'
                      WHEN 2 THEN 'c_mktsegment'
                      WHEN 4 THEN 'bal_kbucket'
                      ELSE '(none)' END AS dropped,
             count(*)::BIGINT AS n_groups,
             sum((n < 5)::INT)::BIGINT AS n_violating,
             sum(CASE WHEN n < 5 THEN n ELSE 0 END)::BIGINT
               AS rows_at_risk,
             sum(n)::BIGINT AS total_rows,
             ((sum(CASE WHEN n < 5 THEN n ELSE 0 END) * 1000000)
              // sum(n))::BIGINT AS risk_ppm
      FROM g GROUP BY 1, 2"""

    # Blocked fuzzy matching: distinct names, last-token block, size
    # cap mirrored, within-block pairs at integer Levenshtein <= 3;
    # every row carries the 1-row dropped-block counters (loud cap)
    o["text_fuzzy_pairs"] = """
      WITH s AS (SELECT DISTINCT p_name AS nm FROM part
                 WHERE p_name IS NOT NULL),
      bk AS (SELECT regexp_extract(nm, '[a-z0-9]+$', 0) AS block, nm
             FROM s),
      ok AS (SELECT block FROM bk GROUP BY 1
             HAVING count(*) BETWEEN 2 AND 256),
      dr AS (SELECT count(*)::BIGINT AS n_blocks_dropped,
                    coalesce(sum(n), 0)::BIGINT AS n_strings_dropped
             FROM (SELECT block, count(*) AS n FROM bk
                   GROUP BY 1 HAVING count(*) > 256))
      SELECT a.block, a.nm AS a, b.nm AS b,
             levenshtein(a.nm, b.nm)::BIGINT AS dist,
             dr.n_blocks_dropped, dr.n_strings_dropped
      FROM bk a JOIN ok ON a.block = ok.block
                JOIN bk b ON b.block = a.block, dr
      WHERE a.nm < b.nm AND levenshtein(a.nm, b.nm) <= 3"""

    # Entity resolution: the fuzzy pair edges transitively closed into
    # components (min-string canonical), singletons completing the
    # distinct vocabulary; sizes over the canonical label
    o["text_entities"] = """
      WITH RECURSIVE s AS (SELECT DISTINCT p_name AS nm FROM part
                           WHERE p_name IS NOT NULL),
      bk AS (SELECT regexp_extract(nm, '[a-z0-9]+$', 0) AS block, nm
             FROM s),
      ok AS (SELECT block FROM bk GROUP BY 1
             HAVING count(*) BETWEEN 2 AND 256),
      pr AS (SELECT a.nm AS a, b.nm AS b
             FROM bk a JOIN ok ON a.block = ok.block
                       JOIN bk b ON b.block = a.block
             WHERE a.nm < b.nm AND levenshtein(a.nm, b.nm) <= 3),
      e AS (SELECT a, b FROM pr UNION SELECT b, a FROM pr),
      reach(a, b) AS (
        SELECT a, b FROM e
        UNION
        SELECT r.a, e.b FROM reach r JOIN e ON r.b = e.a
        WHERE e.b != r.a),
      m AS (SELECT a AS entity, least(a, min(b)) AS canonical
            FROM reach GROUP BY a),
      lab AS (SELECT entity, canonical FROM m
              UNION ALL
              SELECT nm, nm FROM s
              WHERE nm NOT IN (SELECT entity FROM m)),
      sz AS (SELECT canonical, count(*)::BIGINT AS cluster_size
             FROM lab GROUP BY 1),
      dr AS (SELECT count(*)::BIGINT AS n_blocks_dropped,
                    coalesce(sum(n), 0)::BIGINT AS n_strings_dropped
             FROM (SELECT block, count(*) AS n FROM bk
                   GROUP BY 1 HAVING count(*) > 256))
      SELECT lab.entity, lab.canonical, sz.cluster_size,
             dr.n_blocks_dropped, dr.n_strings_dropped
      FROM lab JOIN sz USING (canonical), dr"""

    o["text_top_tokens"] = f"""
      WITH t AS (SELECT unnest({TOKS}) AS token FROM documents)
      SELECT token, count(*) AS n FROM t GROUP BY 1
      ORDER BY n DESC, token ASC LIMIT 50"""
    o["text_rolling"] = f"""
      WITH h AS (
        SELECT doc_id, list_transform({TOKS},
                 t -> {duck_hash64('t')} % {MERSENNE_P}) AS hs
        FROM documents),
      g AS (SELECT doc_id, hs FROM h WHERE len(hs) >= 8)
      SELECT doc_id, i AS pos,
             list_reduce(hs[i:i+7],
               (a, b) -> (a * 1000003 + b) % {MERSENNE_P}) AS whash
      FROM g, unnest(generate_series(1, len(hs) - 7)) AS t(i)"""
    # Winnowing selection (Schleimer et al. 2003) over the same window-
    # hash pipeline: rightmost minimal hash per 4-hash selection window
    # via min over the struct {{h, -pos}} — field-by-field struct
    # comparison pins the tie-break identically to Spark's
    # min(struct(whash, -pos)) window
    o["text_winnowing"] = f"""
      WITH h AS (
        SELECT doc_id, list_transform({TOKS},
                 t -> {duck_hash64('t')} % {MERSENNE_P}) AS hs
        FROM documents),
      g AS (SELECT doc_id, hs FROM h WHERE len(hs) >= 8),
      wh AS (SELECT doc_id, i AS pos,
                    list_reduce(hs[i:i+7],
                      (a, b) -> (a * 1000003 + b) % {MERSENNE_P}) AS whash
             FROM g, unnest(generate_series(1, len(hs) - 7)) AS t(i)),
      sel AS (SELECT doc_id,
                     min({{'h': whash, 'np': -pos}}) OVER (
                       PARTITION BY doc_id ORDER BY pos
                       ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS m,
                     count(*) OVER (
                       PARTITION BY doc_id ORDER BY pos
                       ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS c
              FROM wh)
      SELECT DISTINCT doc_id, -(m['np']) AS pos, m['h'] AS fp
      FROM sel WHERE c = 4"""
    # LSH-verified pairs ⊆ exact pairs; exact-precision verification means
    # the exact SQL is the right oracle (recall caveat in the operator doc).
    # The r12 bits ∝ log N derivation needs no mirroring: bits only moves
    # RECALL, and this corpus has no >= 0.9 pairs to miss (the planted
    # variant covers the non-empty side with recall 1 by construction).
    o["emb_near_dup_lsh"] = f"""
      WITH e AS ({emb_cast})
      SELECT a.vec_id AS id_a, b.vec_id AS id_b,
             round({_cos("a.v", "b.v")}, 6) AS cosine
      FROM e a JOIN e b ON a.vec_id < b.vec_id
      WHERE round({_cos("a.v", "b.v")}, 6) >= 0.9"""
    # planted exact duplicates: the only pairs ≥0.9 are (v, copy-of-v),
    # cosine exactly 1.0 — non-empty equality gate for the LSH path
    o["emb_near_dup_planted"] = f"""
      WITH e AS ({emb_cast}),
      aug AS (SELECT vec_id, v FROM e
              UNION ALL
              SELECT vec_id + 1000000, v FROM e WHERE vec_id % 25 = 0)
      SELECT a.vec_id AS id_a, b.vec_id AS id_b,
             round({_cos("a.v", "b.v")}, 6) AS cosine
      FROM aug a JOIN aug b ON a.vec_id < b.vec_id
      WHERE round({_cos("a.v", "b.v")}, 6) >= 0.9"""
    o["emb_near_dup_pairs"] = f"""
      WITH e AS ({emb_cast})
      SELECT a.vec_id AS id_a, b.vec_id AS id_b,
             round({_cos("a.v", "b.v")}, 6) AS cosine
      FROM e a JOIN e b ON a.vec_id < b.vec_id
      WHERE round({_cos("a.v", "b.v")}, 6) >= 0.9"""
    # SemDeDup greedy rule replayed end-to-end: nearest-centroid
    # assignment (same sim DESC, cid ASC tie-break as emb_ivf_topk, same
    # sequential-fold cosine), then a row is a duplicate iff some
    # same-cluster row with a smaller id scores >= eps against it
    o["emb_semantic_dedup"] = f"""
      WITH e AS ({emb_cast}),
      corpus AS (SELECT vec_id, v FROM e
                 UNION ALL
                 SELECT vec_id + 1000000, v FROM e WHERE vec_id % 25 = 0),
      cent AS (SELECT vec_id AS cid, v AS cv FROM e
               WHERE vec_id % 64 = 0),
      a0 AS (SELECT c.vec_id, ct.cid,
                    row_number() OVER (PARTITION BY c.vec_id
                      ORDER BY {_cos("c.v", "ct.cv")} DESC, ct.cid ASC) AS r
             FROM corpus c CROSS JOIN cent ct),
      asg AS (SELECT vec_id, cid FROM a0 WHERE r = 1),
      dup AS (SELECT DISTINCT b.vec_id
              FROM asg a JOIN asg b ON a.cid = b.cid AND a.vec_id < b.vec_id
              JOIN corpus ca ON ca.vec_id = a.vec_id
              JOIN corpus cb ON cb.vec_id = b.vec_id
              WHERE round({_cos("ca.v", "cb.v")}, 6) >= 0.45)
      SELECT vec_id FROM corpus
      WHERE vec_id NOT IN (SELECT vec_id FROM dup)"""
    # prototypicality pruning: cosine to assigned centroid, then a
    # within-cluster cume_dist (ties broken on id — deterministic); keep
    # compares the UNROUNDED percentile to 0.8, identical IEEE division
    # rank/count in both engines
    o["emb_prototypicality"] = f"""
      WITH e AS ({emb_cast}),
      cent AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id < 8),
      a0 AS (SELECT e.vec_id, c.cid, c.cv,
                    row_number() OVER (PARTITION BY e.vec_id
                      ORDER BY {_cos("e.v", "c.cv")} DESC, c.cid ASC) AS r
             FROM e CROSS JOIN cent c),
      scored AS (SELECT a0.vec_id, a0.cid AS centroid_id,
                        round({_cos("e.v", "a0.cv")}, 6) AS proto
                 FROM a0 JOIN e ON e.vec_id = a0.vec_id WHERE a0.r = 1),
      p AS (SELECT vec_id, centroid_id, proto,
                   cume_dist() OVER (PARTITION BY centroid_id
                     ORDER BY proto ASC, vec_id ASC) AS cd
            FROM scored)
      SELECT vec_id, centroid_id, proto, round(cd, 6) AS pctl,
             cd <= 0.8 AS keep
      FROM p"""

    # C4 line-level rules: entirely in-list (no unnest needed) — split,
    # per-element filter, ordered rejoin
    o["text_line_filter"] = rf"""
      WITH d0 AS (SELECT doc_id, replace(text, ' the ', chr(10)) AS text
                  FROM documents WHERE text IS NOT NULL),
      b AS (SELECT doc_id,
                   list_filter(string_split(text, chr(10)),
                               x -> length(trim(x)) > 0) AS ne
            FROM d0),
      k AS (SELECT doc_id, ne,
                   list_filter(ne, x ->
                     len(string_split_regex(trim(x), '\s+')) >= 3
                     AND NOT contains(x, '{{')
                     AND NOT contains(x, '}}')
                     AND NOT contains(lower(x), 'lorem ipsum')) AS kept
            FROM b)
      SELECT doc_id, len(ne)::BIGINT AS n_lines,
             len(kept)::BIGINT AS n_kept,
             array_to_string(list_transform(kept, x -> trim(x)), ' ')
               AS clean_text
      FROM k"""
    # C4-style boilerplate removal: zipped unnest for positions,
    # DISTINCT-doc sentence df, flagged sliver NOT IN, ordered
    # string_agg reassembly; empty docs report 0/0/''
    o["text_boilerplate"] = rf"""
      WITH d0 AS (SELECT doc_id,
                         text || '. subscribe to our newsletter today'
                           AS text
                  FROM documents WHERE text IS NOT NULL),
      base AS (SELECT doc_id,
                      string_split_regex(text, '[.!?]+\s+') AS ss
               FROM d0),
      ex0 AS (SELECT doc_id, unnest(ss) AS s,
                     unnest(generate_series(1, len(ss))) AS idx
              FROM base),
      ex AS (SELECT doc_id, idx, s,
                    regexp_replace(lower(trim(s)), '\s+', ' ', 'g') AS k
             FROM ex0 WHERE length(trim(s)) > 0),
      flag AS (SELECT k FROM (SELECT k, count(DISTINCT doc_id) AS c
                              FROM ex GROUP BY 1) WHERE c > 2),
      kept AS (SELECT * FROM ex WHERE k NOT IN (SELECT k FROM flag)),
      stats AS (SELECT doc_id, count(*)::BIGINT AS n_sentences
                FROM ex GROUP BY 1),
      agg AS (SELECT doc_id, count(*)::BIGINT AS n_kept,
                     string_agg(trim(s), ' ' ORDER BY idx)
                       AS clean_text
              FROM kept GROUP BY 1)
      SELECT b.doc_id, coalesce(stats.n_sentences, 0) AS n_sentences,
             coalesce(agg.n_kept, 0) AS n_kept,
             coalesce(agg.clean_text, '') AS clean_text
      FROM base b LEFT JOIN stats ON stats.doc_id = b.doc_id
                  LEFT JOIN agg ON agg.doc_id = b.doc_id"""
    # Flesch / Flesch-Kincaid readability: exact integer counts
    # (sentence runs of [.!?] floored at 1; per-token syllables =
    # max(1, vowel groups)), then the fixed 3-term formulas
    o["text_readability"] = f"""
      SELECT doc_id,
             len({TOKS})::BIGINT AS n_words,
             greatest(1, len(regexp_extract_all(text, '[.!?]+')))::BIGINT
               AS n_sentences,
             coalesce(list_sum(list_transform({TOKS},
               x -> greatest(1, len(regexp_extract_all(x, '[aeiouy]+'))))),
               0)::BIGINT AS n_syllables,
             CASE WHEN len({TOKS}) > 0 THEN
               {fr("206.835 - 1.015 * (len(" + TOKS + ")::DOUBLE"
                   " / greatest(1, len(regexp_extract_all(text, '[.!?]+')))::DOUBLE)"
                   " - 84.6 * (coalesce(list_sum(list_transform(" + TOKS + ","
                   " x -> greatest(1, len(regexp_extract_all(x, '[aeiouy]+'))))), 0)::DOUBLE"
                   " / len(" + TOKS + ")::DOUBLE)", 6)}
             END AS flesch,
             CASE WHEN len({TOKS}) > 0 THEN
               {fr("0.39 * (len(" + TOKS + ")::DOUBLE"
                   " / greatest(1, len(regexp_extract_all(text, '[.!?]+')))::DOUBLE)"
                   " + 11.8 * (coalesce(list_sum(list_transform(" + TOKS + ","
                   " x -> greatest(1, len(regexp_extract_all(x, '[aeiouy]+'))))), 0)::DOUBLE"
                   " / len(" + TOKS + ")::DOUBLE)"
                   " - 15.59", 6)}
             END AS fk_grade
      FROM documents WHERE text IS NOT NULL"""
    o["text_stats"] = f"""
      SELECT doc_id,
             length(text)::BIGINT AS n_chars_c,
             len({TOKS})::BIGINT AS n_words,
             round(CASE WHEN length(text) > 0
                        THEN {punct} / length(text)::DOUBLE ELSE 0.0 END, 6)
               AS punct_ratio,
             round({mean_wl}, 6) AS mean_word_len
      FROM documents"""
    o["text_quality"] = f"""
      WITH b AS (
        SELECT doc_id, len({TOKS}) AS n_words, length(text) AS n_chars,
               len(list_filter({TOKS}, x -> list_contains([{_EN_WORDS}], x)))
                 AS sw,
               {punct} AS n_punct,
               {mean_wl} AS mean_wl
        FROM documents),
      c AS (
        SELECT doc_id,
               least(n_words::DOUBLE / 20.0, 1.0) AS len_term,
               least(CASE WHEN n_words > 0
                          THEN sw / n_words::DOUBLE ELSE 0.0 END * 3.0, 1.0)
                 AS sw_term,
               CASE WHEN mean_wl >= 3 AND mean_wl <= 10 THEN 1.0 ELSE 0.5 END
                 AS wl_term,
               greatest(0.0, 1.0 - CASE WHEN n_chars > 0
                 THEN n_punct / n_chars::DOUBLE ELSE 0.0 END * 4.0) AS punct_term
        FROM b)
      SELECT doc_id,
             round((len_term + sw_term + wl_term + punct_term) / 4.0, 6) AS quality
      FROM c"""
    lang_case = "CASE WHEN " + " + ".join(
        f"h_{lang}" for lang in LANGS) + " IS NULL THEN 'und' " + \
        f"WHEN greatest({', '.join('h_' + lang for lang in LANGS)}) = 0 THEN 'und' "
    conds = []
    for i, lang in enumerate(LANGS):
        others = [x for x in LANGS[i + 1:]]
        if others:
            cond = " AND ".join(f"h_{lang} >= h_{x}" for x in others)
            conds.append(f"WHEN {cond} THEN '{lang}'")
        else:
            conds.append(f"ELSE '{lang}'")
    lang_case += " ".join(conds) + " END"
    hits_cols = ", ".join(f"{_lang_hits(lang)} AS h_{lang}" for lang in LANGS)
    o["text_langid"] = f"""
      WITH h AS (SELECT doc_id, lang, {hits_cols} FROM documents)
      SELECT doc_id, lang, {lang_case} AS lang_pred FROM h"""
    o["text_tokens"] = f"""
      SELECT doc_id, len({TOKS})::BIGINT AS n_tokens,
             greatest(len({TOKS}),
                      ceil(length(text) / 4.0)::BIGINT)::BIGINT
               AS n_tokens_bpe_est
      FROM documents"""
    o["text_fingerprint"] = f"""
      SELECT doc_id,
             md5(array_to_string(list_sort(list_distinct({TOKS})), ' '))
               AS fingerprint
      FROM documents"""

    o["mm_meta"] = """
      SELECT doc_id, octet_length(encode(text))::BIGINT AS payload_bytes,
             md5(text) AS payload_md5
      FROM documents"""
    # real header-parse round-trip: the oracle recomputes what the
    # synthesizer encoded; Spark must parse identical values back out of
    # the PNG IHDR / JPEG SOF0 / GIF descriptor bytes
    o["mm_decode"] = """
      SELECT doc_id,
             CASE WHEN text IS NULL THEN 0
                  ELSE doc_id % 4096 + 1 END AS width,
             CASE WHEN text IS NULL THEN 0
                  ELSE octet_length(encode(text)) % 4096 + 1 END AS height,
             CASE WHEN text IS NULL THEN 0
                  WHEN doc_id % 3 = 0 THEN 4 ELSE 3 END AS channels,
             CASE WHEN text IS NULL THEN NULL
                  WHEN doc_id % 3 = 0 THEN 'png'
                  WHEN doc_id % 3 = 1 THEN 'jpeg'
                  ELSE 'gif' END AS format,
             text IS NOT NULL AS decode_ok
      FROM documents"""
    o["mm_frames"] = """
      WITH p AS (SELECT doc_id, (doc_id % 10 + 1)::INT AS n_frames,
                        (doc_id % 256 + 1)::INT AS frame_w,
                        ((doc_id * 7) % 256 + 1)::INT AS frame_h
                 FROM documents)
      SELECT doc_id, t.fi::INT AS frame_index, frame_w, frame_h, n_frames
      FROM p, unnest(generate_series(0, n_frames - 1, 2)) AS t(fi)"""

    o["iq_first_last"] = f"""
      SELECT event_type,
             min_by(value, {EV_TIME}) AS first_value,
             max_by(value, {EV_TIME}) AS last_value
      FROM events GROUP BY 1"""
    o["iq_order_desc"] = f"""
      SELECT {EV_TIME} AS time, value, event_id
      FROM events
      WHERE event_type = 'click' AND {EV_TIME} >= {JAN1}
        AND {EV_TIME} < {JAN1 + 3 * DAY}
      ORDER BY time DESC LIMIT 50"""
    o["join_semi_urgent"] = """
      SELECT c_custkey, c_mktsegment FROM customer c
      WHERE EXISTS (SELECT 1 FROM orders o
                    WHERE o.o_custkey = c.c_custkey
                      AND o.o_orderpriority = '1-URGENT')"""
    o["window_rank"] = f"""
      WITH r AS (
        SELECT o_orderpriority, o_orderkey, o_totalprice,
               row_number() OVER (PARTITION BY o_orderpriority
                 ORDER BY o_totalprice DESC, o_orderkey ASC) AS rnk
        FROM orders)
      SELECT o_orderpriority, rnk, o_orderkey,
             {fr('o_totalprice', 2)} AS o_totalprice
      FROM r WHERE rnk <= 3"""
    o["ts_asof_join"] = f"""
      WITH l AS (SELECT event_id, user_id, {EV_TIME} AS time FROM events
                 WHERE event_type = 'click'),
           r AS (SELECT user_id, {EV_TIME} AS time, value FROM events
                 WHERE event_type = 'purchase')
      SELECT l.event_id, l.user_id, l.time,
             CASE WHEN r.time >= l.time - {DAY} THEN r.time END
               AS purchase_time,
             CASE WHEN r.time >= l.time - {DAY} THEN {fr('r.value', 6)} END
               AS purchase_value
      FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.time >= r.time"""
    o["ts_sessionize"] = f"""
      WITH e AS (SELECT user_id, {EV_TIME} AS time FROM events),
           m AS (SELECT user_id, time,
                        CASE WHEN lag(time) OVER w IS NULL
                                  OR time - lag(time) OVER w > {HOUR}
                             THEN 1 ELSE 0 END AS is_new
                 FROM e WINDOW w AS (PARTITION BY user_id ORDER BY time)),
           s AS (SELECT user_id, time,
                        (sum(is_new) OVER (PARTITION BY user_id ORDER BY time
                          ROWS UNBOUNDED PRECEDING))::BIGINT AS session_id
                 FROM m)
      SELECT user_id, session_id, count(*) AS n_events,
             min(time) AS t_start, max(time) AS t_end,
             max(time) - min(time) AS duration
      FROM s GROUP BY 1, 2"""
    o["ts_interval_join"] = f"""
      WITH iv AS (SELECT event_id AS error_id, user_id,
                         {EV_TIME} - {12 * HOUR} AS t_start,
                         {EV_TIME} + {12 * HOUR} AS t_end
                  FROM events WHERE event_type = 'error'),
           p AS (SELECT user_id, {EV_TIME} AS time, value FROM events
                 WHERE event_type = 'purchase')
      SELECT p.user_id, iv.error_id, p.time, {fr('p.value', 6)} AS value
      FROM p JOIN iv ON p.user_id = iv.user_id
                    AND p.time >= iv.t_start AND p.time <= iv.t_end"""
    # LTTB (largest-triangle-three-buckets) downsample, replayed exactly:
    # per-series recursion picks, per bucket, the max-triangle-area point
    # against the previous selection and the next bucket's average.
    # Determinism contract with the Spark side: bucket averages are
    # sequential folds over time-ordered lists (list_reduce), times fold
    # as DOUBLE (ns magnitudes overflow BIGINT sums), the (st - t) term
    # stays exact BIGINT before its cast, ties break on earliest time.
    _B = 62  # n_out 64 - endpoints
    o["ts_lttb"] = f"""
      WITH RECURSIVE
      pts AS (SELECT event_type AS s, {EV_TIME} AS t, value AS v FROM events),
      mid AS (
        SELECT s, t, v,
               row_number() OVER (PARTITION BY s ORDER BY t) AS r,
               count(*) OVER (PARTITION BY s) AS n_mid
        FROM pts p
        WHERE t > (SELECT min(t) FROM pts q WHERE q.s = p.s)
          AND t < (SELECT max(t) FROM pts q WHERE q.s = p.s)),
      bkt AS (
        SELECT s, t, v, least({_B}, 1 + ((r - 1) * {_B}) // n_mid)::INT AS b
        FROM mid),
      avgs AS (
        SELECT s, b,
               list_reduce(list(t::DOUBLE ORDER BY t), (x, y) -> x + y)
                 / count(*) AS ax,
               list_reduce(list(v ORDER BY t), (x, y) -> x + y)
                 / count(*) AS ay
        FROM bkt GROUP BY s, b),
      firsts AS (
        SELECT s, t, v FROM (
          SELECT s, t, v, row_number() OVER (PARTITION BY s ORDER BY t) rn
          FROM pts) WHERE rn = 1),
      lasts AS (
        SELECT s, t, v FROM (
          SELECT s, t, v, row_number() OVER (PARTITION BY s ORDER BY t DESC) rn
          FROM pts) WHERE rn = 1),
      bkt2 AS MATERIALIZED (
        SELECT p.s, p.t, p.v, p.b,
               coalesce(a.ax, lp.t::DOUBLE) AS ax,
               coalesce(a.ay, lp.v) AS ay
        FROM bkt p
        LEFT JOIN avgs a ON a.s = p.s AND a.b = p.b + 1
        JOIN lasts lp ON lp.s = p.s),
      sel(s, k, st, sv) AS (
        (SELECT s, 0, t, v FROM firsts)
        UNION ALL
        SELECT r.s, r.k + 1, c.t, c.v
        FROM sel r, LATERAL (
          SELECT p.t, p.v FROM bkt2 p
          WHERE p.s = r.s AND p.b = r.k + 1
          ORDER BY abs((r.st::DOUBLE - p.ax) * (p.v - r.sv)
                     - (r.st - p.t)::DOUBLE * (p.ay - r.sv)) DESC,
                   p.t ASC
          LIMIT 1) c
        WHERE r.k < {_B})
      SELECT s AS event_type, st AS time, sv AS value FROM sel
      UNION ALL
      SELECT s AS event_type, t AS time, v AS value FROM lasts"""
    # MinHash Jaccard estimate per LSH candidate pair: matching signature
    # slots / num_perm, over the same sig + banding CTEs the candidate
    # oracle uses
    o["doc_minhash_estimate"] = f"""
      WITH sh AS ({_shingles_cte(3)}),
      sig AS ({_minhash_sig_sql(16, 3)}),
      bands AS ({_bands_sql()}),
      cand AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b
        FROM bands a JOIN bands b USING (band_id, band_key)
        WHERE a.doc_id < b.doc_id GROUP BY 1, 2)
      SELECT id_a, id_b,
             round(len(list_filter(
                     [sa.s[i] = sb.s[i] FOR i IN generate_series(1, 16)],
                     x -> x)) / 16.0, 6) AS est_jaccard
      FROM cand JOIN sig sa ON sa.doc_id = id_a
                JOIN sig sb ON sb.doc_id = id_b"""
    # Dedup threshold sweep: the minhash-estimate pair table swept over
    # a literal threshold spine; zero-hit thresholds kept via LEFT JOIN
    o["doc_dedup_sweep"] = f"""
      WITH sh AS ({_shingles_cte(3)}),
      sig AS ({_minhash_sig_sql(16, 3)}),
      bands AS ({_bands_sql()}),
      cand AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b
        FROM bands a JOIN bands b USING (band_id, band_key)
        WHERE a.doc_id < b.doc_id GROUP BY 1, 2),
      est AS (
        SELECT id_a, id_b,
               round(len(list_filter(
                     [sa.s[i] = sb.s[i] FOR i IN generate_series(1, 16)],
                     x -> x)) / 16.0, 6) AS est_jaccard
        FROM cand JOIN sig sa ON sa.doc_id = id_a
                  JOIN sig sb ON sb.doc_id = id_b),
      spine AS (SELECT unnest([0.5, 0.6, 0.7, 0.8, 0.9, 1.0])::DOUBLE
                       AS threshold),
      hit AS (SELECT s.threshold, e.id_a, e.id_b FROM est e
              JOIN spine s ON e.est_jaccard >= s.threshold),
      p AS (SELECT threshold, count(*)::BIGINT AS n_pairs
            FROM hit GROUP BY 1),
      dd AS (SELECT threshold, count(*)::BIGINT AS n_docs FROM (
               SELECT DISTINCT threshold, d FROM (
                 SELECT threshold, id_a AS d FROM hit
                 UNION ALL SELECT threshold, id_b FROM hit))
             GROUP BY 1)
      SELECT s.threshold, coalesce(p.n_pairs, 0)::BIGINT AS n_pairs,
             coalesce(dd.n_docs, 0)::BIGINT AS n_docs
      FROM spine s LEFT JOIN p ON p.threshold = s.threshold
                   LEFT JOIN dd ON dd.threshold = s.threshold"""

    o["ts_m4_downsample"] = f"""
      WITH e AS (SELECT event_type, {EV_TIME} AS time, value FROM events)
      SELECT event_type, time - time % {HOUR} AS bucket,
             count(*)::BIGINT AS n,
             {fr('min(value)', 6)} AS v_min, {fr('max(value)', 6)} AS v_max,
             {fr('arg_min(value, time)', 6)} AS v_first,
             {fr('arg_max(value, time)', 6)} AS v_last
      FROM e GROUP BY 1, 2"""
    # Pettitt change-point: exact integer U_t via the telescoping
    # A_t - B_t endpoint sums + a window prefix sum; significance via
    # the exact integer comparison 6K^2*10^16 > floor(ln(40)*1e16)*
    # (B^3+B^2) in HUGEINT — the compared row is 100% float-free
    # (log_p_exponent is API-only on the Spark side, dropped from the
    # entry's output)
    # r8: integer-exact end to end — the bucket stage keeps scaled sums
    # si = Σv·10⁶ (per-row DECIMAL(22,6)·10⁶ → HUGEINT, then an exact
    # integer sum) and counts; each pairwise sign is the cross-multiplied
    # HUGEINT comparison sign(si_b·n_a − si_a·n_b) ≡ sign(mean_b − mean_a),
    # so no float and no rounding exists anywhere between the raw values
    # and the compared row (the r7 form still signed round-6 double means)
    _PETTITT_G = f"""
      e AS (SELECT event_type, {EV_TIME} AS time, value FROM events),
      g AS (SELECT event_type, time - time % {HOUR} AS bucket,
                   sum((CAST(value AS DECIMAL(22,6)) * 1000000)::HUGEINT)
                     AS si,
                   count(*) AS n
            FROM e GROUP BY 1, 2)"""
    # si/k/u_at_k MUST be cast ::BIGINT: DuckDB's sum(BIGINT) / HUGEINT
    # arithmetic yields HUGEINT output columns, which the driver's
    # DataFrame/Arrow fetch converts to float64/decimal128 (while the
    # local gate's fetchall() returns exact ints) — the r5-r8 driver
    # hash-reds on exactly these keys were this type artifact, not a
    # value divergence (VERDICT r8 What's-wrong #1).  The green
    # ts_pettitt_u key always carried u::BIGINT.
    o["ts_pettitt_means"] = f"""
      WITH {_PETTITT_G}
      SELECT event_type, bucket, si::BIGINT AS si, n::BIGINT AS n FROM g"""
    _PETTITT_U = f"""
      {_PETTITT_G},
      p AS (SELECT a.event_type, a.bucket AS ba, b.bucket AS bb,
                   sign(b.si * a.n - a.si * b.n)::BIGINT AS sg
            FROM g a JOIN g b ON b.event_type = a.event_type
                             AND b.bucket > a.bucket),
      at AS (SELECT event_type, ba AS bucket, sum(sg) AS a
             FROM p GROUP BY 1, 2),
      bt AS (SELECT event_type, bb AS bucket, sum(sg) AS b
             FROM p GROUP BY 1, 2),
      u AS (SELECT g.event_type, g.bucket,
                   sum(coalesce(at.a, 0) - coalesce(bt.b, 0)) OVER (
                     PARTITION BY g.event_type ORDER BY g.bucket
                     ROWS UNBOUNDED PRECEDING) AS u
            FROM g LEFT JOIN at ON at.event_type = g.event_type
                               AND at.bucket = g.bucket
                   LEFT JOIN bt ON bt.event_type = g.event_type
                               AND bt.bucket = g.bucket)"""
    o["ts_pettitt_u"] = f"""
      WITH {_PETTITT_U}
      SELECT event_type, bucket, u::BIGINT AS u FROM u"""
    o["ts_pettitt"] = f"""
      WITH {_PETTITT_G},
      n AS (SELECT event_type, count(*) AS n_buckets FROM g GROUP BY 1),
      p AS (SELECT a.event_type, a.bucket AS ba, b.bucket AS bb,
                   sign(b.si * a.n - a.si * b.n)::BIGINT AS sg
            FROM g a JOIN g b ON b.event_type = a.event_type
                             AND b.bucket > a.bucket),
      at AS (SELECT event_type, ba AS bucket, sum(sg) AS a
             FROM p GROUP BY 1, 2),
      bt AS (SELECT event_type, bb AS bucket, sum(sg) AS b
             FROM p GROUP BY 1, 2),
      u AS (SELECT g.event_type, g.bucket,
                   sum(coalesce(at.a, 0) - coalesce(bt.b, 0)) OVER (
                     PARTITION BY g.event_type ORDER BY g.bucket
                     ROWS UNBOUNDED PRECEDING) AS u
            FROM g LEFT JOIN at ON at.event_type = g.event_type
                               AND at.bucket = g.bucket
                   LEFT JOIN bt ON bt.event_type = g.event_type
                               AND bt.bucket = g.bucket),
      best AS (SELECT event_type, bucket AS change_bucket, u AS u_at_k,
                      abs(u) AS k,
                      row_number() OVER (PARTITION BY event_type
                        ORDER BY abs(u) DESC, bucket ASC) AS r
               FROM u),
      f AS (SELECT n.event_type, n.n_buckets, b.k, b.change_bucket,
                   b.u_at_k,
                   (6 * b.k * b.k)::BIGINT AS pexp_num,
                   (n.n_buckets * n.n_buckets * n.n_buckets
                    + n.n_buckets * n.n_buckets)::BIGINT AS pexp_den
            FROM n JOIN best b ON b.event_type = n.event_type AND b.r = 1)
      SELECT event_type, n_buckets::BIGINT AS n_buckets, k::BIGINT AS k,
             change_bucket, u_at_k::BIGINT AS u_at_k, pexp_num, pexp_den,
             pexp_num::HUGEINT * 10000000000000000::HUGEINT
               > 36888794541139363::HUGEINT * pexp_den::HUGEINT AS shift
      FROM f"""
    # Order-3 permutation entropy (Bandt & Pompe 2002): ordinal codes
    # from three <=-comparisons over the bucket-mean triples (integer-
    # exact); only the final H/h_norm are floats, floor-rounded at 6
    # (the token_entropy precedent); ln(6) inlined as the Python libm
    # literal so both engines divide by the identical double
    o["ts_perm_entropy"] = f"""
      WITH e AS (SELECT event_type, {EV_TIME} AS time, value FROM events),
      g AS (SELECT event_type, time - time % {HOUR} AS bucket,
                   {fr('sum(CAST(value AS DECIMAL(28,6)))::DOUBLE / count(*)', 6)}
                     AS v
            FROM e GROUP BY 1, 2),
      t AS (SELECT event_type,
                   lag(v, 2) OVER (PARTITION BY event_type
                                   ORDER BY bucket) AS a,
                   lag(v, 1) OVER (PARTITION BY event_type
                                   ORDER BY bucket) AS b,
                   v AS c
            FROM g),
      p AS (SELECT event_type,
                   ((a <= b)::BIGINT * 4 + (b <= c)::BIGINT * 2
                    + (a <= c)::BIGINT) AS pattern
            FROM t WHERE a IS NOT NULL),
      cnt AS (SELECT event_type, pattern, count(*)::BIGINT AS cnt
              FROM p GROUP BY 1, 2),
      ser AS (SELECT DISTINCT event_type FROM g),
      per0 AS (SELECT event_type, sum(cnt)::BIGINT AS n_windows,
                      count(*)::BIGINT AS n_patterns,
                      sum(CAST(cnt::DOUBLE * ln(cnt::DOUBLE)
                               AS DECIMAL(28,12))) AS s
               FROM cnt GROUP BY 1),
      per AS (SELECT event_type, n_windows, n_patterns,
             {fr('ln(n_windows::DOUBLE) - s::DOUBLE / n_windows::DOUBLE',
                 6)} AS h,
             {fr('(ln(n_windows::DOUBLE) - s::DOUBLE / n_windows::DOUBLE)'
                 ' / ' + '1.791759469228055', 6)} AS h_norm
      FROM per0)
      SELECT ser.event_type,
             coalesce(per.n_windows, 0)::BIGINT AS n_windows,
             coalesce(per.n_patterns, 0)::BIGINT AS n_patterns,
             per.h, per.h_norm
      FROM ser LEFT JOIN per ON per.event_type = ser.event_type"""
    # SAX symbolization (Lin et al. 2003): integer-exact segment
    # routing (rk·w)//n, decimal-exact series moments, z rounded at 6
    # BEFORE the Gaussian-breakpoint comparisons (a=4 literals)
    o["ts_sax"] = f"""
      WITH e AS (SELECT event_type, {EV_TIME} AS time, value FROM events),
      g AS (SELECT event_type, time - time % {HOUR} AS bucket,
                   {fr('sum(CAST(value AS DECIMAL(28,6)))::DOUBLE / count(*)', 6)}
                     AS v
            FROM e GROUP BY 1, 2),
      mom AS (SELECT event_type, count(*)::BIGINT AS n,
                     sum(v::DECIMAL(28,6)) AS s1,
                     sum((v * v)::DECIMAL(38,12)) AS s2
              FROM g GROUP BY 1),
      mm AS (SELECT event_type, n, s1::DOUBLE / n AS mu,
                    sqrt(greatest(s2::DOUBLE * n
                                  - s1::DOUBLE * s1::DOUBLE, 0)
                         / (n::DOUBLE * n::DOUBLE)) AS sigma
             FROM mom),
      r AS (SELECT event_type, bucket, v,
                   row_number() OVER (PARTITION BY event_type
                                      ORDER BY bucket) - 1 AS rk
            FROM g),
      segd AS (SELECT r.event_type, (rk * 32) // mm.n AS segment, v
               FROM r JOIN mm ON r.event_type = mm.event_type),
      paa AS (SELECT event_type, segment, count(*)::BIGINT AS n_pts,
                     {fr('sum(CAST(v AS DECIMAL(28,6)))::DOUBLE / count(*)', 6)}
                       AS paa
              FROM segd GROUP BY 1, 2),
      z AS (SELECT paa.event_type, segment, n_pts, paa,
                   CASE WHEN mm.sigma > 0
                        THEN {fr('(paa - mm.mu) / mm.sigma', 6)} END AS z
            FROM paa JOIN mm ON paa.event_type = mm.event_type)
      SELECT event_type, segment, n_pts, paa, z,
             CASE WHEN z IS NULL THEN NULL
                  WHEN z < -0.6744897501960817 THEN 'a'
                  WHEN z < 0.0 THEN 'b'
                  WHEN z < 0.6744897501960817 THEN 'c'
                  ELSE 'd' END AS symbol
      FROM z"""
    # Euclidean matrix profile (Yeh et al. 2016): m=4 lead-column
    # windows, exact DECIMAL(30,12) squared distances, argmin by
    # (d2, j) — the min(struct) order — sqrt only on the reported row
    o["ts_matrix_profile"] = f"""
      WITH e AS (SELECT event_type, {EV_TIME} AS time, value FROM events),
      g AS (SELECT event_type, time - time % {HOUR} AS bucket,
                   {fr('sum(CAST(value AS DECIMAL(28,6)))::DOUBLE / count(*)', 6)}
                     AS v
            FROM e GROUP BY 1, 2),
      r AS (SELECT event_type,
                   row_number() OVER w - 1 AS i, v AS v0,
                   lead(v, 1) OVER w AS v1,
                   lead(v, 2) OVER w AS v2,
                   lead(v, 3) OVER w AS v3
            FROM g WINDOW w AS (PARTITION BY event_type ORDER BY bucket)),
      win AS (SELECT * FROM r WHERE v3 IS NOT NULL),
      p AS (SELECT a.event_type, a.i, b.i AS j,
                   ((a.v0 - b.v0) * (a.v0 - b.v0))::DECIMAL(30,12)
                   + ((a.v1 - b.v1) * (a.v1 - b.v1))::DECIMAL(30,12)
                   + ((a.v2 - b.v2) * (a.v2 - b.v2))::DECIMAL(30,12)
                   + ((a.v3 - b.v3) * (a.v3 - b.v3))::DECIMAL(30,12)
                     AS d2
            FROM win a JOIN win b ON a.event_type = b.event_type
                                 AND abs(a.i - b.i) >= 4),
      best AS (SELECT event_type, i, j, d2,
                      row_number() OVER (PARTITION BY event_type, i
                                         ORDER BY d2 ASC, j ASC) AS rn
               FROM p)
      SELECT event_type, i, j AS nn_index,
             {fr('sqrt(d2::DOUBLE)', 6)} AS nn_dist
      FROM best WHERE rn = 1"""
    # Activity concentration: Gini via the Dorfman rank formula, exact
    # DECIMAL(18,0) products, integer ceil(n/10) decile head
    o["ev_gini"] = f"""
      WITH c AS (SELECT event_type, user_id, count(*)::BIGINT AS c
                 FROM events WHERE event_type IS NOT NULL GROUP BY 1, 2),
      r AS (SELECT event_type, user_id, c,
                   row_number() OVER (PARTITION BY event_type
                                      ORDER BY c ASC, user_id ASC) AS i
            FROM c),
      a AS (SELECT event_type, count(*)::BIGINT AS n_entities,
                   sum(c)::BIGINT AS n_events,
                   sum(i::DECIMAL(18,0) * c::DECIMAL(18,0)) AS ric
            FROM r GROUP BY 1),
      t AS (SELECT r.event_type, sum(c)::BIGINT AS top
            FROM r JOIN a ON r.event_type = a.event_type
            WHERE i > n_entities - (n_entities + 9) // 10
            GROUP BY 1)
      SELECT a.event_type, n_entities, n_events,
             {fr('(ric + ric - (n_entities + 1)::DECIMAL(18,0)'
                 ' * n_events::DECIMAL(18,0))::DOUBLE'
                 ' / (n_entities::DECIMAL(18,0)'
                 ' * n_events::DECIMAL(18,0))::DOUBLE', 6)} AS gini,
             {fr('top::DOUBLE / n_events::DOUBLE', 6)}
               AS top_decile_share
      FROM a JOIN t ON a.event_type = t.event_type"""
    # Token burstiness: population VMR over ALL docs via the
    # zero-count identity (zeros add nothing to the integer moment
    # sums); DECIMAL(19,0) product casts, pinned-order double combine
    o["text_burstiness"] = f"""
      WITH base AS (SELECT doc_id, text FROM documents
                    WHERE text IS NOT NULL),
      nd AS (SELECT count(*)::BIGINT AS n_docs FROM base),
      tf AS (SELECT doc_id, unnest({TOKS}) AS token FROM base),
      c AS (SELECT doc_id, token, count(*)::BIGINT AS c
            FROM tf GROUP BY 1, 2),
      mom AS (SELECT token, count(*)::BIGINT AS df_docs,
                     sum(c)::BIGINT AS total,
                     sum(c::DECIMAL(19,0) * c::DECIMAL(19,0)) AS s2
              FROM c GROUP BY 1),
      top AS (SELECT mom.*, nd.n_docs FROM mom, nd
              ORDER BY total DESC, token ASC LIMIT 50)
      SELECT token, df_docs, total, n_docs,
             {fr('(s2::DOUBLE * n_docs - total::DOUBLE * total::DOUBLE)'
                 ' / (n_docs::DOUBLE * total::DOUBLE)', 6)} AS vmr
      FROM top"""
    # Per-source length audit: the quantile_cont == percentile
    # convention (ts_quantile_bands), NULL lengths counted not measured
    o["doc_length_profile"] = f"""
      SELECT source, count(*)::BIGINT AS n_docs,
             count(n_chars)::BIGINT AS n_measured,
             {fr('quantile_cont(n_chars::DOUBLE, 0.25)', 6)} AS p25,
             {fr('quantile_cont(n_chars::DOUBLE, 0.5)', 6)} AS p50,
             {fr('quantile_cont(n_chars::DOUBLE, 0.75)', 6)} AS p75,
             {fr('quantile_cont(n_chars::DOUBLE, 0.95)', 6)} AS p95,
             {fr('sum(n_chars::DECIMAL(28,6))::DOUBLE / count(n_chars)',
                 6)} AS mean_len
      FROM documents GROUP BY 1"""
    # Zipf fit over the top-500 token frequencies: DuckDB's ln is the
    # same libm double as the Spark side's driver literals (verified
    # bit-equal on this box — the perm-entropy convention); OLS sums
    # DECIMAL(28,12), final combination in pinned-order DOUBLE
    o["text_zipf"] = f"""
      WITH tok AS (SELECT unnest({TOKS}) AS token FROM documents
                   WHERE text IS NOT NULL),
      cnt AS (SELECT token, count(*)::BIGINT AS freq
              FROM tok GROUP BY 1),
      top AS (SELECT token, freq FROM cnt
              ORDER BY freq DESC, token ASC LIMIT 500),
      rk AS (SELECT ln((row_number() OVER (ORDER BY freq DESC,
                                           token ASC))::DOUBLE) AS x,
                    ln(freq::DOUBLE) AS y
             FROM top),
      s AS (SELECT count(*)::BIGINT AS n_ranks,
                   sum(x::DECIMAL(28,12)) AS sx,
                   sum(y::DECIMAL(28,12)) AS sy,
                   sum((x * y)::DECIMAL(28,12)) AS sxy,
                   sum((x * x)::DECIMAL(28,12)) AS sxx
            FROM rk),
      f AS (SELECT n_ranks,
                   n_ranks::DOUBLE * sxx::DOUBLE
                     - sx::DOUBLE * sx::DOUBLE AS den,
                   n_ranks::DOUBLE * sxy::DOUBLE
                     - sx::DOUBLE * sy::DOUBLE AS num,
                   sx::DOUBLE AS sxd, sy::DOUBLE AS syd
            FROM s)
      SELECT n_ranks,
             CASE WHEN n_ranks >= 2 AND den != 0.0
                  THEN {fr('num / den', 6)} END AS slope,
             CASE WHEN n_ranks >= 2 AND den != 0.0
                  THEN {fr('(syd - (num / den) * sxd) / n_ranks::DOUBLE',
                           6)} END AS intercept
      FROM f"""
    # Ordered funnel: per-user first-touch chain via windowed min-CASE
    # (strictly-after gating), then per-step non-null counts
    o["ev_funnel_window"] = f"""
      WITH e AS (SELECT user_id, event_type, {EV_TIME} AS time FROM events),
      w0 AS (SELECT user_id, event_type, time,
               min(CASE WHEN event_type = 'signup' THEN time END)
                 OVER (PARTITION BY user_id) AS t0 FROM e),
      w1 AS (SELECT *, min(CASE WHEN event_type = 'view'
                                 AND time > t0
                                 AND time <= t0 + {DAY} THEN time END)
                 OVER (PARTITION BY user_id) AS t1 FROM w0),
      w2 AS (SELECT *, min(CASE WHEN event_type = 'purchase'
                                 AND time > t1
                                 AND time <= t1 + {DAY} THEN time END)
                 OVER (PARTITION BY user_id) AS t2 FROM w1),
      u AS (SELECT user_id, max(t0) AS t0, max(t1) AS t1, max(t2) AS t2
            FROM w2 GROUP BY 1)
      SELECT 0::BIGINT AS step, 'signup' AS step_name,
             count(t0)::BIGINT AS entities FROM u
      UNION ALL SELECT 1::BIGINT, 'view', count(t1)::BIGINT FROM u
      UNION ALL SELECT 2::BIGINT, 'purchase', count(t2)::BIGINT FROM u"""
    # Per-step conversion-lag profile over the same window chain:
    # exact integer lags, quantile_cont median (the ev_rfm convention)
    o["ev_funnel_times"] = f"""
      WITH e AS (SELECT user_id, event_type, {EV_TIME} AS time FROM events),
      w0 AS (SELECT user_id, event_type, time,
               min(CASE WHEN event_type = 'signup' THEN time END)
                 OVER (PARTITION BY user_id) AS t0 FROM e),
      w1 AS (SELECT *, min(CASE WHEN event_type = 'view'
                                 AND time > t0
                                 AND time <= t0 + {DAY} THEN time END)
                 OVER (PARTITION BY user_id) AS t1 FROM w0),
      w2 AS (SELECT *, min(CASE WHEN event_type = 'purchase'
                                 AND time > t1
                                 AND time <= t1 + {DAY} THEN time END)
                 OVER (PARTITION BY user_id) AS t2 FROM w1),
      u AS (SELECT user_id, max(t0) AS t0, max(t1) AS t1, max(t2) AS t2
            FROM w2 GROUP BY 1)
      SELECT 1::BIGINT AS step, 'view' AS step_name,
             count(t1)::BIGINT AS entities,
             min(t1 - t0) AS min_lag_ns,
             quantile_cont(t1 - t0, 0.5) AS median_lag_ns,
             max(t1 - t0) AS max_lag_ns FROM u
      UNION ALL
      SELECT 2::BIGINT, 'purchase', count(t2)::BIGINT,
             min(t2 - t1), quantile_cont(t2 - t1, 0.5), max(t2 - t1)
      FROM u"""
    o["ev_funnel"] = f"""
      WITH e AS (SELECT user_id, event_type, {EV_TIME} AS time FROM events),
      w0 AS (SELECT user_id, event_type, time,
               min(CASE WHEN event_type = 'signup' THEN time END)
                 OVER (PARTITION BY user_id) AS t0 FROM e),
      w1 AS (SELECT *, min(CASE WHEN event_type = 'view'
                                 AND time > t0 THEN time END)
                 OVER (PARTITION BY user_id) AS t1 FROM w0),
      w2 AS (SELECT *, min(CASE WHEN event_type = 'purchase'
                                 AND time > t1 THEN time END)
                 OVER (PARTITION BY user_id) AS t2 FROM w1),
      u AS (SELECT user_id, max(t0) AS t0, max(t1) AS t1, max(t2) AS t2
            FROM w2 GROUP BY 1)
      SELECT 0::BIGINT AS step, 'signup' AS step_name,
             count(t0)::BIGINT AS entities FROM u
      UNION ALL SELECT 1::BIGINT, 'view', count(t1)::BIGINT FROM u
      UNION ALL SELECT 2::BIGINT, 'purchase', count(t2)::BIGINT FROM u"""
    # DAU / trailing-7-day WAU / stickiness: distinct (user, day)
    # activity, map-only x7 window-end contribution fan-out, two
    # bucket-keyed aggs; only days with activity emit rows
    o["ev_active_users"] = f"""
      WITH act AS (SELECT DISTINCT user_id,
                          {EV_TIME} - {EV_TIME} % {DAY} AS d FROM events),
      dau AS (SELECT d, count(*)::BIGINT AS dau FROM act GROUP BY 1),
      con AS (SELECT DISTINCT user_id, d + i * {DAY} AS wd
              FROM act, generate_series(0, 6) AS g(i)),
      wau AS (SELECT wd, count(*)::BIGINT AS wau FROM con GROUP BY 1)
      SELECT dau.d AS bucket, dau.dau, wau.wau,
             {fr('dau.dau::DOUBLE / wau.wau::DOUBLE', 6)} AS stickiness
      FROM dau JOIN wau ON wau.wd = dau.d"""
    # Quality-percentile pruning: the text_quality oracle composed
    # verbatim, exact interpolating quantile threshold, >= keeps ties
    o["doc_quality_sample"] = f"""
      WITH q AS ({o['text_quality']}),
      thr AS (SELECT {fr('quantile_cont(quality, 0.7)', 6)} AS threshold
              FROM q)
      SELECT q.doc_id, q.quality, thr.threshold,
             q.quality >= thr.threshold AS keep
      FROM q, thr"""
    # Corpus bigram counts with support floor: per-(gram, doc)
    # pre-collapse, then totals + document frequency in one pass
    o["doc_ngram_counts"] = f"""
      WITH sh AS ({_shingles_cte(2)}),
      ex AS (SELECT doc_id, unnest(sh) AS gram FROM sh),
      pd AS (SELECT gram, doc_id, count(*)::BIGINT AS occ
             FROM ex GROUP BY 1, 2)
      SELECT gram, sum(occ)::BIGINT AS n_total,
             count(*)::BIGINT AS n_docs
      FROM pd GROUP BY 1 HAVING sum(occ) >= 3"""
    # Overlapping token-window chunking: starts = 1, 1+stride, ... while
    # start <= max(1, n - overlap); chunk_idx = 0-based start ordinal;
    # DuckDB list slice is 1-based inclusive
    o["doc_chunk"] = f"""
      WITH d AS (SELECT doc_id, {TOKS} AS toks FROM documents
                 WHERE text IS NOT NULL AND len({TOKS}) > 0),
      s AS (SELECT doc_id, toks,
                   unnest(generate_series(1, greatest(1, len(toks) - 8),
                                          24)) AS st
            FROM d)
      SELECT doc_id, ((st - 1) // 24)::BIGINT AS chunk_idx,
             least(32, len(toks) - st + 1)::BIGINT AS n_chunk_tokens,
             array_to_string(toks[st : st + 31], ' ') AS chunk_text
      FROM s"""
    # Top user-journey paths: first-5 ranking window ordered by
    # (time, type) — the pinned tie-break — then an ordered string_agg
    # fold and a path count
    o["ev_user_paths"] = f"""
      WITH e AS (SELECT user_id, event_type, {EV_TIME} AS time FROM events),
      r AS (SELECT user_id, event_type,
                   row_number() OVER (PARTITION BY user_id
                     ORDER BY time ASC, event_type ASC) AS rk
            FROM e),
      p AS (SELECT user_id,
                   string_agg(event_type, '>' ORDER BY rk) AS path
            FROM r WHERE rk <= 5 GROUP BY 1)
      SELECT path, count(*)::BIGINT AS n_entities FROM p GROUP BY 1"""
    # Sequential 3-gram support: the same (time, type)-ordered first-8
    # ranking as ev_user_paths, contiguous 3-grams via inclusive list
    # slices, DISTINCT per entity (a pattern repeating inside one
    # entity is one supporting entity), absolute min_support floor
    o["ev_path_ngrams"] = f"""
      WITH e AS (SELECT user_id, event_type, {EV_TIME} AS time
                 FROM events WHERE event_type IS NOT NULL),
      r AS (SELECT user_id, event_type,
                   row_number() OVER (PARTITION BY user_id
                     ORDER BY time ASC, event_type ASC) AS rk
            FROM e),
      s AS (SELECT user_id, list(event_type ORDER BY rk) AS seq
            FROM r WHERE rk <= 8 GROUP BY 1),
      g AS (SELECT DISTINCT user_id,
                   array_to_string(seq[i:i+2], '>') AS gram
            FROM s, unnest(generate_series(1, len(seq) - 2)) AS t(i)
            WHERE len(seq) >= 3)
      SELECT gram, count(*)::BIGINT AS support
      FROM g GROUP BY 1 HAVING count(*) >= 2"""
    # Daily cohort retention: distinct (user, day) activity, windowed
    # cohort minimum, plain cell counts
    # DAU robust-z anomaly screen: the mad_outliers arithmetic over the
    # daily distinct-entity counts (exact interpolating medians, _fr
    # floor rounding, MAD=0 -> NULL/false)
    o["ev_dau_anomaly"] = f"""
      WITH e AS (SELECT DISTINCT user_id,
                        {EV_TIME} - {EV_TIME} % {DAY} AS b FROM events),
      d AS (SELECT b AS bucket, count(*)::BIGINT AS dau FROM e GROUP BY 1),
      m AS (SELECT median(dau) AS med FROM d),
      p AS (SELECT any_value(m.med) AS med,
                   median(abs(d.dau - m.med)) AS mad
            FROM d, m)
      SELECT d.bucket, d.dau,
             CASE WHEN p.mad > 0
                  THEN {fr('0.6745 * (d.dau::DOUBLE - p.med) / p.mad', 6)}
             END AS robust_z,
             coalesce(abs(CASE WHEN p.mad > 0
                  THEN {fr('0.6745 * (d.dau::DOUBLE - p.med) / p.mad', 6)}
             END) > 3.5, false) AS is_anomaly
      FROM d, p"""
    # Association rules over (user, day) baskets: distinct basket
    # membership, size-capped [2, 64] pair generation (capped baskets
    # dropped from the pair stage only — singles/support denominators
    # count ALL baskets), integer min_count floor, each ratio one
    # floor-round-6 division of exact integers
    o["ev_basket_rules"] = f"""
      WITH basket AS (SELECT DISTINCT user_id,
                             {EV_TIME} - {EV_TIME} % {DAY} AS b,
                             event_type AS t
                      FROM events WHERE event_type IS NOT NULL),
      ok AS (SELECT user_id, b FROM basket GROUP BY 1, 2
             HAVING count(*) BETWEEN 2 AND 64),
      nb AS (SELECT count(*)::BIGINT AS nb
             FROM (SELECT DISTINCT user_id, b FROM basket)),
      singles AS (SELECT t, count(*)::BIGINT AS n FROM basket GROUP BY 1),
      pairs AS (SELECT x.t AS type_a, y.t AS type_b,
                       count(*)::BIGINT AS n_ab
                FROM basket x
                JOIN ok ON ok.user_id = x.user_id AND ok.b = x.b
                JOIN basket y ON y.user_id = x.user_id AND y.b = x.b
                WHERE x.t < y.t
                GROUP BY 1, 2 HAVING count(*) >= 2)
      SELECT type_a, type_b, sa.n AS n_a, sb.n AS n_b, n_ab,
             nb.nb AS n_baskets,
             {fr('n_ab::DOUBLE / nb.nb::DOUBLE', 6)} AS support,
             {fr('n_ab::DOUBLE / sa.n::DOUBLE', 6)} AS conf_a_to_b,
             {fr('n_ab::DOUBLE / sb.n::DOUBLE', 6)} AS conf_b_to_a,
             {fr('(n_ab::HUGEINT * nb.nb)::DOUBLE / (sa.n::HUGEINT * sb.n)::DOUBLE', 6)}
               AS lift
      FROM pairs
      JOIN singles sa ON sa.t = type_a
      JOIN singles sb ON sb.t = type_b, nb"""
    # Event-mix drift: chi-square GOF per day vs corpus mix; exact
    # HUGEINT cell deviations, phi^2-normalized <=1 terms in
    # DECIMAL(28,18) (order-free sum), chi2 = phi2*N, flag vs the same
    # published CHI2_95 literals ljung_box inlines (dof = n_types-1,
    # NULL outside the table); zero cells contribute via the spine
    _MIX_CHI2 = ("CASE per.n_types - 1 " + " ".join(
        f"WHEN {k} THEN {v!r}"
        for k, v in sorted({1: 3.841459, 2: 5.991465, 3: 7.814728,
                            4: 9.487729, 5: 11.070498, 6: 12.591587,
                            7: 14.067140, 8: 15.507313, 9: 16.918978,
                            10: 18.307038, 11: 19.675138,
                            12: 21.026070}.items())) + " END")
    o["ev_mix_drift"] = f"""
      WITH cell AS (SELECT event_type AS t,
                           {EV_TIME} - {EV_TIME} % {DAY} AS b,
                           count(*)::BIGINT AS obs
                    FROM events WHERE event_type IS NOT NULL
                    GROUP BY 1, 2),
      dd AS (SELECT b, sum(obs)::BIGINT AS d FROM cell GROUP BY 1),
      tt AS (SELECT t, sum(obs)::BIGINT AS tc FROM cell GROUP BY 1),
      nn AS (SELECT sum(obs)::BIGINT AS n FROM cell),
      f AS (SELECT dd.b, dd.d, tt.t, tt.tc, nn.n,
                   coalesce(cell.obs, 0)::BIGINT AS obs
            FROM dd CROSS JOIN tt CROSS JOIN nn
            LEFT JOIN cell ON cell.b = dd.b AND cell.t = tt.t),
      tm AS (SELECT b,
                    (((obs::HUGEINT * n - d::HUGEINT * tc)::DOUBLE
                      * (obs::HUGEINT * n - d::HUGEINT * tc)::DOUBLE)
                     / ((d::DOUBLE * tc::DOUBLE)
                        * (n::DOUBLE * n::DOUBLE)))::DECIMAL(28,18)
                      AS term,
                    n
             FROM f),
      per AS (SELECT b AS bucket, count(*)::BIGINT AS n_types,
                     sum(term) AS s, max(n) AS n
              FROM tm GROUP BY 1)
      SELECT bucket, n_types,
             {fr('s::DOUBLE', 6)} AS phi2,
             {fr('s::DOUBLE * n::DOUBLE', 6)} AS chi2,
             ({fr('s::DOUBLE * n::DOUBLE', 6)} > {_MIX_CHI2}) AS drifted
      FROM per"""
    # Growth accounting: distinct (user, day) activity, lag/lead
    # classification (new / retained / resurrected), churn into day+1
    # right-censored at the dataset max day, churn-only days kept by
    # the FULL join, quick ratio NULL when nobody churned
    o["ev_lifecycle"] = f"""
      WITH act AS (SELECT DISTINCT user_id,
                          {EV_TIME} - {EV_TIME} % {DAY} AS b FROM events),
      f AS (SELECT user_id, b,
                   lag(b) OVER (PARTITION BY user_id ORDER BY b) AS pb,
                   lead(b) OVER (PARTITION BY user_id ORDER BY b) AS nb
            FROM act),
      inflow AS (SELECT b AS bucket,
                   sum(CASE WHEN pb IS NULL THEN 1 ELSE 0 END)::BIGINT
                     AS n_new,
                   sum(CASE WHEN pb = b - {DAY} THEN 1 ELSE 0 END)::BIGINT
                     AS n_retained,
                   sum(CASE WHEN pb IS NOT NULL AND pb < b - {DAY}
                            THEN 1 ELSE 0 END)::BIGINT AS n_resurrected
                 FROM f GROUP BY 1),
      mx AS (SELECT max(b) AS mb FROM act),
      churn AS (SELECT b + {DAY} AS bucket, count(*)::BIGINT AS n_churned
                FROM f, mx
                WHERE (nb IS NULL OR nb > b + {DAY})
                  AND b + {DAY} <= mb
                GROUP BY 1)
      SELECT bucket,
             coalesce(n_new, 0)::BIGINT AS n_new,
             coalesce(n_retained, 0)::BIGINT AS n_retained,
             coalesce(n_resurrected, 0)::BIGINT AS n_resurrected,
             coalesce(n_churned, 0)::BIGINT AS n_churned,
             CASE WHEN coalesce(n_churned, 0) > 0
                  THEN {fr('(coalesce(n_new, 0) + coalesce(n_resurrected, 0))::DOUBLE / n_churned::DOUBLE', 6)}
             END AS quick_ratio
      FROM inflow FULL JOIN churn USING (bucket)"""
    # Per-type inter-event-gap cadence profile: same-(user, type) lag
    # gaps, exact median (quantile_cont mirror) + HUGEINT-sum mean,
    # |types| output cardinality with NULL stats for gapless types
    o["ev_inter_event"] = f"""
      WITH e AS (SELECT user_id, event_type, {EV_TIME} AS t FROM events
                 WHERE event_type IS NOT NULL),
      g AS (SELECT event_type,
                   t - lag(t) OVER (PARTITION BY user_id, event_type
                                    ORDER BY t ASC) AS gap
            FROM e),
      gg AS (SELECT event_type, gap FROM g WHERE gap IS NOT NULL),
      p AS (SELECT event_type, count(*)::BIGINT AS n_gaps,
                   min(gap)::BIGINT AS min_gap_ns,
                   max(gap)::BIGINT AS max_gap_ns,
                   {fr('quantile_cont(gap, 0.5)', 0)} AS median_gap_ns,
                   {fr('sum(gap::HUGEINT)::DOUBLE / count(*)::DOUBLE', 0)}
                     AS mean_gap_ns
            FROM gg GROUP BY 1),
      ty AS (SELECT DISTINCT event_type FROM e)
      SELECT ty.event_type, coalesce(p.n_gaps, 0)::BIGINT AS n_gaps,
             p.min_gap_ns, p.max_gap_ns, p.median_gap_ns, p.mean_gap_ns
      FROM ty LEFT JOIN p USING (event_type)"""
    # Per-source exact-duplication audit: (source, md5) clusters, then
    # per-source doc/digest counts, max clone width, round-6 dup rate
    o["doc_dup_profile"] = f"""
      WITH per AS (SELECT source, md5(text) AS d, count(*)::BIGINT AS n
                   FROM documents GROUP BY 1, 2),
      p AS (SELECT source, sum(n)::BIGINT AS n_docs,
                   count(*)::BIGINT AS n_unique,
                   max(n)::BIGINT AS max_clone
            FROM per GROUP BY 1)
      SELECT source, n_docs, n_unique,
             (n_docs - n_unique)::BIGINT AS n_dup_excess, max_clone,
             {fr('1.0 - n_unique::DOUBLE / n_docs::DOUBLE', 6)} AS dup_rate
      FROM p"""
    # Sankey transition edges: lag over the pinned (time, type) order,
    # pair counts + distinct entities per edge
    o["ev_transitions"] = f"""
      WITH e AS (SELECT user_id, event_type, {EV_TIME} AS time FROM events
                 WHERE event_type IS NOT NULL),
      p AS (SELECT user_id,
                   lag(event_type) OVER (PARTITION BY user_id
                     ORDER BY time ASC, event_type ASC) AS from_type,
                   event_type AS to_type
            FROM e)
      SELECT from_type, to_type, count(*)::BIGINT AS n_transitions,
             count(DISTINCT user_id)::BIGINT AS n_entities
      FROM p WHERE from_type IS NOT NULL GROUP BY 1, 2"""
    # Markov stationary distribution: the same fixed-point integer
    # power iteration as the Spark side (row-normalize at 1e6, iterate
    # at 1e12, every division a floor), 10 rounds unrolled and
    # MATERIALIZED (the pagerank/kcore convention — round k+1
    # references round k once per edge; inlining would re-derive the
    # whole prefix per reference)
    _MK_ITERS = 10
    _mk = [f"""
      i0 AS MATERIALIZED (
        SELECT state, (1000000000000 // (SELECT count(*) FROM st))::BIGINT
          AS pi FROM st)"""]
    for _k in range(1, _MK_ITERS + 1):
        _mk.append(f"""
      i{_k} AS MATERIALIZED (
        SELECT s.state, coalesce(m.pi, 0)::BIGINT AS pi
        FROM st s LEFT JOIN (
          SELECT p0.dst AS state,
                 sum((i.pi * p0.p) // 1000000)::BIGINT AS pi
          FROM i{_k - 1} i JOIN p0 ON i.state = p0.src
          GROUP BY 1) m ON m.state = s.state)""")
    o["ev_markov"] = f"""
      WITH e AS (SELECT user_id, event_type, {EV_TIME} AS time FROM events
                 WHERE event_type IS NOT NULL),
      pr AS (SELECT user_id,
                    lag(event_type) OVER (PARTITION BY user_id
                      ORDER BY time ASC, event_type ASC) AS from_type,
                    event_type AS to_type
             FROM e),
      t AS (SELECT from_type, to_type, count(*)::BIGINT AS n
            FROM pr WHERE from_type IS NOT NULL GROUP BY 1, 2),
      st AS (SELECT DISTINCT state FROM (
               SELECT from_type AS state FROM t
               UNION SELECT to_type FROM t)),
      outd AS (SELECT from_type, sum(n)::BIGINT AS nn FROM t GROUP BY 1),
      p0 AS (SELECT from_type AS src, to_type AS dst,
                    ((n * 1000000) // nn)::BIGINT AS p
             FROM t JOIN outd USING (from_type)
             UNION ALL
             SELECT state, state, 1000000::BIGINT FROM st
             WHERE state NOT IN (SELECT from_type FROM t)),
      {",".join(_mk)}
      SELECT state AS event_type, pi AS pi_fp,
             {fr('pi::DOUBLE / 1000000000000.0', 6)} AS pi
      FROM i{_MK_ITERS}"""
    # Per-(series, hour) SLO bands: exact interpolating quantiles —
    # quantile_cont == Spark percentile under the (n-1)*q convention
    # (the ev_inter_event median equivalence, extended to the tail)
    o["ts_quantile_bands"] = f"""
      WITH e AS (SELECT event_type, {EV_TIME} AS time, value FROM events)
      SELECT event_type, time - time % {HOUR} AS bucket,
             count(*)::BIGINT AS n,
             {fr('quantile_cont(value, 0.5)', 6)} AS p50,
             {fr('quantile_cont(value, 0.95)', 6)} AS p95,
             {fr('quantile_cont(value, 0.99)', 6)} AS p99,
             {fr('max(value)', 6)} AS v_max
      FROM e GROUP BY 1, 2"""
    o["ev_retention"] = f"""
      WITH e AS (SELECT DISTINCT user_id,
                        {EV_TIME} - {EV_TIME} % {DAY} AS b FROM events),
      c AS (SELECT user_id, b,
                   min(b) OVER (PARTITION BY user_id) AS cohort FROM e)
      SELECT cohort AS cohort_bucket, ((b - cohort) // {DAY})::BIGINT
               AS "offset", count(*)::BIGINT AS n_entities
      FROM c GROUP BY 1, 2"""
    # Exact phi-heavy hitters: strict integer threshold cnt*k > n, at
    # most k-1 survivors by pigeonhole; share is reporting only
    o["ev_heavy_hitters"] = f"""
      WITH c AS (SELECT user_id, count(*)::BIGINT AS cnt
                 FROM events GROUP BY 1),
      t AS (SELECT count(*)::BIGINT AS n FROM events)
      SELECT c.user_id, c.cnt, t.n AS n_total,
             {fr('c.cnt::DOUBLE / t.n::DOUBLE', 6)} AS share
      FROM c, t WHERE c.cnt * 140 > t.n"""
    # Daily cohort revenue / LTV triangle: first-touch cohorts over
    # ALL events, purchase revenue in DECIMAL(28,6) (order-free), one
    # rounded division by the exact cohort size
    _LTV_B = DAY
    o["ev_cohort_ltv"] = f"""
      WITH f AS (SELECT user_id,
                        min({EV_TIME} - {EV_TIME} % {_LTV_B}) AS cohort
                 FROM events GROUP BY 1),
      sz AS (SELECT cohort AS cohort_bucket, count(*)::BIGINT
               AS cohort_size FROM f GROUP BY 1),
      r AS (SELECT e.user_id, f.cohort AS cohort_bucket,
                   (({EV_TIME} - {EV_TIME} % {_LTV_B}) - f.cohort)
                     // {_LTV_B} AS "offset",
                   e.value
            FROM events e JOIN f USING (user_id)
            WHERE e.event_type = 'purchase'),
      a AS (SELECT cohort_bucket, "offset",
                   count(DISTINCT user_id)::BIGINT AS buyers,
                   sum(CAST(value AS DECIMAL(28,6)))::DOUBLE AS revenue
            FROM r GROUP BY 1, 2)
      SELECT a.cohort_bucket, a."offset"::BIGINT AS "offset",
             sz.cohort_size, a.buyers, a.revenue,
             {fr('a.revenue / sz.cohort_size::DOUBLE', 6)} AS ltv_per_user
      FROM a JOIN sz USING (cohort_bucket)"""
    # Seasonal Mann–Kendall (Hirsch & Slack): per-season integer S and
    # tie correction, summed — same exactness as plain MK
    o["ts_seasonal_mk"] = f"""
      WITH e AS (SELECT event_type, {EV_TIME} AS time, value FROM events),
      g AS (SELECT event_type, time - time % {HOUR} AS bucket,
                   {fr('sum(CAST(value AS DECIMAL(28,6)))::DOUBLE / count(*)', 6)}
                     AS v
            FROM e GROUP BY 1, 2),
      gp AS (SELECT event_type, (bucket // {HOUR}) % 24 AS ph, bucket, v
             FROM g),
      n AS (SELECT event_type, count(*) AS n_buckets FROM g GROUP BY 1),
      s AS (SELECT a.event_type, sum(sign(b.v - a.v))::BIGINT AS s
            FROM gp a JOIN gp b ON b.event_type = a.event_type
                              AND b.ph = a.ph AND b.bucket > a.bucket
            GROUP BY 1),
      np AS (SELECT event_type, ph, count(*) AS np
             FROM gp GROUP BY 1, 2),
      tc AS (SELECT event_type, ph,
                    sum(t * (t - 1) * (2 * t + 5)) AS tie_corr
             FROM (SELECT event_type, ph, v, count(*) AS t
                   FROM gp GROUP BY 1, 2, 3) GROUP BY 1, 2),
      vv AS (SELECT np.event_type,
                    sum(np.np * (np.np - 1) * (2 * np.np + 5)) AS vn,
                    sum(tc.tie_corr) AS tcs
             FROM np JOIN tc USING (event_type, ph) GROUP BY 1),
      j AS (SELECT n.event_type, n.n_buckets,
                   coalesce(s.s, 0) AS s,
                   (coalesce(vv.vn, 0) - coalesce(vv.tcs, 0))::DOUBLE
                     / 18.0 AS var
            FROM n LEFT JOIN s USING (event_type)
                   LEFT JOIN vv USING (event_type)),
      z AS (SELECT event_type, n_buckets, s,
                   CASE WHEN var > 0 THEN
                     {fr("CASE WHEN s > 0 THEN (s::DOUBLE - 1) / sqrt(var)"
                         " WHEN s < 0 THEN (s::DOUBLE + 1) / sqrt(var)"
                         " ELSE 0.0 END", 6)}
                   ELSE 0.0 END AS z
            FROM j)
      SELECT event_type, n_buckets::BIGINT AS n_buckets, s, z,
             abs(z) > 1.959964 AS trend
      FROM z"""
    # Mann–Kendall: integer S + integer tie correction over round-6
    # bucket means — exact on any engine; z = one rational division +
    # IEEE sqrt, floor-rounded
    o["ts_mann_kendall"] = f"""
      WITH e AS (SELECT event_type, {EV_TIME} AS time, value FROM events),
      g AS (SELECT event_type, time - time % {HOUR} AS bucket,
                   {fr('sum(CAST(value AS DECIMAL(28,6)))::DOUBLE / count(*)', 6)}
                     AS v
            FROM e GROUP BY 1, 2),
      n AS (SELECT event_type, count(*) AS n FROM g GROUP BY 1),
      s AS (SELECT a.event_type,
                   sum(sign(b.v - a.v))::BIGINT AS s
            FROM g a JOIN g b ON b.event_type = a.event_type
                             AND b.bucket > a.bucket
            GROUP BY 1),
      tc AS (SELECT event_type,
                    sum(t * (t - 1) * (2 * t + 5)) AS tie_corr
             FROM (SELECT event_type, v, count(*) AS t
                   FROM g GROUP BY 1, 2) GROUP BY 1),
      f AS (SELECT n.event_type, n.n, coalesce(s.s, 0) AS s,
                   (n.n::DOUBLE * (n.n - 1) * (2 * n.n + 5)
                    - coalesce(tc.tie_corr, 0)::DOUBLE) / 18.0 AS var
            FROM n LEFT JOIN s USING (event_type)
                   LEFT JOIN tc USING (event_type)),
      z AS (SELECT event_type, n, s,
                   CASE WHEN var > 0 THEN
                     {fr("CASE WHEN s > 0 THEN (s::DOUBLE - 1) / sqrt(var)"
                         " WHEN s < 0 THEN (s::DOUBLE + 1) / sqrt(var)"
                         " ELSE 0.0 END", 6)}
                   ELSE 0.0 END AS z
            FROM f)
      SELECT event_type, n::BIGINT AS n_buckets, s, z,
             abs(z) > 1.959964 AS trend
      FROM z"""
    # Theil–Sen robust trend: median of pairwise bucket-mean slopes
    # (exact integer bucket steps via //), then median residual with
    # the ROUNDED slope — both medians interpolate (a+b)/2 on even
    # counts, the established mad_outliers cross-engine parity
    o["ts_theil_sen"] = f"""
      WITH e AS (SELECT event_type, {EV_TIME} AS time, value FROM events),
      g AS (SELECT event_type, time - time % {HOUR} AS bucket,
                   {fr('sum(CAST(value AS DECIMAL(28,6)))::DOUBLE / count(*)', 6)}
                     AS v
            FROM e GROUP BY 1, 2),
      p AS (SELECT a.event_type,
                   (b.v - a.v) / ((b.bucket - a.bucket) // {HOUR})::DOUBLE
                     AS s
            FROM g a JOIN g b ON b.event_type = a.event_type
                             AND b.bucket > a.bucket),
      sl AS (SELECT event_type, {fr('median(s)', 6)} AS slope_per_bucket,
                    count(*) AS n_pairs
             FROM p GROUP BY 1),
      mn AS (SELECT event_type, min(bucket) AS b0 FROM g GROUP BY 1),
      r AS (SELECT g.event_type, sl.slope_per_bucket, sl.n_pairs,
                   g.v - sl.slope_per_bucket
                       * ((g.bucket - mn.b0) // {HOUR})::DOUBLE AS res
            FROM g JOIN sl USING (event_type) JOIN mn USING (event_type)),
      f AS (SELECT event_type, n_pairs, slope_per_bucket,
                   {fr('median(res)', 6)} AS intercept
            FROM r GROUP BY 1, 2, 3),
      ser AS (SELECT event_type FROM g GROUP BY 1)
      SELECT ser.event_type, coalesce(f.n_pairs, 0) AS n_pairs,
             f.slope_per_bucket, f.intercept
      FROM ser LEFT JOIN f USING (event_type)"""
    # OLS linear trend: every moment accumulates in DECIMAL over small
    # bucket-index x values, then the closed forms chain identical
    # doubles (operand order mirrored verbatim from linear_trend)
    o["ts_trend"] = f"""
      WITH e AS (SELECT event_type, {EV_TIME} AS time, value FROM events),
      g AS (SELECT event_type, time - time % {HOUR} AS bucket,
                   {fr('sum(CAST(value AS DECIMAL(28,6)))::DOUBLE / count(*)', 6)}
                     AS v
            FROM e GROUP BY 1, 2),
      mn AS (SELECT event_type, min(bucket) AS b0 FROM g GROUP BY 1),
      d AS (SELECT g.event_type,
                   ((g.bucket - mn.b0) // {HOUR})::DOUBLE AS x, g.v
            FROM g JOIN mn USING (event_type)),
      mo AS (SELECT event_type, count(*)::DOUBLE AS n,
                    sum(CAST(x AS DECIMAL(28,10)))::DOUBLE AS sx,
                    sum(CAST(x * x AS DECIMAL(28,10)))::DOUBLE AS sxx,
                    sum(CAST(v AS DECIMAL(28,10)))::DOUBLE AS sy,
                    sum(CAST(v * v AS DECIMAL(28,10)))::DOUBLE AS syy,
                    sum(CAST(x * v AS DECIMAL(28,10)))::DOUBLE AS sxy
             FROM d GROUP BY 1),
      f AS (SELECT event_type, n,
                   n * sxy - sx * sy AS num,
                   n * sxx - sx * sx AS denx,
                   n * syy - sy * sy AS deny, sx, sy
            FROM mo)
      SELECT event_type, n::BIGINT AS n_buckets,
             {fr('CASE WHEN denx > 0 THEN num / denx ELSE 0.0 END', 6)}
               AS slope_per_bucket,
             {fr('(sy - (CASE WHEN denx > 0 THEN num / denx ELSE 0.0 END)'
                 ' * sx) / n', 6)} AS intercept,
             {fr('CASE WHEN denx > 0 AND deny > 0 THEN'
                 ' (num / denx) * (num / deny) ELSE 0.0 END', 6)} AS r2
      FROM f"""
    # Page's two-sided tabular CUSUM: the recursion carries (sp, sn,
    # alarm) with the Spark-side loop's exact operand order — base case
    # 0.0 + (x - mu - k) reduces to (x - mu - k); alarm resets both
    # sides for the NEXT step (CASE on c.alarm), mirroring the Python
    # `if alarm: sp = sn = 0.0` before the update
    o["ts_cusum"] = f"""
      WITH RECURSIVE
      m AS (SELECT event_type,
                   {fr('sum(CAST(value AS DECIMAL(28,6)))::DOUBLE / count(*)', 6)}
                     AS mu
            FROM events WHERE value IS NOT NULL GROUP BY 1),
      p AS MATERIALIZED (
        SELECT e.event_type AS s, {EV_TIME} AS t, e.value AS v, m.mu,
               -- value as secondary key pins duplicate timestamps; any
               -- remaining ties are equal-x rows whose fold order
               -- cannot change the carry (r5 review; mirrors the
               -- operator's sort_values([time, value]))
               row_number() OVER (PARTITION BY e.event_type
                                  ORDER BY {EV_TIME}, e.value) AS r
        FROM events e JOIN m ON m.event_type = e.event_type
        WHERE e.value IS NOT NULL),
      c(s, r, t, sp, sn, alarm) AS (
        SELECT s, r, t,
               greatest(v - mu - 25.0, 0.0),
               greatest(mu - v - 25.0, 0.0),
               greatest(v - mu - 25.0, 0.0) > 250.0
                 OR greatest(mu - v - 25.0, 0.0) > 250.0
        FROM p WHERE r = 1
        UNION ALL
        SELECT p.s, p.r, p.t,
               greatest((CASE WHEN c.alarm THEN 0.0 ELSE c.sp END)
                        + (p.v - p.mu - 25.0), 0.0),
               greatest((CASE WHEN c.alarm THEN 0.0 ELSE c.sn END)
                        + (p.mu - p.v - 25.0), 0.0),
               greatest((CASE WHEN c.alarm THEN 0.0 ELSE c.sp END)
                        + (p.v - p.mu - 25.0), 0.0) > 250.0
                 OR greatest((CASE WHEN c.alarm THEN 0.0 ELSE c.sn END)
                             + (p.mu - p.v - 25.0), 0.0) > 250.0
        FROM c JOIN p ON p.s = c.s AND p.r = c.r + 1)
      SELECT s AS event_type, t AS time, {fr('sp', 6)} AS s_pos,
             {fr('sn', 6)} AS s_neg, alarm FROM c"""
    # Box–Jenkins biased-estimator ACF over hourly bucket means: every
    # sum that crosses rows accumulates in DECIMAL (order-free); the
    # centered products are double-multiplied then decimal-cast — the
    # identical expression on both engines (the ts_decompose convention)
    o["ts_acf"] = f"""
      WITH e AS (SELECT event_type, {EV_TIME} AS time, value FROM events),
      g AS (SELECT event_type, time - time % {HOUR} AS bucket,
                   {fr('sum(CAST(value AS DECIMAL(28,6)))::DOUBLE / count(*)', 6)}
                     AS v
            FROM e GROUP BY 1, 2),
      m AS (SELECT event_type,
                   {fr('sum(CAST(v AS DECIMAL(28,6)))::DOUBLE / count(*)', 6)}
                     AS xbar
            FROM g GROUP BY 1),
      r AS (SELECT g.event_type,
                   row_number() OVER (PARTITION BY g.event_type
                                      ORDER BY bucket) AS rn,
                   g.v - m.xbar AS c
            FROM g JOIN m USING (event_type)),
      den AS (SELECT event_type,
                     sum(CAST(c * c AS DECIMAL(28,10)))::DOUBLE AS den
              FROM r GROUP BY 1),
      p AS (SELECT a.event_type, l.lag::INT AS lag,
                   sum(CAST(a.c * b.c AS DECIMAL(28,10)))::DOUBLE AS num,
                   count(*) AS n_pairs
            FROM r a
            CROSS JOIN generate_series(1, 12) l(lag)
            JOIN r b ON b.event_type = a.event_type
                    AND b.rn = a.rn + l.lag
            GROUP BY 1, 2)
      SELECT p.event_type, p.lag, p.n_pairs,
             CASE WHEN den.den > 0 THEN {fr('p.num / den.den', 6)}
                  ELSE 0.0 END AS acf
      FROM p JOIN den USING (event_type)"""
    # Ljung-Box portmanteau over the same acf pipeline: Q = n(n+2) *
    # sum r_k^2/(n-k) with DECIMAL(28,18) order-free term accumulation,
    # chi-square 95% thresholds inlined as the identical published
    # literals the Spark create_map carries (CASE mirror)
    _CHI2_CASE = ("CASE q.h " + " ".join(
        f"WHEN {k} THEN {v!r}"
        for k, v in sorted({1: 3.841459, 2: 5.991465, 3: 7.814728,
                            4: 9.487729, 5: 11.070498, 6: 12.591587,
                            7: 14.067140, 8: 15.507313, 9: 16.918978,
                            10: 18.307038, 11: 19.675138,
                            12: 21.026070}.items())) + " END")
    o["ts_ljung_box"] = f"""
      WITH e AS (SELECT event_type, {EV_TIME} AS time, value FROM events),
      g AS (SELECT event_type, time - time % {HOUR} AS bucket,
                   {fr('sum(CAST(value AS DECIMAL(28,6)))::DOUBLE / count(*)', 6)}
                     AS v
            FROM e GROUP BY 1, 2),
      m AS (SELECT event_type,
                   {fr('sum(CAST(v AS DECIMAL(28,6)))::DOUBLE / count(*)', 6)}
                     AS xbar
            FROM g GROUP BY 1),
      r AS (SELECT g.event_type,
                   row_number() OVER (PARTITION BY g.event_type
                                      ORDER BY bucket) AS rn,
                   g.v - m.xbar AS c
            FROM g JOIN m USING (event_type)),
      den AS (SELECT event_type,
                     sum(CAST(c * c AS DECIMAL(28,10)))::DOUBLE AS den
              FROM r GROUP BY 1),
      p AS (SELECT a.event_type, l.lag::INT AS lag,
                   sum(CAST(a.c * b.c AS DECIMAL(28,10)))::DOUBLE AS num
            FROM r a
            CROSS JOIN generate_series(1, 12) l(lag)
            JOIN r b ON b.event_type = a.event_type
                    AND b.rn = a.rn + l.lag
            GROUP BY 1, 2),
      acf AS (SELECT p.event_type, p.lag,
                     CASE WHEN den.den > 0 THEN {fr('p.num / den.den', 6)}
                          ELSE 0.0 END AS acf
              FROM p JOIN den USING (event_type)),
      cnt AS (SELECT event_type, count(*)::BIGINT AS n_buckets
              FROM g GROUP BY 1),
      per AS (SELECT a.event_type, max(c.n_buckets) AS n,
                     count(*)::BIGINT AS h,
                     sum(CAST(a.acf * a.acf
                              / (c.n_buckets - a.lag)::DOUBLE
                              AS DECIMAL(28,18))) AS s
              FROM acf a JOIN cnt c USING (event_type) GROUP BY 1),
      q AS (SELECT event_type, h,
                   {fr('(n * (n + 2))::DOUBLE * s::DOUBLE', 6)} AS q
            FROM per)
      SELECT cnt.event_type, cnt.n_buckets,
             coalesce(q.h, 0)::BIGINT AS h, q.q,
             coalesce(q.q > {_CHI2_CASE}, false) AS rejected
      FROM cnt LEFT JOIN q USING (event_type)"""
    # lagged cross-correlation click↔purchase: bucket-arithmetic
    # alignment (wall-clock lag), full-history Pearson normalization;
    # sqrt is IEEE-correctly-rounded in both engines
    o["ts_xcorr"] = f"""
      WITH e AS (SELECT event_type, {EV_TIME} AS time, value FROM events
                 WHERE event_type IN ('click', 'purchase')),
      g AS (SELECT event_type, time - time % {HOUR} AS bucket,
                   {fr('sum(CAST(value AS DECIMAL(28,6)))::DOUBLE / count(*)', 6)}
                     AS v
            FROM e GROUP BY 1, 2),
      m AS (SELECT event_type,
                   {fr('sum(CAST(v AS DECIMAL(28,6)))::DOUBLE / count(*)', 6)}
                     AS xbar
            FROM g GROUP BY 1),
      c AS (SELECT g.event_type, g.bucket, g.v - m.xbar AS c
            FROM g JOIN m USING (event_type)),
      den AS (SELECT event_type,
                     sqrt(sum(CAST(c * c AS DECIMAL(28,10)))::DOUBLE) AS den
              FROM c GROUP BY 1),
      p AS (SELECT l.lag::INT AS lag,
                   sum(CAST(a.c * b.c AS DECIMAL(28,10)))::DOUBLE AS num,
                   count(*) AS n_pairs
            FROM (SELECT bucket, c FROM c WHERE event_type = 'click') a
            CROSS JOIN generate_series(-6, 6) l(lag)
            JOIN (SELECT bucket, c FROM c WHERE event_type = 'purchase') b
              ON b.bucket = a.bucket + l.lag * {HOUR}
            GROUP BY 1)
      SELECT p.lag, p.n_pairs,
             CASE WHEN da.den > 0 AND db.den > 0
                  THEN {fr('p.num / da.den / db.den', 6)}
                  ELSE 0.0 END AS xcorr
      FROM p,
           (SELECT den FROM den WHERE event_type = 'click') da(den),
           (SELECT den FROM den WHERE event_type = 'purchase') db(den)"""
    # classical additive decomposition: decimal-accumulated bucket/phase
    # means (order-free), trend and all downstream chaining on ROUNDED
    # doubles so both engines see identical bits at every step
    o["ts_decompose"] = f"""
      WITH e AS (SELECT event_type, {EV_TIME} AS time, value FROM events),
      g AS (SELECT event_type, time - time % {HOUR} AS bucket,
                   {fr('sum(CAST(value AS DECIMAL(28,6)))::DOUBLE / count(*)', 6)}
                     AS v
            FROM e GROUP BY 1, 2),
      t AS (SELECT event_type, bucket, v,
                   CASE WHEN count(v) OVER w = 25
                        THEN {fr('(sum(CAST(v AS DECIMAL(28,6))) OVER w)'
                                 '::DOUBLE / 25.0', 4)} END AS trend
            FROM g
            WINDOW w AS (PARTITION BY event_type ORDER BY bucket
                         ROWS BETWEEN 12 PRECEDING AND 12 FOLLOWING)),
      s AS (SELECT event_type, (bucket // {HOUR}) % 24 AS ph,
                   {fr('sum(CAST(v - trend AS DECIMAL(28,10)))::DOUBLE'
                       ' / count(*)', 4)} AS seasonal
            FROM t WHERE trend IS NOT NULL GROUP BY 1, 2)
      SELECT t.event_type, t.bucket, t.v, t.trend, s.seasonal,
             {fr('t.v - t.trend - s.seasonal', 4)} AS resid
      FROM t LEFT JOIN s ON s.event_type = t.event_type
                        AND s.ph = (t.bucket // {HOUR}) % 24"""
    # Seasonal-adjusted anomalies: the decompose oracle composed
    # VERBATIM as a CTE (nested WITH), then median/MAD over its
    # residuals and the same rounded modified z-score + 3.5 cutoff
    o["ts_seasonal_anomaly"] = f"""
      WITH dcmp AS ({o['ts_decompose']}),
      r AS (SELECT * FROM dcmp WHERE resid IS NOT NULL),
      med AS (SELECT event_type, median(resid) AS med FROM r GROUP BY 1),
      mad AS (SELECT r.event_type, median(abs(r.resid - m.med)) AS mad
              FROM r JOIN med m USING (event_type) GROUP BY 1),
      z AS (SELECT r.event_type, r.bucket, {fr('r.v', 6)} AS v, r.resid,
                   CASE WHEN d.mad > 0 THEN
                     {fr('0.6745 * (r.resid - m.med) / d.mad', 6)}
                   END AS robust_z
            FROM r JOIN med m USING (event_type)
                   JOIN mad d USING (event_type))
      SELECT event_type, bucket, v, resid, robust_z
      FROM z WHERE coalesce(abs(robust_z) > 3.5, FALSE)"""
    # Iglewicz–Hoaglin modified z-score: both engines compute the exact
    # interpolating median (Spark F.median / DuckDB median — (a+b)/2 of
    # the two middles on even counts, identical doubles), then round the
    # score at 6 before the 3.5 cutoff so the flag itself compares equal
    o["ts_mad_outliers"] = f"""
      WITH e AS (SELECT event_type, {EV_TIME} AS time, value FROM events),
      med AS (SELECT event_type, median(value) AS med FROM e GROUP BY 1),
      mad AS (SELECT e.event_type, median(abs(e.value - m.med)) AS mad
              FROM e JOIN med m USING (event_type) GROUP BY 1),
      z AS (SELECT e.event_type, e.time, e.value,
                   CASE WHEN d.mad > 0 THEN
                     {fr('0.6745 * (e.value - m.med) / d.mad', 6)}
                   END AS robust_z
            FROM e JOIN med m USING (event_type) JOIN mad d USING (event_type))
      SELECT event_type, time, {fr('value', 6)} AS value, robust_z
      FROM z WHERE coalesce(abs(robust_z) > 3.5, FALSE)"""
    # deadman: newest point per series vs the global newest point (the
    # deterministic "now" anchor); threshold 1800 s
    o["ts_deadman"] = f"""
      WITH d AS (SELECT event_type, {EV_TIME} AS t FROM events),
      l AS (SELECT event_type, max(t) AS last_time,
                   count(*) AS n_points FROM d GROUP BY event_type),
      m AS (SELECT max(t) AS now FROM d)
      SELECT event_type, last_time, n_points,
             m.now - last_time AS age_ns,
             (m.now - last_time) > {1800 * 10 ** 9} AS dead
      FROM l, m"""
    # gap report: per-series lag, silences > 2 h
    o["ts_gaps"] = f"""
      WITH d AS (SELECT event_type, {EV_TIME} AS t FROM events),
      g AS (SELECT event_type,
                   lag(t) OVER (PARTITION BY event_type ORDER BY t)
                     AS gap_start,
                   t AS gap_end
            FROM d)
      SELECT event_type, gap_start, gap_end,
             gap_end - gap_start AS gap_ns
      FROM g WHERE gap_start IS NOT NULL
        AND gap_end - gap_start > {2 * 3600 * 10 ** 9}"""
    # directional shingle containment over DF-bounded inverted-index
    # candidates (prefix filtering: only shingles with df in [2, 50] pair
    # their posting lists) — |∩|/|A| and |∩|/|B|, pair kept when either
    # reaches the threshold
    o["doc_containment"] = f"""
      WITH sh AS MATERIALIZED ({_shingles_cte(3)}),
      shd AS MATERIALIZED (
        SELECT doc_id, list_distinct(sh) AS sh FROM sh WHERE len(sh) > 0),
      ex AS (SELECT doc_id, unnest(sh) AS g FROM shd),
      rare AS (SELECT g FROM ex GROUP BY g
               HAVING count(*) >= 2 AND count(*) <= 50),
      cand AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b
        FROM ex a JOIN rare USING (g) JOIN ex b USING (g)
        WHERE a.doc_id < b.doc_id GROUP BY 1, 2
        HAVING count(*) >= 3),
      sc AS (SELECT id_a, id_b,
                    len(list_filter(sa.sh,
                        x -> list_contains(sb.sh, x)))::DOUBLE AS inter,
                    len(sa.sh)::DOUBLE AS na, len(sb.sh)::DOUBLE AS nb
             FROM cand JOIN shd sa ON sa.doc_id = id_a
                       JOIN shd sb ON sb.doc_id = id_b)
      SELECT id_a, id_b,
             round(CASE WHEN na > 0 THEN inter / na ELSE 0 END, 6) AS cont_a,
             round(CASE WHEN nb > 0 THEN inter / nb ELSE 0 END, 6) AS cont_b
      FROM sc
      WHERE round(CASE WHEN na > 0 THEN inter / na ELSE 0 END, 6) >= 0.8
         OR round(CASE WHEN nb > 0 THEN inter / nb ELSE 0 END, 6) >= 0.8"""
    o["cube_counts"] = """
      SELECT coalesce(o_orderstatus, 'ALL') AS o_orderstatus,
             coalesce(o_orderpriority, 'ALL') AS o_orderpriority,
             count(*) AS n
      FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)"""
    o["iq_regex_tag"] = f"""
      SELECT event_type, count(value) AS n,
             {fr('sum(value)', 2)} AS sv
      FROM events WHERE regexp_matches(event_type, '^(click|view)$')
      GROUP BY 1"""
    o["iq_bucket_offset"] = f"""
      SELECT (({EV_TIME} - {6 * HOUR}) // {DAY}) * {DAY} + {6 * HOUR} AS time,
             event_type, count(value) AS n
      FROM events GROUP BY 1, 2"""
    # offset-aligned fill spine: first bucket = floor(JAN1 into (1d,6h) grid)
    # = JAN1 - 18h (the bucket containing the range start).
    _OFF_FIRST = JAN1 - 18 * HOUR
    o["iq_fill_offset"] = f"""
      WITH agg AS (
        SELECT (({EV_TIME} - {6 * HOUR}) // {DAY}) * {DAY} + {6 * HOUR} AS time,
               count(value) AS n
        FROM events
        WHERE {EV_TIME} >= {JAN1} AND {EV_TIME} < {JAN1 + 10 * DAY}
          AND event_type = 'signup'
        GROUP BY 1),
      spine AS (
        SELECT unnest(generate_series({_OFF_FIRST}, {JAN1 + 10 * DAY} - 1,
                                      {DAY})) AS time)
      SELECT s.time, coalesce(a.n, 0) AS n
      FROM spine s LEFT JOIN agg a USING (time)"""
    # tz fill spine: uniform local-midnight edges (local ns), mapped back to
    # the UTC instant — identical walk to fill.bucket_spine's tz branch, so
    # the 2024-03-10 DST transition yields the same 23-hour-day edge.
    MAR15 = 1_710_460_800_000_000_000
    o["iq_fill_tz"] = f"""
      WITH a AS (
        SELECT epoch_us(timezone('America/New_York',
                 to_timestamp({EV_TIME} / 1000000000.0)::TIMESTAMPTZ)) * 1000
               AS lns, value
        FROM events
        WHERE {EV_TIME} >= {JAN1} AND {EV_TIME} < {MAR15}
          AND event_type = 'click'),
      agg AS (
        SELECT epoch_us(timezone('America/New_York',
                 make_timestamp((lns // {DAY}) * {DAY} // 1000))) * 1000
               AS time, count(value) AS n
        FROM a GROUP BY 1),
      lspine AS (
        SELECT unnest(generate_series({JAN1 - DAY},
                                      {MAR15 - JAN1 + JAN1 + DAY},
                                      {DAY})) AS lb),
      spine AS (
        SELECT DISTINCT epoch_us(timezone('America/New_York',
                 make_timestamp(lb // 1000))) * 1000 AS time
        FROM lspine
        WHERE epoch_us(timezone('America/New_York',
                 make_timestamp(lb // 1000))) * 1000 < {MAR15})
      SELECT s.time, coalesce(a.n, 0) AS n
      FROM spine s LEFT JOIN agg a USING (time)"""
    o["iq_tz_daily"] = f"""
      WITH a AS (
        SELECT epoch_us(timezone('America/New_York',
                 to_timestamp({EV_TIME} / 1000000000.0)::TIMESTAMPTZ)) * 1000
               AS lns, event_type, value
        FROM events),
      b AS (
        SELECT (lns // {DAY}) * {DAY} AS fl, event_type,
               count(value) AS n
        FROM a GROUP BY 1, 2)
      SELECT epoch_us(timezone('America/New_York',
               make_timestamp(fl // 1000))) * 1000 AS time,
             event_type, n
      FROM b"""
    o["iq_fill_null"] = f"""
      WITH spine AS (
        SELECT unnest(generate_series({JAN1}, {JAN1 + 7 * DAY - 1},
                                      {6 * HOUR})) AS time),
      a AS (
        SELECT ({EV_TIME} // {6 * HOUR}) * {6 * HOUR} AS time,
               sum(value) AS mv
        FROM events
        WHERE {EV_TIME} >= {JAN1} AND {EV_TIME} < {JAN1 + 7 * DAY}
          AND event_type = 'signup'
        GROUP BY 1)
      SELECT spine.time, {fr('a.mv', 4)} AS mv
      FROM spine LEFT JOIN a ON spine.time = a.time"""
    o["iq_kitchen_sink"] = f"""
      WITH a AS (
        SELECT ({EV_TIME} // {DAY}) * {DAY} AS time, event_type,
               sum(value) AS sv, count(value) AS n, max(value) AS mx
        FROM events
        WHERE {EV_TIME} >= {JAN1} AND {EV_TIME} < {FEB1}
          AND (event_type = 'click' OR regexp_matches(event_type, '^(si|vi)'))
        GROUP BY 1, 2),
      series AS (
        SELECT event_type,
               row_number() OVER (ORDER BY event_type) AS srank
        FROM (SELECT DISTINCT event_type FROM a)),
      spine AS (
        SELECT unnest(generate_series({JAN1}, {FEB1 - 1}, {DAY})) AS time),
      filled AS (
        SELECT spine.time, s.event_type,
               coalesce(a.sv, 0) AS sv, coalesce(a.n, 0) AS n,
               coalesce(a.mx, 0) AS mx
        FROM spine CROSS JOIN (SELECT event_type FROM series
                               WHERE srank > 1 AND srank <= 3) s
        LEFT JOIN a ON a.time = spine.time AND a.event_type = s.event_type)
      SELECT time, event_type, {fr('sv', 2)} AS sv, n, {fr('mx', 2)} AS mx
      FROM filled ORDER BY time DESC, event_type ASC LIMIT 40"""
    o["iq_subquery"] = f"""
      WITH a AS (
        SELECT ({EV_TIME} // {DAY}) * {DAY} AS time, event_type,
               count(value) AS c
        FROM events GROUP BY 1, 2)
      SELECT event_type, max(c) AS max_daily, min(c) AS min_daily
      FROM a GROUP BY 1"""
    o["iq_top_tag"] = f"""
      WITH per AS (
        SELECT {EV_TIME} AS time, event_type, value,
               row_number() OVER (PARTITION BY event_type
                 ORDER BY value DESC, {EV_TIME} ASC) AS rn
        FROM events)
      SELECT time, event_type, value AS top FROM per
      WHERE rn = 1 ORDER BY value DESC, time ASC LIMIT 3"""
    o["iq_stats"] = f"""
      SELECT event_type, {fr('stddev(value)', 4)} AS sd,
             {fr('median(value)', 4)} AS med,
             {fr('quantile_cont(value, 0.9)', 4)} AS p90
      FROM events GROUP BY 1"""
    o["iq_rate_1h"] = f"""
      WITH a AS (
        SELECT ({EV_TIME} // {HOUR}) * {HOUR} AS time, event_type,
               count(value) AS c
        FROM events GROUP BY 1, 2),
      d AS (
        SELECT time, event_type,
               (c - lag(c) OVER w)::DOUBLE
                 / (time - lag(time) OVER w) * {float(HOUR)} AS rate
        FROM a WINDOW w AS (PARTITION BY event_type ORDER BY time))
      SELECT time, event_type, {fr('rate', 4)} AS rate
      FROM d WHERE rate IS NOT NULL"""
    o["iq_cumsum_1d"] = f"""
      WITH a AS (
        SELECT ({EV_TIME} // {DAY}) * {DAY} AS time, event_type,
               count(value) AS c
        FROM events GROUP BY 1, 2)
      SELECT time, event_type,
             (sum(c) OVER (PARTITION BY event_type ORDER BY time))::BIGINT
               AS total
      FROM a"""
    o["iq_moving_count"] = f"""
      WITH a AS (
        SELECT ({EV_TIME} // {DAY}) * {DAY} AS time, event_type,
               count(value) AS c
        FROM events GROUP BY 1, 2),
      d AS (
        SELECT time, event_type,
               avg(c) OVER w AS mc, count(c) OVER w AS nw
        FROM a WINDOW w AS (PARTITION BY event_type ORDER BY time
                            ROWS BETWEEN 3 PRECEDING AND CURRENT ROW))
      SELECT time, event_type, {fr('mc', 4)} AS mc
      FROM d WHERE nw >= 4"""
    # multi-transform select: plain count + difference + moving_average in
    # one statement; rider rows keep nulls where a transform is undefined
    o["iq_multi_transform"] = f"""
      WITH a AS (
        SELECT ({EV_TIME} // {DAY}) * {DAY} AS time, event_type,
               count(value) AS n
        FROM events GROUP BY 1, 2),
      d AS (
        SELECT time, event_type, n,
               n - lag(n) OVER w AS diff,
               avg(n) OVER w2 AS ma, count(n) OVER w2 AS nw
        FROM a WINDOW w AS (PARTITION BY event_type ORDER BY time),
                    w2 AS (PARTITION BY event_type ORDER BY time
                           ROWS BETWEEN 3 PRECEDING AND CURRENT ROW))
      SELECT time, event_type, n, diff,
             CASE WHEN nw >= 4 THEN {fr('ma', 4)} END AS ma
      FROM d"""
    o["tr_non_negative"] = f"""
      WITH d AS (
        SELECT {EV_TIME} AS time, event_type,
               value - lag(value) OVER (PARTITION BY event_type
                                        ORDER BY {EV_TIME}) AS nn_difference
        FROM events)
      SELECT time, event_type, {fr('nn_difference', 4)} AS nn_difference
      FROM d WHERE nn_difference IS NOT NULL AND nn_difference >= 0"""
    o["rollup_revenue"] = f"""
      SELECT coalesce(l_returnflag, 'ALL') AS l_returnflag,
             coalesce(l_linestatus, 'ALL') AS l_linestatus,
             {dsum('l_extendedprice')} AS revenue, count(*) AS n
      FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)"""
    o["union_measurements"] = """
      SELECT DISTINCT event_type FROM (
        SELECT DISTINCT event_type FROM events
        UNION ALL
        SELECT DISTINCT event_type FROM events WHERE value > 100)"""

    # --- TPC-H Q3/Q5 join anchors (adapted to the test schema)
    o["tpch_q3"] = f"""
      SELECT l_orderkey,
             strftime(o_orderdate, '%Y-%m-%d') AS order_date,
             {dsum('l_extendedprice * (1 - l_discount)', 4)} AS revenue
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      WHERE c_mktsegment = 'BUILDING'
        AND o_orderdate < TIMESTAMP '1998-06-01'
        AND l_shipdate > TIMESTAMP '1998-06-01'
      GROUP BY l_orderkey, order_date
      ORDER BY revenue DESC, l_orderkey ASC
      LIMIT 10"""
    o["tpch_q5"] = f"""
      SELECT n_name,
             {dsum('l_extendedprice * (1 - l_discount)', 4)} AS revenue
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN supplier ON l_suppkey = s_suppkey
                   AND c_nationkey = s_nationkey
      JOIN nation ON s_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      WHERE r_name = 'ASIA'
        AND o_orderdate >= TIMESTAMP '1997-01-01'
        AND o_orderdate < TIMESTAMP '1998-01-01'
      GROUP BY n_name"""
    o["tpch_q6"] = f"""
      SELECT {dsum('l_extendedprice * l_discount', 4)} AS revenue,
             count(*)::BIGINT AS n_lines
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate < TIMESTAMP '1997-01-01'
        AND l_discount >= 0.05 AND l_discount <= 0.07
        AND l_quantity < 24"""
    o["tpch_q14"] = f"""
      WITH a AS (
        SELECT {dsum("CASE WHEN p_type LIKE 'PROMO%' THEN "
                     "l_extendedprice * (1 - l_discount) ELSE 0.0 END",
                     4)} AS promo_revenue,
               {dsum('l_extendedprice * (1 - l_discount)', 4)}
                 AS total_revenue
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE l_shipdate >= TIMESTAMP '1997-03-01'
          AND l_shipdate < TIMESTAMP '1997-04-01')
      SELECT promo_revenue, total_revenue,
             {fr('100.0 * promo_revenue / total_revenue', 6)} AS promo_pct
      FROM a"""
    o["tpch_q10"] = f"""
      SELECT c_custkey, c_name, c_acctbal, n_name,
             {dsum('l_extendedprice * (1 - l_discount)', 4)} AS revenue
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey
      WHERE l_returnflag = 'R'
        AND o_orderdate >= TIMESTAMP '1997-10-01'
        AND o_orderdate < TIMESTAMP '1998-01-01'
      GROUP BY 1, 2, 3, 4
      ORDER BY revenue DESC, c_custkey ASC
      LIMIT 20"""
    o["tpch_q18"] = f"""
      WITH big AS (
        SELECT l_orderkey, {dsum('l_quantity', 2)} AS total_qty
        FROM lineitem GROUP BY 1
        HAVING {dsum('l_quantity', 2)} > 250)
      SELECT c_name, c_custkey, o_orderkey,
             strftime(o_orderdate, '%Y-%m-%d') AS order_date,
             o_totalprice, total_qty
      FROM big
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      ORDER BY o_totalprice DESC, order_date ASC, o_orderkey ASC
      LIMIT 100"""
    o["tpch_q4"] = """
      SELECT o_orderpriority, count(*)::BIGINT AS n_orders
      FROM orders
      WHERE o_orderdate >= TIMESTAMP '1997-07-01'
        AND o_orderdate < TIMESTAMP '1997-10-01'
        AND EXISTS (SELECT 1 FROM lineitem
                    WHERE l_orderkey = o_orderkey
                      AND l_returnflag = 'R')
      GROUP BY 1"""
    o["tpch_q19"] = f"""
      SELECT {dsum('l_extendedprice * (1 - l_discount)', 4)} AS revenue,
             count(*)::BIGINT AS n_lines
      FROM lineitem JOIN part ON l_partkey = p_partkey
      WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
             AND l_quantity BETWEEN 1 AND 11)
         OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
             AND l_quantity BETWEEN 10 AND 20)
         OR (p_brand = 'Brand#15' AND p_size BETWEEN 1 AND 15
             AND l_quantity BETWEEN 20 AND 30)"""
    o["tpch_q16"] = """
      SELECT p_brand, p_type, p_size,
             count(DISTINCT l_suppkey)::BIGINT AS supplier_cnt
      FROM lineitem JOIN part ON l_partkey = p_partkey
      WHERE p_brand <> 'Brand#12' AND p_type NOT LIKE 'MEDIUM%'
        AND p_size IN (1, 4, 9, 14, 19, 24, 29, 34, 39, 49)
        AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier
                              WHERE s_acctbal < 0)
      GROUP BY 1, 2, 3"""
    o["tpch_q12"] = """
      SELECT l_returnflag,
             sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                      THEN 1 ELSE 0 END)::BIGINT AS high_line_count,
             sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                      THEN 0 ELSE 1 END)::BIGINT AS low_line_count
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        AND l_shipdate < TIMESTAMP '1998-01-01'
      GROUP BY 1"""
    # Q13: the orders filter must precede the LEFT join (predicate on
    # the null-producing side), zero-order customers kept as c_count=0
    o["tpch_q13"] = """
      WITH oo AS (SELECT o_custkey, o_orderkey FROM orders
                  WHERE o_orderpriority <> '1-URGENT'),
      per AS (SELECT c_custkey, count(o_orderkey)::BIGINT AS c_count
              FROM customer LEFT JOIN oo ON c_custkey = o_custkey
              GROUP BY 1)
      SELECT c_count, count(*)::BIGINT AS custdist
      FROM per GROUP BY 1"""
    # Q15: argmax by DECIMAL equality — ties all survive, fold-order-free
    o["tpch_q15"] = """
      WITH per AS (
        SELECT l_suppkey,
               sum((l_extendedprice * (1 - l_discount))::DECIMAL(28,4))
                 AS rev
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-07-01'
          AND l_shipdate < TIMESTAMP '1997-10-01'
        GROUP BY 1)
      SELECT s_suppkey, s_name, rev::DOUBLE AS total_revenue
      FROM per JOIN supplier ON l_suppkey = s_suppkey
      WHERE rev = (SELECT max(rev) FROM per)"""
    # Q17: decorrelated 0.2·avg screen, float-free as 5·n·q < Σq in DECIMAL
    o["tpch_q17"] = f"""
      WITH f AS (SELECT l_partkey, l_quantity, l_extendedprice
                 FROM lineitem JOIN part ON l_partkey = p_partkey
                 WHERE p_brand = 'Brand#23'),
      s AS (SELECT l_partkey, sum(l_quantity::DECIMAL(18,6)) AS qsum,
                   count(*)::BIGINT AS qn
            FROM f GROUP BY 1),
      agg AS (SELECT count(*)::BIGINT AS n_lines,
                     {dsum('l_extendedprice', 4)} AS total_price
              FROM f JOIN s USING (l_partkey)
              WHERE (5 * qn)::DECIMAL(12,0) * (l_quantity::DECIMAL(18,6))
                    < qsum)
      SELECT n_lines, total_price,
             {fr('total_price / 7.0', 6)} AS avg_yearly
      FROM agg"""
    # Q22: global-mean-positive-balance filter (float-free: bal·n > Σ in
    # DECIMAL) + NOT EXISTS anti-join, grouped by nation
    o["tpch_q22"] = f"""
      WITH thr AS (SELECT sum(c_acctbal::DECIMAL(18,6)) AS s,
                          count(*)::BIGINT AS n
                   FROM customer WHERE c_acctbal > 0.0),
      kept AS (SELECT c_custkey, c_nationkey, c_acctbal
               FROM customer, thr
               WHERE (c_acctbal::DECIMAL(18,6)) * n::DECIMAL(12,0) > s
                 AND NOT EXISTS (SELECT 1 FROM orders
                                 WHERE o_custkey = c_custkey
                                   AND o_orderdate
                                       >= TIMESTAMP '2000-01-01'))
      SELECT c_nationkey, count(*)::BIGINT AS numcust,
             {dsum('c_acctbal', 6)} AS totacctbal
      FROM kept GROUP BY 1"""
    # Q2: groupwise argmin by DECIMAL equality — all ties survive
    o["tpch_q2"] = """
      WITH cand AS (
        SELECT DISTINCT p_partkey, p_name, s_suppkey, s_name, s_acctbal,
               n_name, l_extendedprice::DECIMAL(18,2) AS cost
        FROM lineitem
        JOIN part ON l_partkey = p_partkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE r_name = 'EUROPE' AND p_size <= 15
          AND p_type = 'STANDARD'),
      mn AS (SELECT p_partkey, min(cost) AS mc FROM cand GROUP BY 1)
      SELECT s_acctbal, s_name, n_name, cand.p_partkey, p_name,
             mc::DOUBLE AS min_cost
      FROM cand JOIN mn ON cand.p_partkey = mn.p_partkey AND cost = mc
      ORDER BY s_acctbal DESC, n_name ASC, s_name ASC, cand.p_partkey ASC
      LIMIT 100"""
    o["tpch_q7"] = f"""
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             year(l_shipdate)::BIGINT AS l_year,
             {dsum('l_extendedprice * (1 - l_discount)', 4)} AS revenue
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation n1 ON s_nationkey = n1.n_nationkey
      JOIN nation n2 ON c_nationkey = n2.n_nationkey
      WHERE ((n1.n_name IN ('NATION_1', 'NATION_2')
              AND n2.n_name IN ('NATION_3', 'NATION_4'))
          OR (n1.n_name IN ('NATION_3', 'NATION_4')
              AND n2.n_name IN ('NATION_1', 'NATION_2')))
        AND l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate < TIMESTAMP '1998-01-01'
      GROUP BY 1, 2, 3"""
    o["tpch_q8"] = f"""
      WITH flows AS (
        SELECT year(o_orderdate)::BIGINT AS o_year,
               l_extendedprice * (1 - l_discount) AS vol,
               n1.n_name AS supp_nation
        FROM lineitem
        JOIN part ON l_partkey = p_partkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation n1 ON s_nationkey = n1.n_nationkey
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation n2 ON c_nationkey = n2.n_nationkey
        JOIN region ON n2.n_regionkey = r_regionkey
        WHERE r_name = 'AMERICA' AND p_type = 'ECONOMY'
          AND o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate < TIMESTAMP '1998-01-01'),
      a AS (
        SELECT o_year,
               {dsum("CASE WHEN supp_nation = 'NATION_3' THEN vol "
                     "ELSE 0.0 END", 4)} AS nation_volume,
               {dsum('vol', 4)} AS total_volume
        FROM flows GROUP BY 1)
      SELECT o_year, nation_volume, total_volume,
             {fr('nation_volume / total_volume', 6)} AS mkt_share
      FROM a"""
    o["tpch_q9"] = f"""
      SELECT n_name AS nation, year(o_orderdate)::BIGINT AS o_year,
             {dsum('l_extendedprice * (1 - l_discount) '
                   '- 0.1 * p_retailprice * l_quantity', 4)} AS profit
      FROM lineitem
      JOIN part ON l_partkey = p_partkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation ON s_nationkey = n_nationkey
      JOIN orders ON l_orderkey = o_orderkey
      WHERE p_name LIKE '%widget%'
      GROUP BY 1, 2"""
    # Q11: group-global scalar threshold, float-free in DECIMAL
    o["tpch_q11"] = """
      WITH v AS (
        SELECT l_partkey, sum(l_extendedprice::DECIMAL(28,2)) AS val
        FROM lineitem
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE r_name = 'ASIA' GROUP BY 1),
      t AS (SELECT sum(val) AS total FROM v)
      SELECT l_partkey AS p_partkey, val::DOUBLE AS part_value
      FROM v, t WHERE val * 1200 > total"""
    o["tpch_q20"] = """
      WITH sh AS (
        SELECT l_suppkey FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate < TIMESTAMP '1998-01-01'
          AND l_partkey IN (SELECT p_partkey FROM part
                            WHERE p_name LIKE '%bolt%')
        GROUP BY l_suppkey, l_partkey
        HAVING sum(l_quantity::DECIMAL(18,2)) > 30)
      SELECT s_name, s_acctbal, n_name
      FROM supplier
      JOIN nation ON s_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      WHERE r_name = 'AFRICA'
        AND s_suppkey IN (SELECT l_suppkey FROM sh)"""
    o["tpch_q21"] = """
      SELECT s_name, count(*)::BIGINT AS numwait
      FROM lineitem l1
      JOIN orders ON o_orderkey = l1.l_orderkey
      JOIN supplier ON s_suppkey = l1.l_suppkey
      JOIN nation ON s_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      WHERE l1.l_returnflag = 'R' AND o_orderstatus = 'F'
        AND r_name = 'EUROPE'
        AND EXISTS (SELECT 1 FROM lineitem l2
                    WHERE l2.l_orderkey = l1.l_orderkey
                      AND l2.l_suppkey <> l1.l_suppkey)
        AND NOT EXISTS (SELECT 1 FROM lineitem l3
                        WHERE l3.l_orderkey = l1.l_orderkey
                          AND l3.l_suppkey <> l1.l_suppkey
                          AND l3.l_returnflag = 'R')
      GROUP BY 1"""

    # --- perceptual image hashing (operators/multimodal.py): closed-
    # form mirror of the synthesized-PNG pixel formula (the mm_png_px
    # convention) — Spark actually inflates/unfilters the PNG bytes and
    # resamples, so a codec bug flips hash bits here
    _AHASH = f"""
      ad AS (SELECT doc_id, doc_id % 14 + 5 AS w, doc_id % 10 + 4 AS h
             FROM documents WHERE text IS NOT NULL),
      ag AS (SELECT sx.g AS x, sy.g AS y
             FROM generate_series(0, 7) sx(g), generate_series(0, 7) sy(g)),
      apx AS (SELECT ad.doc_id, ad.w, ad.h, ag.x, ag.y,
                     (((ag.x * ad.w) // 8) * 7 + ((ag.y * ad.h) // 8) * 13
                      + ad.doc_id) % 256 AS v
              FROM ad, ag),
      asum AS (SELECT doc_id, sum(v) AS t FROM apx GROUP BY 1),
      ahash AS (SELECT apx.doc_id,
                       max(apx.w)::BIGINT AS width,
                       max(apx.h)::BIGINT AS height,
                       sum(CASE WHEN apx.v * 64 > asum.t
                                     AND (apx.y * 8 + apx.x) >= 32
                                THEN 1::BIGINT << (apx.y * 8 + apx.x - 32)
                                ELSE 0 END)::BIGINT AS ahash_hi,
                       sum(CASE WHEN apx.v * 64 > asum.t
                                     AND (apx.y * 8 + apx.x) < 32
                                THEN 1::BIGINT << (apx.y * 8 + apx.x)
                                ELSE 0 END)::BIGINT AS ahash_lo,
                       sum((apx.v * 64 > asum.t)::INT)::BIGINT AS n_set
                FROM apx JOIN asum USING (doc_id)
                GROUP BY apx.doc_id)"""
    o["mm_ahash"] = f"""
      WITH {_AHASH}
      SELECT doc_id, width, height, ahash_hi, ahash_lo, n_set FROM ahash"""
    # r8: the oracle mirrors the banded CAPPED candidate generation —
    # four 16-bit bands, per-bucket membership ranked by doc_id and
    # sliced at max_bucket=200 (the deterministic smallest-ids choice
    # sort_array + slice makes on the Spark side), truncated = any
    # generating bucket over the cap. On a fixture with no hot bucket
    # this equals the pigeonhole-exact brute-force result (pytest pins
    # that equivalence + the hot-bucket quadratic guard); a missed
    # band bucket or wrong popcount still mismatches.
    o["mm_image_near_dup"] = f"""
      WITH {_AHASH},
      bands AS (
        SELECT doc_id, 0 AS bi, ahash_lo % 65536 AS bv FROM ahash
        UNION ALL SELECT doc_id, 1, ahash_lo // 65536 FROM ahash
        UNION ALL SELECT doc_id, 2, ahash_hi % 65536 FROM ahash
        UNION ALL SELECT doc_id, 3, ahash_hi // 65536 FROM ahash),
      rk AS (SELECT doc_id, bi, bv,
                    row_number() OVER (PARTITION BY bi, bv
                                       ORDER BY doc_id) AS rn,
                    count(*) OVER (PARTITION BY bi, bv) AS sz
             FROM bands),
      cand AS (SELECT x.doc_id AS id_a, y.doc_id AS id_b,
                      bool_or(x.sz > 200) AS truncated
               FROM rk x JOIN rk y ON x.bi = y.bi AND x.bv = y.bv
                                  AND x.doc_id < y.doc_id
               WHERE x.rn <= 200 AND y.rn <= 200
               GROUP BY 1, 2)
      SELECT c.id_a, c.id_b,
             (bit_count(xor(a.ahash_hi, b.ahash_hi))
              + bit_count(xor(a.ahash_lo, b.ahash_lo)))::BIGINT AS hamming,
             c.truncated
      FROM cand c JOIN ahash a ON a.doc_id = c.id_a
                  JOIN ahash b ON b.doc_id = c.id_b
      WHERE bit_count(xor(a.ahash_hi, b.ahash_hi))
            + bit_count(xor(a.ahash_lo, b.ahash_lo)) <= 3"""

    # --- runs test / peaks / autoperiod (operators/timeseries.py)
    _G_BUCKETS = f"""
      e AS (SELECT event_type, {EV_TIME} AS time, value FROM events),
      g AS (SELECT event_type, time - time % {HOUR} AS bucket,
                   {fr('sum(CAST(value AS DECIMAL(28,6)))::DOUBLE / count(*)', 6)}
                     AS v
            FROM e GROUP BY 1, 2)"""
    o["ts_runs_test"] = f"""
      WITH {_G_BUCKETS},
      med AS (SELECT event_type, median(v) AS m FROM g GROUP BY 1),
      s AS (SELECT g.event_type, bucket, g.v > med.m AS up
            FROM g JOIN med USING (event_type) WHERE g.v != med.m),
      mk AS (SELECT event_type, up,
                    CASE WHEN lag(up) OVER w IS NULL
                              OR up != lag(up) OVER w THEN 1 ELSE 0 END
                      AS nr
             FROM s WINDOW w AS (PARTITION BY event_type ORDER BY bucket)),
      a0 AS (SELECT event_type, sum(nr)::BIGINT AS runs,
                    sum(up::INT)::BIGINT AS n_above,
                    sum((NOT up)::INT)::BIGINT AS n_below
             FROM mk GROUP BY 1),
      a AS (SELECT med.event_type, coalesce(a0.runs, 0) AS runs,
                   coalesce(a0.n_above, 0) AS n_above,
                   coalesce(a0.n_below, 0) AS n_below
            FROM med LEFT JOIN a0 USING (event_type)),
      x AS (SELECT *, n_above + n_below AS n,
                   2.0 * n_above * n_below AS two
            FROM a),
      z AS (SELECT event_type, n_above, n_below, runs,
                   CASE WHEN n >= 2
                             AND (two * (two - n)) / (n * n * (n - 1)) > 0
                        THEN {fr('(runs - (1.0 + two / n)) / '
                                 'sqrt((two * (two - n)) / (n * n * (n - 1)))',
                                 6)}
                   END AS z
            FROM x)
      SELECT event_type, n_above, n_below, runs, z,
             CASE WHEN z IS NOT NULL THEN abs(z) > 1.96 END AS nonrandom
      FROM z"""

    o["ts_peaks"] = f"""
      WITH {_G_BUCKETS},
      m AS (SELECT event_type, bucket, v,
                   count(*) OVER wp AS np, max(v) OVER wp AS mp,
                   count(*) OVER wn AS nn, max(v) OVER wn AS mn
            FROM g
            WINDOW wp AS (PARTITION BY event_type ORDER BY bucket
                          ROWS BETWEEN 2 PRECEDING AND 1 PRECEDING),
                   wn AS (PARTITION BY event_type ORDER BY bucket
                          ROWS BETWEEN 1 FOLLOWING AND 2 FOLLOWING))
      SELECT event_type, bucket, v FROM m
      WHERE np = 2 AND nn = 2 AND v > mp AND v > mn"""

    # composes the ts_acf oracle VERBATIM so the period cannot drift
    # from the ACF definition it is derived from (the emb_recall /
    # doc_quality_sample composition convention)
    o["ts_autoperiod"] = f"""
      WITH acf_res AS ({o['ts_acf']}),
      rk AS (SELECT event_type, lag, acf,
                    row_number() OVER (PARTITION BY event_type
                                       ORDER BY acf DESC, lag ASC) AS rk
             FROM acf_res)
      SELECT event_type, lag AS period_lag, acf AS acf_peak,
             (lag * {HOUR})::BIGINT AS period_ns
      FROM rk WHERE rk = 1"""

    # --- PMI collocations (operators/text.py:pmi_collocations): all ln
    # args are exact integer counts; DuckDB's ln is libm = the Python
    # math.log the Spark side inlines, and the fold order mirrors the
    # operator's (ln c_xy + const) - ln c_x - ln c_y with
    # const = 2 ln T - ln B folded first
    o["text_collocations"] = f"""
      WITH t AS (SELECT {TOKS} AS tk FROM documents
                 WHERE text IS NOT NULL),
           u AS (SELECT unnest(tk) AS w FROM t),
           uc AS (SELECT w, count(*) AS c FROM u GROUP BY w),
           tt AS (SELECT sum(c)::BIGINT AS T FROM uc),
           b AS (SELECT unnest({duck_shingles('tk', 2)}) AS g FROM t),
           bc AS (SELECT g, count(*) AS n_pair FROM b GROUP BY g),
           bt AS (SELECT sum(n_pair)::BIGINT AS B FROM bc),
           sel AS (SELECT split_part(g, ' ', 1) AS w1,
                          split_part(g, ' ', 2) AS w2, n_pair
                   FROM bc WHERE n_pair >= 5)
      SELECT sel.w1, sel.w2, sel.n_pair,
             u1.c AS n_w1, u2.c AS n_w2,
             {fr('(ln(sel.n_pair) + (2 * ln((SELECT T FROM tt)) '
                 '- ln((SELECT B FROM bt)))) - ln(u1.c) - ln(u2.c)', 6)}
               AS pmi
      FROM sel JOIN uc u1 ON u1.w = sel.w1
               JOIN uc u2 ON u2.w = sel.w2"""

    # --- per-doc TF-IDF keywords (operators/text.py:tfidf_keywords):
    # ln over exact integer counts only (libm parity, the collocations
    # convention); rank over the rounded score
    o["text_keywords"] = f"""
      WITH t AS (SELECT doc_id, {TOKS} AS tk FROM documents
                 WHERE text IS NOT NULL),
           tf AS (SELECT doc_id, w AS token, count(*) AS tf
                  FROM (SELECT doc_id, unnest(tk) AS w FROM t)
                  GROUP BY 1, 2),
           dfc AS (SELECT token, count(*) AS df FROM tf GROUP BY 1),
           nn AS (SELECT count(*) AS n FROM t),
           scored AS (SELECT tf.doc_id, tf.token, tf.tf, dfc.df,
                             {fr('tf.tf * (ln((SELECT n FROM nn)) '
                                 '- ln(dfc.df))', 6)} AS tfidf
                      FROM tf JOIN dfc USING (token)),
           rk AS (SELECT *, row_number() OVER (
                      PARTITION BY doc_id
                      ORDER BY tfidf DESC, token ASC) AS rank
                  FROM scored)
      SELECT doc_id, token, tf, df, tfidf, rank::INT AS rank
      FROM rk WHERE rank <= 5"""

    # --- events analytics: attribution + RFM (operators/timeseries.py)
    o["ev_attribution"] = f"""
      WITH t AS (SELECT user_id, {EV_TIME} AS t, event_type AS ch,
                        value AS v,
                        CASE WHEN event_type = 'purchase' THEN 1
                             ELSE 0 END AS k,
                        event_id AS id
                 FROM events WHERE ts IS NOT NULL),
           c AS (SELECT *,
                        last_value(CASE WHEN k = 0 THEN t END IGNORE NULLS)
                          OVER w AS tt,
                        last_value(CASE WHEN k = 0 THEN ch END IGNORE NULLS)
                          OVER w AS tch
                 FROM t
                 WINDOW w AS (PARTITION BY user_id ORDER BY t, k, id
                              ROWS UNBOUNDED PRECEDING))
      SELECT CASE WHEN tt IS NOT NULL AND t - tt <= {7 * DAY}
                  THEN tch ELSE '(none)' END AS channel,
             count(*) AS conversions,
             (sum(v::DECIMAL(28,6)))::DOUBLE AS revenue
      FROM c WHERE k = 1 GROUP BY 1"""

    o["ev_rfm"] = f"""
      WITH conv AS (SELECT user_id, {EV_TIME} AS t, value FROM events
                    WHERE event_type = 'purchase' AND ts IS NOT NULL),
           ent AS (SELECT user_id,
                          ({NOW_NS} - max(t)) // 1000000000 AS rec,
                          count(*) AS freq,
                          sum((floor(value * 100 + 0.5))::BIGINT) AS cents
                   FROM conv GROUP BY 1),
           qs AS (SELECT quantile_cont(rec, [0.25, 0.5, 0.75]) AS qr,
                         quantile_cont(freq, [0.25, 0.5, 0.75]) AS qf,
                         quantile_cont(cents, [0.25, 0.5, 0.75]) AS qm
                  FROM ent),
           sc AS (SELECT 5 - (1 + (rec > qr[1])::INT + (rec > qr[2])::INT
                              + (rec > qr[3])::INT) AS r_score,
                         1 + (freq > qf[1])::INT + (freq > qf[2])::INT
                           + (freq > qf[3])::INT AS f_score,
                         1 + (cents > qm[1])::INT + (cents > qm[2])::INT
                           + (cents > qm[3])::INT AS m_score,
                         cents
                  FROM ent, qs)
      SELECT r_score, f_score, m_score,
             count(*) AS n_entities,
             sum(cents) / 100.0 AS revenue
      FROM sc GROUP BY 1, 2, 3"""

    # --- graph family (operators/graph.py): co-order part graph.
    # Everything integer-exact; the iterative ops unroll their fixed
    # round counts as chained CTEs (the holt_winters unroll precedent).
    _G_EDGES = """
      gi AS (SELECT DISTINCT l_orderkey AS g, l_partkey AS i
             FROM lineitem
             WHERE l_orderkey IS NOT NULL AND l_partkey IS NOT NULL),
      gok AS (SELECT g FROM gi GROUP BY g
              HAVING count(*) BETWEEN 2 AND 64),
      e AS (SELECT DISTINCT a.i AS src, b.i AS dst
            FROM gi a JOIN gok ON a.g = gok.g
                      JOIN gi b ON b.g = a.g
            WHERE a.i < b.i),
      sym AS (SELECT src, dst FROM e
              UNION ALL SELECT dst, src FROM e),
      gnodes AS (SELECT DISTINCT src AS node FROM sym)"""

    o["graph_triangles"] = f"""
      WITH {_G_EDGES},
      deg AS (SELECT src AS node, count(*) AS degree FROM sym GROUP BY 1),
      ori AS (SELECT s.src, s.dst, dd.degree AS dd
              FROM sym s
              JOIN deg ds ON ds.node = s.src
              JOIN deg dd ON dd.node = s.dst
              WHERE ds.degree < dd.degree
                 OR (ds.degree = dd.degree AND s.src < s.dst)),
      wed AS (SELECT e1.src AS u, e1.dst AS v, e2.dst AS w
              FROM ori e1 JOIN ori e2 ON e1.src = e2.src
              WHERE e1.dd < e2.dd
                 OR (e1.dd = e2.dd AND e1.dst < e2.dst)),
      tri AS (SELECT u, v, w FROM wed
              JOIN ori ON ori.src = wed.v AND ori.dst = wed.w),
      corners AS (SELECT node, count(*) AS triangles FROM (
                    SELECT u AS node FROM tri
                    UNION ALL SELECT v FROM tri
                    UNION ALL SELECT w FROM tri)
                  GROUP BY 1)
      SELECT d.node, d.degree,
             coalesce(c.triangles, 0) AS triangles,
             CASE WHEN d.degree < 2 THEN 0.0
                  ELSE {fr('2.0 * coalesce(c.triangles, 0)'
                           ' / (d.degree * (d.degree - 1))', 6)}
             END AS clustering
      FROM deg d LEFT JOIN corners c ON c.node = d.node"""

    # fixed-point PageRank: same floor-integer recurrence as the Spark
    # loop, 10 iterations unrolled; sums are HUGEINT in DuckDB so the
    # 85*s product can't overflow before the ::BIGINT at the end
    _PR_ITERS, _PR_SCALE, _PR_D = 10, 10 ** 12, 85
    pr_ctes = [f"""
      outd AS (SELECT src AS node, count(*) AS outdeg FROM sym GROUP BY 1),
      gb AS (SELECT ({100 - _PR_D} * {_PR_SCALE}::HUGEINT)
                    // (100 * count(*)) AS b,
                    {_PR_SCALE}::HUGEINT // count(*) AS p0
             FROM gnodes),
      p0 AS (SELECT node, (SELECT p0 FROM gb) AS pr FROM gnodes)"""]
    for it in range(1, _PR_ITERS + 1):
        pr_ctes.append(f"""
      p{it} AS (SELECT nd.node,
                       ((SELECT b FROM gb)
                        + ({_PR_D} * coalesce(s.s, 0)) // 100) AS pr
                FROM gnodes nd LEFT JOIN (
                  SELECT sym.dst AS node, sum(p.pr // o.outdeg) AS s
                  FROM sym
                  JOIN p{it - 1} p ON p.node = sym.src
                  JOIN outd o ON o.node = sym.src
                  GROUP BY sym.dst) s ON s.node = nd.node)""")
    o["graph_pagerank"] = (
        "WITH " + _G_EDGES + "," + ",".join(pr_ctes)
        + f"\n      SELECT node, pr::BIGINT AS pr_fp FROM p{_PR_ITERS}")

    # personalized PageRank: same floor-integer recurrence, teleport
    # conditional on seed membership (seeds restricted to graph nodes)
    ppr_ctes = [f"""
      outd AS (SELECT src AS node, count(*) AS outdeg FROM sym GROUP BY 1),
      sd AS (SELECT DISTINCT p_partkey AS node FROM part
             WHERE p_partkey % 97 = 0
               AND p_partkey IN (SELECT node FROM gnodes)),
      sb AS (SELECT ({100 - _PR_D} * {_PR_SCALE}::HUGEINT)
                    // (100 * count(*)) AS b,
                    {_PR_SCALE}::HUGEINT // count(*) AS p0
             FROM sd),
      q0 AS (SELECT gn.node,
                    CASE WHEN sd.node IS NOT NULL
                         THEN (SELECT p0 FROM sb) ELSE 0 END AS pr
             FROM gnodes gn LEFT JOIN sd ON sd.node = gn.node)"""]
    for it in range(1, _PR_ITERS + 1):
        ppr_ctes.append(f"""
      q{it} AS (SELECT nd.node,
                       (CASE WHEN sd.node IS NOT NULL
                             THEN (SELECT b FROM sb) ELSE 0 END
                        + ({_PR_D} * coalesce(s.s, 0)) // 100) AS pr
                FROM gnodes nd
                LEFT JOIN sd ON sd.node = nd.node
                LEFT JOIN (
                  SELECT sym.dst AS node, sum(p.pr // o.outdeg) AS s
                  FROM sym
                  JOIN q{it - 1} p ON p.node = sym.src
                  JOIN outd o ON o.node = sym.src
                  GROUP BY sym.dst) s ON s.node = nd.node)""")
    o["graph_ppr"] = (
        "WITH " + _G_EDGES + "," + ",".join(ppr_ctes)
        + f"\n      SELECT node, pr::BIGINT AS ppr_fp FROM q{_PR_ITERS}")

    # HITS on the directed user->event_type graph: integer mutual
    # reinforcement, L-inf renorm by floor division per round (HUGEINT
    # mirrors Spark's DECIMAL(38,0) renorm product); every stage
    # MATERIALIZED and maxima hoisted to 1-row CTEs so DuckDB opens
    # the parquet once, not once per scalar subquery
    _HITS_ITERS = 8
    hits_ctes = [f"""
      de AS MATERIALIZED (
             SELECT DISTINCT 'u:' || user_id::VARCHAR AS src,
                             'e:' || event_type AS dst
             FROM events
             WHERE user_id IS NOT NULL AND event_type IS NOT NULL),
      dn AS MATERIALIZED (SELECT src AS node FROM de
             UNION SELECT dst FROM de),
      hh0 AS MATERIALIZED (
             SELECT node, {_PR_SCALE}::HUGEINT AS v FROM dn)"""]
    for it in range(1, _HITS_ITERS + 1):
        hits_ctes.append(f"""
      ar{it} AS MATERIALIZED (
                 SELECT n.node, coalesce(s.s, 0)::HUGEINT AS v
                 FROM dn n LEFT JOIN (
                   SELECT de.dst AS node, sum(h.v) AS s
                   FROM de JOIN hh{it - 1} h ON h.node = de.src
                   GROUP BY de.dst) s ON s.node = n.node),
      am{it} AS MATERIALIZED (SELECT max(v) AS mx FROM ar{it}),
      aa{it} AS MATERIALIZED (
                 SELECT node,
                        CASE WHEN (SELECT mx FROM am{it}) > 0
                             THEN (v * {_PR_SCALE})
                                  // (SELECT mx FROM am{it})
                             ELSE 0 END AS v
                 FROM ar{it}),
      hr{it} AS MATERIALIZED (
                 SELECT n.node, coalesce(s.s, 0)::HUGEINT AS v
                 FROM dn n LEFT JOIN (
                   SELECT de.src AS node, sum(a.v) AS s
                   FROM de JOIN aa{it} a ON a.node = de.dst
                   GROUP BY de.src) s ON s.node = n.node),
      hm{it} AS MATERIALIZED (SELECT max(v) AS mx FROM hr{it}),
      hh{it} AS MATERIALIZED (
                 SELECT node,
                        CASE WHEN (SELECT mx FROM hm{it}) > 0
                             THEN (v * {_PR_SCALE})
                                  // (SELECT mx FROM hm{it})
                             ELSE 0 END AS v
                 FROM hr{it})""")
    o["graph_hits"] = (
        "WITH " + ",".join(hits_ctes)
        + f"""
      SELECT h.node, h.v::BIGINT AS hub_fp, a.v::BIGINT AS auth_fp
      FROM hh{_HITS_ITERS} h JOIN aa{_HITS_ITERS} a
        ON a.node = h.node""")

    o["graph_link_predict"] = f"""
      WITH {_G_EDGES},
      deg AS (SELECT src AS node, count(*) AS degree FROM sym GROUP BY 1),
      centers AS (SELECT node FROM deg WHERE degree <= 256),
      via AS (SELECT sym.src, sym.dst FROM sym
              JOIN centers ON centers.node = sym.src),
      pairs AS (SELECT a.dst AS u, b.dst AS v, count(*) AS common
                FROM via a JOIN via b ON a.src = b.src AND a.dst < b.dst
                GROUP BY 1, 2 HAVING count(*) >= 2),
      nonadj AS (SELECT p.* FROM pairs p
                 LEFT JOIN e ON e.src = p.u AND e.dst = p.v
                 WHERE e.src IS NULL),
      scored AS (SELECT u, v, common,
                        {fr('common / (du.degree + dv.degree '
                            '- common)::DOUBLE', 6)} AS jaccard
                 FROM nonadj
                 JOIN deg du ON du.node = nonadj.u
                 JOIN deg dv ON dv.node = nonadj.v),
      lp_both AS (SELECT u AS node, v AS candidate, common, jaccard
               FROM scored
               UNION ALL
               SELECT v AS node, u AS candidate, common, jaccard
               FROM scored),
      rk AS (SELECT *, row_number() OVER (
                 PARTITION BY node
                 ORDER BY jaccard DESC, common DESC, candidate ASC) AS rank
             FROM lp_both)
      SELECT node, candidate, common, jaccard, rank::INT AS rank
      FROM rk WHERE rank <= 3"""
    # Power-of-two degree histogram: bucket = binary digit count - 1
    # (bin() in both engines), exact shifts for the range bounds
    o["graph_degree_hist"] = f"""
      WITH {_G_EDGES},
      deg AS (SELECT src AS node, count(*) AS degree FROM sym GROUP BY 1),
      h AS (SELECT (length(bin(degree)) - 1)::BIGINT AS bucket,
                   count(*)::BIGINT AS n_nodes,
                   max(degree)::BIGINT AS max_degree
            FROM deg GROUP BY 1)
      SELECT bucket, (1::BIGINT << bucket::INT) AS lo,
             ((1::BIGINT << (bucket::INT + 1)) - 1) AS hi,
             n_nodes, max_degree
      FROM h"""

    # Bounded-round k-core peeling: unroll the same 8 simultaneous
    # rounds the Spark driver loop runs (the components convention)
    # each e{it} is referenced three times by round it+1 (degree agg +
    # both semi-join sides) — without MATERIALIZED DuckDB inlines and
    # recomputes the whole prefix per reference, 3^rounds scans of
    # lineitem ("Too many open files"); the doc_dedup_clusters
    # precedent
    _KC_K, _KC_ROUNDS = 80, 8
    kc_ctes = ["e0 AS MATERIALIZED (SELECT src, dst FROM sym)"]
    for it in range(1, _KC_ROUNDS + 1):
        kc_ctes.append(f"""
      d{it} AS (SELECT src AS node, count(*) AS d FROM e{it - 1}
                GROUP BY 1),
      k{it} AS MATERIALIZED (SELECT node FROM d{it} WHERE d >= {_KC_K}),
      e{it} AS MATERIALIZED (SELECT e.src, e.dst FROM e{it - 1} e
                JOIN k{it} a ON a.node = e.src
                JOIN k{it} b ON b.node = e.dst)""")
    o["graph_kcore"] = (
        "WITH " + _G_EDGES + "," + ",".join(kc_ctes) + f"""
      SELECT src AS node, count(*)::BIGINT AS core_degree
      FROM e{_KC_ROUNDS} GROUP BY 1 HAVING count(*) >= {_KC_K}""")

    # Bounded-round synchronous LPA: unroll the same 4 simultaneous
    # vote rounds (closed neighborhood, most-frequent label, smallest-
    # label tie-break) the Spark driver loop runs
    _LP_ROUNDS = 4
    lp_ctes = ["""
      adjl AS MATERIALIZED (SELECT src, dst FROM sym
              UNION ALL SELECT node, node FROM gnodes),
      lp0 AS (SELECT node, node AS community FROM gnodes)"""]
    for it in range(1, _LP_ROUNDS + 1):
        lp_ctes.append(f"""
      v{it} AS (SELECT adjl.dst AS node, l.community, count(*) AS c
                FROM adjl JOIN lp{it - 1} l ON l.node = adjl.src
                GROUP BY 1, 2),
      lp{it} AS MATERIALIZED (SELECT node, community FROM (
                SELECT node, community, row_number() OVER (
                  PARTITION BY node ORDER BY c DESC, community ASC) AS r
                FROM v{it}) WHERE r = 1)""")
    o["graph_label_prop"] = (
        "WITH " + _G_EDGES + "," + ",".join(lp_ctes) + f""",
      lpsizes AS (SELECT community, count(*) AS community_size
                  FROM lp{_LP_ROUNDS} GROUP BY 1)
      SELECT l.node, l.community, lpsizes.community_size
      FROM lp{_LP_ROUNDS} l
      JOIN lpsizes ON lpsizes.community = l.community""")

    # Modularity of the LPA partition: exact BIGINT numerator
    # 4*m*e_c - d_c^2 over (2m)^2, one floor-round-6 division;
    # zero-intra communities kept via left join
    o["graph_modularity"] = (
        "WITH " + _G_EDGES + "," + ",".join(lp_ctes) + f""",
      mm AS (SELECT count(*)::BIGINT AS m FROM e),
      intra AS (SELECT ls.community, count(*)::BIGINT AS e_intra
                FROM e
                JOIN lp{_LP_ROUNDS} ls ON ls.node = e.src
                JOIN lp{_LP_ROUNDS} ld ON ld.node = e.dst
                WHERE ls.community = ld.community GROUP BY 1),
      mdeg AS (SELECT src AS node, count(*)::BIGINT AS degree
               FROM sym GROUP BY 1),
      dc AS (SELECT l.community, count(*)::BIGINT AS n_nodes,
                    sum(mdeg.degree)::BIGINT AS d_total
             FROM mdeg JOIN lp{_LP_ROUNDS} l ON l.node = mdeg.node
             GROUP BY 1)
      SELECT dc.community, dc.n_nodes,
             COALESCE(intra.e_intra, 0)::BIGINT AS e_intra, dc.d_total,
             floor((4 * mm.m * COALESCE(intra.e_intra, 0)
                    - dc.d_total * dc.d_total)::DOUBLE
                   / ((2 * mm.m) * (2 * mm.m))::DOUBLE
                   * 1000000.0 + 0.5) / 1000000.0 AS q_contrib
      FROM dc LEFT JOIN intra ON intra.community = dc.community, mm""")

    # Degree assortativity (Newman 2002): HUGEINT-exact moments over the
    # directed symmetric edge list, one double division + two IEEE sqrts
    # at the end; degenerate denominators -> NULL (mirror of
    # operators/graph.py:degree_assortativity)
    _asst_r = ("(m_directed::HUGEINT * sxy - sx * sy)::DOUBLE"
               " / (sqrt((m_directed::HUGEINT * sxx - sx * sx)::DOUBLE)"
               " * sqrt((m_directed::HUGEINT * syy - sy * sy)::DOUBLE))")
    o["graph_assortativity"] = (
        "WITH " + _G_EDGES + f""",
      adeg AS (SELECT src AS node, count(*)::BIGINT AS dg
               FROM sym GROUP BY 1),
      ee AS (SELECT dx.dg AS x, dy.dg AS y
             FROM sym JOIN adeg dx ON dx.node = sym.src
                      JOIN adeg dy ON dy.node = sym.dst),
      mom AS (SELECT count(*)::BIGINT AS m_directed,
                     sum(x::HUGEINT) AS sx, sum(y::HUGEINT) AS sy,
                     sum(x::HUGEINT * y) AS sxy,
                     sum(x::HUGEINT * x) AS sxx,
                     sum(y::HUGEINT * y) AS syy
              FROM ee)
      SELECT m_directed,
             CASE WHEN (m_directed::HUGEINT * sxx - sx * sx) > 0
                   AND (m_directed::HUGEINT * syy - sy * sy) > 0
                  THEN {fr(_asst_r, 6)}
             END AS r
      FROM mom""")

    _CC_ROUNDS = 8
    cc_ctes = ["""
      adj AS (SELECT src, dst FROM sym
              UNION ALL SELECT node, node FROM gnodes),
      l0 AS (SELECT node, node AS component FROM gnodes)"""]
    for it in range(1, _CC_ROUNDS + 1):
        cc_ctes.append(f"""
      l{it} AS (SELECT adj.dst AS node, min(l.component) AS component
                FROM adj JOIN l{it - 1} l ON l.node = adj.src
                GROUP BY adj.dst)""")
    o["graph_components"] = (
        "WITH " + _G_EDGES + "," + ",".join(cc_ctes) + f""",
      csizes AS (SELECT component, count(*) AS component_size
                 FROM l{_CC_ROUNDS} GROUP BY 1)
      SELECT l.node, l.component, csizes.component_size
      FROM l{_CC_ROUNDS} l JOIN csizes ON csizes.component = l.component""")

    # Multi-source bounded BFS: unroll the same 4 frontier rounds
    # (expand prev frontier, anti-join the reached set) the Spark driver
    # loop runs; pure set algebra, integer distances. MATERIALIZED on
    # the twice-referenced reached/frontier sets (the kcore convention).
    _BFS_ROUNDS = 4
    bfs_ctes = ["""
      r0 AS (SELECT DISTINCT p_partkey AS node, 0 AS dist FROM part
             WHERE p_partkey % 97 = 0)"""]
    for it in range(1, _BFS_ROUNDS + 1):
        prev_f = "r0" if it == 1 else f"f{it - 1}"
        bfs_ctes.append(f"""
      n{it} AS (SELECT DISTINCT sym.dst AS node
                FROM sym JOIN {prev_f} f ON sym.src = f.node),
      f{it} AS MATERIALIZED (SELECT n{it}.node FROM n{it}
                LEFT JOIN r{it - 1} r ON r.node = n{it}.node
                WHERE r.node IS NULL),
      r{it} AS MATERIALIZED (SELECT node, dist FROM r{it - 1}
                UNION ALL SELECT node, {it} AS dist FROM f{it})""")
    o["graph_bfs"] = ("WITH " + _G_EDGES + "," + ",".join(bfs_ctes) +
                      f"\n      SELECT node, dist FROM r{_BFS_ROUNDS}")

    # Weighted multi-source shortest paths: unroll the same 6 frontier
    # Bellman-Ford rounds (relax last round's improved set, integer-min
    # merge, improvement anti-filter) the Spark driver loop runs; edge
    # cost = greatest(1, 6 - co-order count), min-plus over BIGINTs.
    # MATERIALIZED on the twice-referenced dist/frontier sets.
    _SSSP_ROUNDS = 6
    sssp_ctes = ["""
      we AS (SELECT a.i AS src, b.i AS dst, count(*) AS n_co
             FROM gi a JOIN gok ON a.g = gok.g
                       JOIN gi b ON b.g = a.g
             WHERE a.i < b.i GROUP BY 1, 2),
      wsym AS (SELECT src, dst, GREATEST(1, 6 - n_co)::BIGINT AS cost
               FROM we
               UNION ALL
               SELECT dst, src, GREATEST(1, 6 - n_co)::BIGINT FROM we),
      d0 AS (SELECT DISTINCT p_partkey AS node, 0::BIGINT AS dist
             FROM part WHERE p_partkey % 97 = 0),
      i0 AS (SELECT node, dist FROM d0)"""]
    for it in range(1, _SSSP_ROUNDS + 1):
        sssp_ctes.append(f"""
      c{it} AS (SELECT w.dst AS node, min(f.dist + w.cost) AS dist
                FROM wsym w JOIN i{it - 1} f ON w.src = f.node
                GROUP BY w.dst),
      d{it} AS MATERIALIZED (
                SELECT node, min(dist) AS dist FROM (
                  SELECT node, dist FROM d{it - 1}
                  UNION ALL SELECT node, dist FROM c{it})
                GROUP BY node),
      i{it} AS MATERIALIZED (
                SELECT d.node, d.dist FROM d{it} d
                LEFT JOIN d{it - 1} p ON p.node = d.node
                WHERE p.node IS NULL OR d.dist < p.dist)""")
    o["graph_sssp"] = ("WITH " + _G_EDGES + "," + ",".join(sssp_ctes) +
                       f"\n      SELECT node, dist FROM d{_SSSP_ROUNDS}")

    # Sampled-source closeness: the bfs unroll with (node, seed) as the
    # reached key — per-seed distances fused in one pass, fold =
    # n_seeds / sum(dist) over dist >= 1, floor-round-6
    _CL_ROUNDS = 4
    cl_ctes = ["""
      c0 AS (SELECT DISTINCT p_partkey AS node, p_partkey AS seed,
                    0 AS dist
             FROM part WHERE p_partkey % 97 = 0)"""]
    for it in range(1, _CL_ROUNDS + 1):
        prev_f = "c0" if it == 1 else f"cf{it - 1}"
        cl_ctes.append(f"""
      cn{it} AS (SELECT DISTINCT sym.dst AS node, f.seed
                 FROM sym JOIN {prev_f} f ON sym.src = f.node),
      cf{it} AS MATERIALIZED (SELECT n.node, n.seed FROM cn{it} n
                 LEFT JOIN c{it - 1} r
                   ON r.node = n.node AND r.seed = n.seed
                 WHERE r.node IS NULL),
      c{it} AS MATERIALIZED (SELECT node, seed, dist FROM c{it - 1}
                 UNION ALL SELECT node, seed, {it} AS dist FROM cf{it})""")
    o["graph_closeness"] = (
        "WITH " + _G_EDGES + "," + ",".join(cl_ctes) + f"""
      SELECT node, count(*)::BIGINT AS n_seeds,
             sum(dist)::BIGINT AS sum_dist,
             floor(count(*)::DOUBLE / sum(dist)::BIGINT::DOUBLE
                   * 1000000.0 + 0.5) / 1000000.0 AS closeness
      FROM c{_CL_ROUNDS} WHERE dist >= 1 GROUP BY node""")

    # Harmonic centrality: the SAME unrolled k-seed BFS distances,
    # folded as the exact integer sum of lcm(1..rounds)//dist with one
    # final division (dist <= rounds, so every term divides the lcm)
    import math as _math
    _CL_LCM = _math.lcm(*range(1, _CL_ROUNDS + 1))
    o["graph_harmonic"] = (
        "WITH " + _G_EDGES + "," + ",".join(cl_ctes) + f"""
      SELECT node, count(*)::BIGINT AS n_seeds,
             sum({_CL_LCM} // dist)::BIGINT AS h_fp,
             floor(sum({_CL_LCM} // dist)::BIGINT::DOUBLE
                   / {float(_CL_LCM)!r}
                   * 1000000.0 + 0.5) / 1000000.0 AS harmonic
      FROM c{_CL_ROUNDS} WHERE dist >= 1 GROUP BY node""")

    # --- sketch family (operators/sketch.py): deterministic mergeable
    # sketches — same md5 hash64, integer state, pinned float points;
    # every output column explicitly ::BIGINT (the ts_pettitt HUGEINT
    # lesson — DuckDB sum/window-sum widen to HUGEINT).
    from influxdb_ha_spark.operators.sketch import (
        HASH_SPACE, HLL_M, HLL_NUMER)
    _KMV_K = 256
    _h64v = duck_hash64("v::VARCHAR")
    o["sk_kmv"] = f"""
      WITH v AS (SELECT DISTINCT l_returnflag AS g, l_orderkey AS v
                 FROM lineitem WHERE l_orderkey IS NOT NULL),
      hh AS (SELECT g, v, {_h64v} AS h FROM v),
      rk AS (SELECT g, v, h, row_number() OVER (
                 PARTITION BY g ORDER BY h ASC, v ASC) AS rn FROM hh),
      a AS (SELECT g, count(*)::BIGINT AS k_used,
                   max(h)::BIGINT AS kth_hash
            FROM rk WHERE rn <= {_KMV_K} GROUP BY 1)
      SELECT g AS l_returnflag, k_used, kth_hash,
             {fr(f'CASE WHEN k_used < {_KMV_K} THEN k_used::DOUBLE '
                 f'ELSE {float(_KMV_K - 1)!r} * {float(HASH_SPACE)!r} '
                 f'/ kth_hash::DOUBLE END', 6)} AS est_distinct
      FROM a"""

    # Per-doc shingle novelty: distinct shingle hashes per doc, global
    # min-doc_id ownership, one rounded division; <3-token docs -> NULL
    o["doc_novelty"] = f"""
      WITH base AS (SELECT doc_id, text FROM documents
                    WHERE text IS NOT NULL),
      shn AS (SELECT doc_id,
                    CASE WHEN len({TOKS}) < 3 THEN []::VARCHAR[]
                         ELSE [array_to_string(({TOKS})[i:i+2], ' ')
                               FOR i IN generate_series(1,
                                                        len({TOKS}) - 2)]
                    END AS sh
             FROM base),
      hh AS (SELECT doc_id, list_distinct(list_transform(sh,
                    s -> {duck_hash64('s')} % {MERSENNE_P})) AS hd
             FROM shn),
      pr AS (SELECT doc_id, unnest(hd) AS h FROM hh),
      own AS (SELECT h, min(doc_id) AS fid FROM pr GROUP BY 1),
      nov AS (SELECT fid AS doc_id, count(*)::BIGINT AS n_novel
              FROM own GROUP BY 1),
      cnt AS (SELECT doc_id, count(*)::BIGINT AS n_shingles
              FROM pr GROUP BY 1)
      SELECT b.doc_id,
             coalesce(cnt.n_shingles, 0)::BIGINT AS n_shingles,
             coalesce(nov.n_novel, 0)::BIGINT AS n_novel,
             CASE WHEN coalesce(cnt.n_shingles, 0) > 0 THEN
               {fr('coalesce(nov.n_novel, 0)::DOUBLE'
                   ' / cnt.n_shingles::DOUBLE', 6)} END AS novelty
      FROM base b LEFT JOIN cnt ON cnt.doc_id = b.doc_id
                  LEFT JOIN nov ON nov.doc_id = b.doc_id"""

    _M60 = f"{float(HASH_SPACE)!r}"
    o["sk_kmv_setops"] = f"""
      WITH v AS (SELECT DISTINCT l_returnflag AS g, l_orderkey AS v
                 FROM lineitem WHERE l_orderkey IS NOT NULL
                   AND l_returnflag IN ('A', 'R')),
      hh AS (SELECT g, v, {_h64v} AS h FROM v),
      rk AS (SELECT g, h, row_number() OVER (
                 PARTITION BY g ORDER BY h ASC, v ASC) AS rn FROM hh),
      sk AS (SELECT g, h FROM rk WHERE rn <= {_KMV_K}),
      th AS (SELECT min(CASE WHEN ku < {_KMV_K} THEN {HASH_SPACE}
                             ELSE t END)::BIGINT AS theta FROM
             (SELECT g, max(h) AS t, count(*) AS ku FROM sk GROUP BY 1)),
      sa AS (SELECT h FROM sk, th WHERE g = 'A' AND h <= theta),
      sb AS (SELECT h FROM sk, th WHERE g = 'R' AND h <= theta),
      cnt AS (SELECT (SELECT theta FROM th) AS theta,
                     (SELECT count(*) FROM sa)::BIGINT AS n_a,
                     (SELECT count(*) FROM sb)::BIGINT AS n_b,
                     (SELECT count(*) FROM sa JOIN sb USING (h))::BIGINT
                       AS n_common)
      SELECT theta, n_a, n_b, n_common,
             {fr(f'(n_a + n_b - n_common)::DOUBLE * {_M60} '
                 '/ theta::DOUBLE', 6)} AS est_union,
             {fr(f'n_common::DOUBLE * {_M60} / theta::DOUBLE', 6)}
               AS est_intersection,
             CASE WHEN (n_a + n_b - n_common) > 0 THEN
               {fr('n_common::DOUBLE / (n_a + n_b - n_common)::DOUBLE',
                   6)} END AS jaccard_est
      FROM cnt"""

    # K-way theta union fold: per-group sketches over ALL returnflags,
    # theta = min of exhaustive-aware per-group thetas, distinct union
    # of sketch hashes <= theta, one pinned multiply+divide
    o["sk_kmv_union_k"] = f"""
      WITH v AS (SELECT DISTINCT l_returnflag AS g, l_orderkey AS v
                 FROM lineitem WHERE l_orderkey IS NOT NULL
                   AND l_returnflag IS NOT NULL),
      hh AS (SELECT g, v, {_h64v} AS h FROM v),
      rk AS (SELECT g, h, row_number() OVER (
                 PARTITION BY g ORDER BY h ASC, v ASC) AS rn FROM hh),
      sk AS (SELECT g, h FROM rk WHERE rn <= {_KMV_K}),
      st AS (SELECT count(*)::BIGINT AS n_groups,
                    coalesce(min(CASE WHEN ku < {_KMV_K}
                                      THEN {HASH_SPACE}
                                      ELSE t END),
                             {HASH_SPACE})::BIGINT AS theta
             FROM (SELECT g, max(h) AS t, count(*) AS ku
                   FROM sk GROUP BY 1)),
      un AS (SELECT count(DISTINCT h)::BIGINT AS n_union
             FROM sk, st WHERE h <= theta)
      SELECT n_groups, theta, n_union,
             {fr(f'n_union::DOUBLE * {_M60} / theta::DOUBLE', 6)}
               AS est_union
      FROM st, un"""

    # K-way theta intersection: survivors <= theta present in ALL
    # groups' sketches (distinct (g, h) then per-hash group count)
    o["sk_kmv_intersect_k"] = f"""
      WITH v AS (SELECT DISTINCT l_returnflag AS g, l_orderkey AS v
                 FROM lineitem WHERE l_orderkey IS NOT NULL
                   AND l_returnflag IS NOT NULL),
      hh AS (SELECT g, v, {_h64v} AS h FROM v),
      rk AS (SELECT g, h, row_number() OVER (
                 PARTITION BY g ORDER BY h ASC, v ASC) AS rn FROM hh),
      sk AS (SELECT DISTINCT g, h FROM rk WHERE rn <= {_KMV_K}),
      st AS (SELECT count(*)::BIGINT AS n_groups,
                    coalesce(min(CASE WHEN ku < {_KMV_K}
                                      THEN {HASH_SPACE}
                                      ELSE t END),
                             {HASH_SPACE})::BIGINT AS theta
             FROM (SELECT g, max(h) AS t, count(*) AS ku
                   FROM sk GROUP BY 1)),
      cm AS (SELECT count(*)::BIGINT AS n_common FROM
             (SELECT h FROM sk, st WHERE h <= theta
              GROUP BY h, n_groups HAVING count(*) = n_groups))
      SELECT n_groups, theta, n_common,
             {fr(f'n_common::DOUBLE * {_M60} / theta::DOUBLE', 6)}
               AS est_intersection
      FROM st, cm"""

    # theta-sketch set DIFFERENCE + containment: same sketch build,
    # theta convention and survivor counts as sk_kmv_setops
    o["sk_kmv_diff"] = f"""
      WITH v AS (SELECT DISTINCT l_returnflag AS g, l_orderkey AS v
                 FROM lineitem WHERE l_orderkey IS NOT NULL
                   AND l_returnflag IN ('A', 'R')),
      hh AS (SELECT g, v, {_h64v} AS h FROM v),
      rk AS (SELECT g, h, row_number() OVER (
                 PARTITION BY g ORDER BY h ASC, v ASC) AS rn FROM hh),
      sk AS (SELECT g, h FROM rk WHERE rn <= {_KMV_K}),
      th AS (SELECT min(CASE WHEN ku < {_KMV_K} THEN {HASH_SPACE}
                             ELSE t END)::BIGINT AS theta FROM
             (SELECT g, max(h) AS t, count(*) AS ku FROM sk GROUP BY 1)),
      sa AS (SELECT h FROM sk, th WHERE g = 'A' AND h <= theta),
      sb AS (SELECT h FROM sk, th WHERE g = 'R' AND h <= theta),
      cnt AS (SELECT (SELECT theta FROM th) AS theta,
                     (SELECT count(*) FROM sa)::BIGINT AS n_a,
                     (SELECT count(*) FROM sb)::BIGINT AS n_b,
                     (SELECT count(*) FROM sa JOIN sb USING (h))::BIGINT
                       AS n_common)
      SELECT theta, n_a, n_b, n_common,
             {fr(f'(n_a - n_common)::DOUBLE * {_M60} '
                 '/ theta::DOUBLE', 6)} AS est_diff_ab,
             {fr(f'(n_b - n_common)::DOUBLE * {_M60} '
                 '/ theta::DOUBLE', 6)} AS est_diff_ba,
             CASE WHEN n_a > 0 THEN
               {fr('n_common::DOUBLE / n_a::DOUBLE', 6)}
             END AS containment_ab,
             CASE WHEN n_b > 0 THEN
               {fr('n_common::DOUBLE / n_b::DOUBLE', 6)}
             END AS containment_ba
      FROM cnt"""

    _hll_raw = f"{HLL_NUMER!r} / s_total::DOUBLE"
    o["sk_hll"] = f"""
      WITH v AS (SELECT l_returnflag AS g, l_orderkey AS v
                 FROM lineitem WHERE l_orderkey IS NOT NULL),
      hh AS (SELECT g, {_h64v} AS h FROM v),
      bb AS (SELECT g, h % {HLL_M} AS j,
                    CASE WHEN h // {HLL_M} = 0 THEN 53
                         ELSE 53 - length(bin(h // {HLL_M})) END AS rho
             FROM hh),
      regs AS (SELECT g, j, max(rho) AS m FROM bb GROUP BY 1, 2),
      f AS (SELECT g, count(*)::BIGINT AS n_buckets_used,
                   sum(1::BIGINT << (53 - m)::INT)::BIGINT AS s_used
            FROM regs GROUP BY 1),
      t AS (SELECT g, n_buckets_used,
                   ({HLL_M} - n_buckets_used)::BIGINT AS n_empty,
                   (s_used + ({HLL_M} - n_buckets_used)
                    * (1::BIGINT << 53))::BIGINT AS s_total
            FROM f)
      SELECT g AS l_returnflag, n_buckets_used, n_empty,
             {fr(f'CASE WHEN {_hll_raw} <= {2.5 * HLL_M!r} '
                 f'AND n_empty > 0 '
                 f'THEN {float(HLL_M)!r} * ln({float(HLL_M)!r} '
                 f'/ n_empty::DOUBLE) '
                 f'ELSE {_hll_raw} END', 6)} AS est_distinct
      FROM t"""

    _cm_coef = minhash_coeffs(4, seed=7)
    _cm_cells = "\n          UNION ALL ".join(
        f"SELECT {i} AS rw, (({a} * h + {b}) % {MERSENNE_P}) % 1024 "
        f"AS bucket FROM it"
        for i, (a, b) in enumerate(_cm_coef))
    _cm_probes = "\n          UNION ALL ".join(
        f"SELECT item, exact_cnt, {i} AS rw, "
        f"(({a} * h + {b}) % {MERSENNE_P}) % 1024 AS bucket FROM eh"
        for i, (a, b) in enumerate(_cm_coef))
    o["sk_countmin"] = f"""
      WITH it AS (SELECT l_partkey AS item,
                         {duck_hash64('l_partkey::VARCHAR')}
                         % {MERSENNE_P} AS h
                  FROM lineitem WHERE l_partkey IS NOT NULL),
      cells AS (SELECT rw, bucket, count(*)::BIGINT AS cell_cnt FROM (
          {_cm_cells}) GROUP BY 1, 2),
      ex AS (SELECT item, count(*)::BIGINT AS exact_cnt FROM it
             GROUP BY 1 ORDER BY exact_cnt DESC, item ASC LIMIT 20),
      eh AS (SELECT item, exact_cnt,
                    {duck_hash64('item::VARCHAR')} % {MERSENNE_P} AS h
             FROM ex),
      pr AS ({_cm_probes})
      SELECT pr.item, max(pr.exact_cnt)::BIGINT AS exact_cnt,
             min(cells.cell_cnt)::BIGINT AS cm_est
      FROM pr JOIN cells ON cells.rw = pr.rw AND cells.bucket = pr.bucket
      GROUP BY 1"""

    # Pearson chi-square: integer microunit terms over the R x C spine
    # (HUGEINT intermediates mirror Spark's DECIMAL(38,0)), integer sum
    o["ev_ab_chisq"] = """
      WITH b AS (SELECT event_type AS r, (user_id % 2)::BIGINT AS c
                 FROM events
                 WHERE event_type IS NOT NULL AND user_id IS NOT NULL),
      cells AS (SELECT r, c, count(*)::BIGINT AS o FROM b GROUP BY 1, 2),
      rm AS (SELECT r, sum(o)::BIGINT AS rmv FROM cells GROUP BY 1),
      cm AS (SELECT c, sum(o)::BIGINT AS cmv FROM cells GROUP BY 1),
      sp AS (SELECT rm.r, cm.c, rm.rmv, cm.cmv FROM rm, cm),
      fl AS (SELECT sp.r, sp.c, sp.rmv, sp.cmv,
                    COALESCE(cells.o, 0)::BIGINT AS o
             FROM sp LEFT JOIN cells
               ON cells.r = sp.r AND cells.c = sp.c),
      w AS (SELECT *, sum(o) OVER ()::BIGINT AS n FROM fl),
      t AS (SELECT n,
                   ((o::HUGEINT * n - rmv::HUGEINT * cmv)
                    * (o::HUGEINT * n - rmv::HUGEINT * cmv)
                    * 1000000)
                   // (n::HUGEINT * rmv * cmv) AS tm,
                   r, c
            FROM w),
      f AS (SELECT min(n)::BIGINT AS n,
                   count(DISTINCT r)::BIGINT AS n_rows_cat,
                   count(DISTINCT c)::BIGINT AS n_cols_cat,
                   sum(tm)::BIGINT AS micro
            FROM t)
      SELECT n, n_rows_cat, n_cols_cat,
             ((n_rows_cat - 1) * (n_cols_cat - 1))::BIGINT AS dof,
             CASE WHEN (n_rows_cat - 1) * (n_cols_cat - 1) <= 0
                  THEN NULL
                  ELSE micro::DOUBLE / 1000000.0 END AS chi2
      FROM f"""

    # Two-sample KS: same per-value machinery, integer cross-multiplied
    # CDF gap max, one division + one sqrt scaling
    o["ev_ab_ks"] = """
      WITH b AS (SELECT event_type AS g, value AS v FROM events
                 WHERE value IS NOT NULL
                   AND event_type IN ('click', 'view')),
      c AS (SELECT v, sum((g = 'click')::BIGINT)::BIGINT AS ca,
                   sum((g = 'view')::BIGINT)::BIGINT AS cb
            FROM b GROUP BY 1),
      p AS (SELECT v, ca, cb,
                   sum(ca) OVER (ORDER BY v)::BIGINT AS cuma,
                   sum(cb) OVER (ORDER BY v)::BIGINT AS cumb,
                   sum(ca) OVER ()::BIGINT AS na,
                   sum(cb) OVER ()::BIGINT AS nb
            FROM c),
      f AS (SELECT min(na)::BIGINT AS n_a, min(nb)::BIGINT AS n_b,
                   max(abs(cuma * nb - cumb * na))::BIGINT AS d_num
            FROM p)
      SELECT n_a, n_b, d_num,
             CASE WHEN n_a = 0 OR n_b = 0 THEN NULL
                  ELSE floor(d_num::DOUBLE / (n_a * n_b)::DOUBLE
                             * 1000000.0 + 0.5) / 1000000.0
             END AS d_stat,
             CASE WHEN n_a = 0 OR n_b = 0 THEN NULL
                  ELSE floor((floor(d_num::DOUBLE / (n_a * n_b)::DOUBLE
                                    * 1000000.0 + 0.5) / 1000000.0)
                             * sqrt((n_a * n_b)::DOUBLE
                                    / (n_a + n_b)::DOUBLE)
                             * 1000000.0 + 0.5) / 1000000.0
             END AS ks_stat_scaled
      FROM f"""

    # Mann-Whitney rank-sum: per-value group counts, cumulative pass
    # over the value vocabulary, integer 2U + tie-corrected sigma^2,
    # one IEEE sqrt (correctly rounded in both engines)
    o["ev_ab_ranksum"] = """
      WITH b AS (SELECT event_type AS g, value AS v FROM events
                 WHERE value IS NOT NULL
                   AND event_type IN ('click', 'error')),
      c AS (SELECT v, sum((g = 'click')::BIGINT)::BIGINT AS ca,
                   sum((g = 'error')::BIGINT)::BIGINT AS cb
            FROM b GROUP BY 1),
      p AS (SELECT v, ca, cb,
                   COALESCE(sum(cb) OVER (ORDER BY v
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                     0)::BIGINT AS cumb
            FROM c),
      f AS (SELECT sum(ca)::BIGINT AS n_a, sum(cb)::BIGINT AS n_b,
                   sum(2 * ca * cumb + ca * cb)::BIGINT AS u2,
                   sum((ca + cb) * (ca + cb) * (ca + cb)
                       - (ca + cb))::BIGINT AS ties
            FROM p),
      t AS (SELECT n_a, n_b, u2, ties, (n_a + n_b) AS n FROM f)
      SELECT n_a, n_b, (u2::DOUBLE / 2.0) AS u_a,
             CASE WHEN n_a = 0 OR n_b = 0
                    OR ((n_a * n_b)::DOUBLE
                        * ((n + 1) * n * (n - 1) - ties)::DOUBLE
                        / (12::DOUBLE * (n * (n - 1))::DOUBLE)) = 0.0
                  THEN NULL
                  ELSE floor((u2 - n_a * n_b)::DOUBLE * 0.5
                             / sqrt((n_a * n_b)::DOUBLE
                                    * ((n + 1) * n * (n - 1)
                                       - ties)::DOUBLE
                                    / (12::DOUBLE
                                       * (n * (n - 1))::DOUBLE))
                             * 1000000.0 + 0.5) / 1000000.0
             END AS z
      FROM t"""

    # Pre-bucketed A/B readout: high-cardinality metric coarsened by
    # floor(v/0.5)*0.5 (exact power-of-two scaling both engines), then
    # the rank-sum AND KS statistics from one shared per-value count
    # table; z/d formulas identical to ev_ab_ranksum / ev_ab_ks
    o["ev_ab_bucketed"] = """
      WITH m AS (SELECT event_type AS g,
                        floor((value + (user_id % 97)::DOUBLE / 128.0)
                              / 0.5) * 0.5 AS v
                 FROM events),
      b AS (SELECT g, v FROM m
            WHERE v IS NOT NULL AND g IN ('click', 'view')),
      c AS (SELECT v, sum((g = 'click')::BIGINT)::BIGINT AS ca,
                   sum((g = 'view')::BIGINT)::BIGINT AS cb
            FROM b GROUP BY 1),
      p AS (SELECT v, ca, cb,
                   COALESCE(sum(cb) OVER (ORDER BY v
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                     0)::BIGINT AS cumb_prev,
                   sum(ca) OVER (ORDER BY v)::BIGINT AS cuma,
                   sum(cb) OVER (ORDER BY v)::BIGINT AS cumb,
                   sum(ca) OVER ()::BIGINT AS na,
                   sum(cb) OVER ()::BIGINT AS nb
            FROM c),
      f AS (SELECT sum(ca)::BIGINT AS n_a, sum(cb)::BIGINT AS n_b,
                   sum(2 * ca * cumb_prev + ca * cb)::BIGINT AS u2,
                   sum((ca + cb) * (ca + cb) * (ca + cb)
                       - (ca + cb))::BIGINT AS ties,
                   max(abs(cuma * nb - cumb * na))::BIGINT AS d_num
            FROM p),
      t AS (SELECT n_a, n_b, u2, ties, d_num, (n_a + n_b) AS n FROM f)
      SELECT n_a, n_b, (u2::DOUBLE / 2.0) AS u_a,
             CASE WHEN n_a = 0 OR n_b = 0
                    OR ((n_a * n_b)::DOUBLE
                        * ((n + 1) * n * (n - 1) - ties)::DOUBLE
                        / (12::DOUBLE * (n * (n - 1))::DOUBLE)) = 0.0
                  THEN NULL
                  ELSE floor((u2 - n_a * n_b)::DOUBLE * 0.5
                             / sqrt((n_a * n_b)::DOUBLE
                                    * ((n + 1) * n * (n - 1)
                                       - ties)::DOUBLE
                                    / (12::DOUBLE
                                       * (n * (n - 1))::DOUBLE))
                             * 1000000.0 + 0.5) / 1000000.0
             END AS z,
             d_num,
             CASE WHEN n_a = 0 OR n_b = 0 THEN NULL
                  ELSE floor(d_num::DOUBLE / (n_a * n_b)::DOUBLE
                             * 1000000.0 + 0.5) / 1000000.0
             END AS d_stat,
             CASE WHEN n_a = 0 OR n_b = 0 THEN NULL
                  ELSE floor((floor(d_num::DOUBLE / (n_a * n_b)::DOUBLE
                                    * 1000000.0 + 0.5) / 1000000.0)
                             * sqrt((n_a * n_b)::DOUBLE
                                    / (n_a + n_b)::DOUBLE)
                             * 1000000.0 + 0.5) / 1000000.0
             END AS ks_stat_scaled
      FROM t"""

    # CUPED (Deng et al. 2013): per-user pre/post value sums (exact
    # DECIMAL), ROUND(v*100) integer coarsening, six HUGEINT moment
    # sums (mirror of Spark's DECIMAL(38,0)), closed-form scalars over
    # identical exact-integer doubles, _fr edges
    _cuped_b = 1705363200 * 10 ** 9
    o["ev_ab_cuped"] = f"""
      WITH u AS (SELECT user_id,
                        coalesce({dsum(f'CASE WHEN {EV_TIME} < '
                                       f'{_cuped_b} THEN value END')},
                                 0.0) AS x,
                        coalesce({dsum(f'CASE WHEN {EV_TIME} >= '
                                       f'{_cuped_b} THEN value END')},
                                 0.0) AS y
                 FROM events WHERE user_id IS NOT NULL GROUP BY 1),
      c AS (SELECT (user_id % 2) AS g,
                   floor(y * 100.0 + 0.5)::BIGINT AS yi,
                   floor(x * 100.0 + 0.5)::BIGINT AS xi
            FROM u WHERE (user_id % 2) IN (0, 1)),
      m AS (SELECT sum((g = 0)::BIGINT)::BIGINT AS n_a,
                   sum((g = 1)::BIGINT)::BIGINT AS n_b,
                   sum(xi::HUGEINT)::DOUBLE AS dsx,
                   sum(yi::HUGEINT)::DOUBLE AS dsy,
                   sum(xi::HUGEINT * xi::HUGEINT)::DOUBLE AS dsxx,
                   sum(xi::HUGEINT * yi::HUGEINT)::DOUBLE AS dsxy,
                   sum(yi::HUGEINT * yi::HUGEINT)::DOUBLE AS dsyy,
                   sum(xi::HUGEINT * (g = 0)::BIGINT)::DOUBLE AS dsxa,
                   sum(yi::HUGEINT * (g = 0)::BIGINT)::DOUBLE AS dsya,
                   sum(xi::HUGEINT * (g = 1)::BIGINT)::DOUBLE AS dsxb,
                   sum(yi::HUGEINT * (g = 1)::BIGINT)::DOUBLE AS dsyb
            FROM c),
      t AS (SELECT *, (n_a::DOUBLE + n_b::DOUBLE) AS n,
                   n_a::DOUBLE AS dna, n_b::DOUBLE AS dnb FROM m),
      s AS (SELECT *, n * dsxy - dsx * dsy AS cov2,
                   n * dsxx - dsx * dsx AS varx2,
                   n * dsyy - dsy * dsy AS vary2,
                   dsx / n AS mean_x,
                   CASE WHEN n_a > 0 THEN dsya / dna / 100.0 END
                     AS ma_raw,
                   CASE WHEN n_b > 0 THEN dsyb / dnb / 100.0 END
                     AS mb_raw FROM t),
      f AS (SELECT *, CASE WHEN varx2 > 0 THEN cov2 / varx2 END AS th
            FROM s),
      a AS (SELECT *,
                   ma_raw - th * (dsxa / dna - mean_x) / 100.0 AS adj_a,
                   mb_raw - th * (dsxb / dnb - mean_x) / 100.0 AS adj_b
            FROM f)
      SELECT n_a, n_b, {fr('th', 6)} AS theta,
             {fr('ma_raw', 6)} AS mean_a, {fr('mb_raw', 6)} AS mean_b,
             {fr('ma_raw - mb_raw', 6)} AS diff,
             {fr('adj_a', 6)} AS mean_a_adj,
             {fr('adj_b', 6)} AS mean_b_adj,
             {fr('adj_a - adj_b', 6)} AS diff_adj,
             CASE WHEN varx2 > 0 AND vary2 > 0 THEN
               {fr('cov2 * cov2 / (varx2 * vary2)', 6)}
             END AS var_reduction
      FROM a"""

    # Rolling Hampel: list() over a ±1 h RANGE frame per series,
    # lower-median element picks (never interpolation — every med/mad
    # is an exact input double), k·1.4826·MAD strict-> flag
    o["ts_hampel"] = f"""
      WITH e AS (SELECT event_type,
                        ({EV_TIME} - {EV_TIME} % 1000) AS time, value
                 FROM events WHERE value IS NOT NULL),
      w AS (SELECT event_type, time, value,
                   list(value) OVER (PARTITION BY event_type
                       ORDER BY time RANGE BETWEEN
                         {3_600_000_000_000} PRECEDING
                         AND {3_600_000_000_000} FOLLOWING) AS arr
            FROM e),
      m AS (SELECT event_type, time, value, list_sort(arr) AS sarr,
                   ((len(arr) + 1) // 2) AS i FROM w),
      d AS (SELECT event_type, time, value, sarr[i] AS med,
                   list_sort(list_transform(
                     sarr, x -> abs(x - sarr[i])))[i] AS mad
            FROM m)
      SELECT event_type, time, value, med, mad,
             (abs(value - med) > 3.0 * 1.4826 * mad) AS is_outlier
      FROM d"""

    # First-occurrence precedence matrix: per-(user, type) min time,
    # per-user type-pair self-join, strict-inequality counts, floor ppm
    o["ev_precedence"] = f"""
      WITH f AS (SELECT user_id, event_type AS t,
                        min({EV_TIME} - {EV_TIME} % 1000) AS ft
                 FROM events
                 WHERE event_type IS NOT NULL AND ts IS NOT NULL
                 GROUP BY 1, 2)
      SELECT a.t AS type_a, b.t AS type_b,
             sum((a.ft < b.ft)::BIGINT)::BIGINT AS n_precedes,
             count(*)::BIGINT AS n_both,
             ((sum((a.ft < b.ft)::BIGINT) * 1000000)
              // count(*))::BIGINT AS share_ppm
      FROM f a JOIN f b
        ON a.user_id = b.user_id AND a.t != b.t
      GROUP BY 1, 2"""

    # Deterministic shard assignment: hash64('epoch1:' || id) mod 8,
    # rank within shard by (hash, id)
    _sh_h = duck_hash64("('epoch1:' || doc_id::VARCHAR)")
    o["doc_shards"] = f"""
      WITH h AS (SELECT doc_id, {_sh_h} AS hv FROM documents
                 WHERE doc_id IS NOT NULL)
      SELECT doc_id, (hv % 8)::BIGINT AS shard,
             row_number() OVER (PARTITION BY hv % 8
                                ORDER BY hv ASC, doc_id ASC)::BIGINT
               AS pos
      FROM h"""

    # Exact set-similarity join: BRUTE-FORCE pairwise over the sampled
    # sub-corpus — deliberately a DIFFERENT algorithm than the Spark
    # prefix-filter join, so the green hash certifies the filter's
    # losslessness empirically, not just by theorem
    o["doc_setsim_exact"] = f"""
      WITH tok AS (SELECT DISTINCT doc_id AS id, unnest({TOKS}) AS tok
                   FROM documents WHERE doc_id % 7 = 0),
      sz AS (SELECT id, count(*)::BIGINT AS sz FROM tok GROUP BY 1),
      com AS (SELECT a.id AS id_a, b.id AS id_b,
                     count(*)::BIGINT AS n_common
              FROM tok a JOIN tok b
                ON a.tok = b.tok AND a.id < b.id
              GROUP BY 1, 2)
      SELECT c.id_a, c.id_b, sa.sz AS size_a, sb.sz AS size_b,
             c.n_common,
             round(c.n_common::DOUBLE
                   / (sa.sz + sb.sz - c.n_common)::DOUBLE, 6) AS jaccard
      FROM com c
      JOIN sz sa ON sa.id = c.id_a
      JOIN sz sb ON sb.id = c.id_b
      WHERE 10 * c.n_common >= 7 * (sa.sz + sb.sz - c.n_common)"""

    # LSH recall eval: the exact side is the brute-force pairwise
    # 3-shingle join (valid reference because prefix filtering is
    # lossless — same theorem the doc_setsim_exact gate certifies);
    # the found side composes the banding replay VERBATIM (the
    # emb_recall convention). Counts + two guarded round-6 divisions.
    o["doc_dedup_recall"] = f"""
      WITH rsh AS MATERIALIZED ({_shingles_cte(3)}),
      rtok AS (SELECT DISTINCT doc_id AS id, unnest(sh) AS tok
               FROM rsh WHERE len(sh) > 0),
      rsz AS (SELECT id, count(*)::BIGINT AS sz FROM rtok GROUP BY 1),
      rcom AS (SELECT a.id AS id_a, b.id AS id_b,
                      count(*)::BIGINT AS n_common
               FROM rtok a JOIN rtok b
                 ON a.tok = b.tok AND a.id < b.id
               GROUP BY 1, 2),
      rexact AS (SELECT c.id_a, c.id_b
                 FROM rcom c
                 JOIN rsz sa ON sa.id = c.id_a
                 JOIN rsz sb ON sb.id = c.id_b
                 WHERE 10 * c.n_common >= 7 * (sa.sz + sb.sz - c.n_common)),
      rfound AS (SELECT id_a, id_b FROM ({_near_dups_sql(3, 0.7)})),
      rhit AS (SELECT e.id_a, e.id_b
               FROM rexact e JOIN rfound f USING (id_a, id_b)),
      m AS (SELECT (SELECT count(*) FROM rexact) AS n_exact,
                   (SELECT count(*) FROM rfound) AS n_found,
                   (SELECT count(*) FROM rhit) AS n_hit)
      SELECT n_exact, n_found, n_hit,
             CASE WHEN n_exact > 0
                  THEN round(n_hit::DOUBLE / n_exact::DOUBLE, 6) END
               AS recall,
             CASE WHEN n_found > 0
                  THEN round(n_hit::DOUBLE / n_found::DOUBLE, 6) END
               AS "precision"
      FROM m"""

    # One-sweep column profiler: per column, counts + the m=256 HLL
    # replay over the string rendering + lexicographic min/max — one
    # UNION ALL branch per profiled column
    def _profile_col(tbl: str, c: str) -> str:
        h = duck_hash64(f"{c}::VARCHAR")
        est = (f'CASE WHEN {_hll_raw} <= {2.5 * HLL_M!r} '
               f'AND n_empty > 0 '
               f'THEN {float(HLL_M)!r} * ln({float(HLL_M)!r} '
               f'/ n_empty::DOUBLE) '
               f'ELSE {_hll_raw} END')
        return f"""
      SELECT '{c}' AS col_name,
             (SELECT count(*) FROM {tbl})::BIGINT AS n_rows,
             (SELECT count(*) FROM {tbl} WHERE {c} IS NULL)::BIGINT
               AS n_null,
             (SELECT {fr(est, 6)} FROM (
                SELECT n_buckets_used,
                       ({HLL_M} - n_buckets_used)::BIGINT AS n_empty,
                       (s_used + ({HLL_M} - n_buckets_used)
                        * (1::BIGINT << 53))::BIGINT AS s_total
                FROM (SELECT count(*)::BIGINT AS n_buckets_used,
                             sum(1::BIGINT << (53 - m)::INT)::BIGINT
                               AS s_used
                      FROM (SELECT j, max(rho) AS m FROM
                            (SELECT h % {HLL_M} AS j,
                                    CASE WHEN h // {HLL_M} = 0 THEN 53
                                         ELSE 53 - length(bin(
                                             h // {HLL_M})) END AS rho
                             FROM (SELECT {h} AS h FROM {tbl}
                                   WHERE {c} IS NOT NULL))
                            GROUP BY 1)))) AS est_distinct,
             (SELECT min({c}::VARCHAR) FROM {tbl}) AS min_s,
             (SELECT max({c}::VARCHAR) FROM {tbl}) AS max_s"""

    o["diag_profile"] = "\n      UNION ALL ".join(
        _profile_col("customer", c)
        for c in ("c_custkey", "c_name", "c_nationkey", "c_mktsegment"))

    # Salted distinct: the oracle IS the direct form — the salting
    # changes the plan, never the result
    o["diag_salted_distinct"] = """
      SELECT event_type, count(DISTINCT user_id)::BIGINT AS n_distinct
      FROM events WHERE user_id IS NOT NULL
      GROUP BY 1"""

    # Join advisor: per-side rows/keys/max-key from one keyed count,
    # coordinated 1/64 sample estimate, deterministic CASE decision
    _ja_lh = duck_hash64("l_orderkey::VARCHAR")
    _ja_oh = duck_hash64("o_orderkey::VARCHAR")
    o["diag_join_advisor"] = f"""
      WITH lc AS (SELECT l_orderkey AS k, count(*)::BIGINT AS c
                  FROM lineitem WHERE l_orderkey IS NOT NULL
                  GROUP BY 1),
      rc AS (SELECT o_orderkey AS k, count(*)::BIGINT AS c
             FROM orders WHERE o_orderkey IS NOT NULL GROUP BY 1),
      l AS (SELECT sum(c)::BIGINT AS n_left,
                   count(*)::BIGINT AS keys_left,
                   max(c)::BIGINT AS max_key_left FROM lc),
      r AS (SELECT sum(c)::BIGINT AS n_right,
                   count(*)::BIGINT AS keys_right,
                   max(c)::BIGINT AS max_key_right FROM rc),
      sp AS (SELECT count(*)::BIGINT AS sampled_pairs FROM
               (SELECT l_orderkey AS k FROM lineitem
                WHERE l_orderkey IS NOT NULL AND {_ja_lh} % 64 = 0) a
               JOIN
               (SELECT o_orderkey AS k FROM orders
                WHERE o_orderkey IS NOT NULL AND {_ja_oh} % 64 = 0) b
               USING (k)),
      t AS (SELECT *,
              ((max_key_left + (n_left // keys_left) - 1)
               // (n_left // keys_left))::BIGINT AS salt_left,
              ((max_key_right + (n_right // keys_right) - 1)
               // (n_right // keys_right))::BIGINT AS salt_right
            FROM l, r, sp)
      SELECT n_left, n_right, keys_left, keys_right,
             max_key_left, max_key_right, salt_left, salt_right,
             sampled_pairs, (sampled_pairs * 64)::BIGINT AS est_pairs,
             CASE WHEN n_right <= 50000 AND n_right <= n_left
                    THEN 'broadcast_right'
                  WHEN n_left <= 50000 THEN 'broadcast_left'
                  WHEN n_right <= 50000 THEN 'broadcast_right'
                  WHEN salt_left >= 4 OR salt_right >= 4
                    THEN 'salted_shuffle'
                  ELSE 'shuffle' END AS recommendation
      FROM t"""

    # Zone map: per-day min/max/counts of value at µs-truncated ns
    # time, plus the [480, 500) skip verdict — no arithmetic on the
    # values themselves
    o["diag_zonemap"] = f"""
      WITH e AS (SELECT ({EV_TIME} - {EV_TIME} % 1000) AS t, value
                 FROM events),
      b AS (SELECT (t - t % {DAY}) AS bucket, value FROM e
            WHERE t IS NOT NULL)
      SELECT bucket, count(*)::BIGINT AS n_rows,
             sum((value IS NULL)::BIGINT)::BIGINT AS n_null,
             min(value) AS v_min, max(value) AS v_max,
             (max(value) IS NULL OR max(value) < 480.0
              OR min(value) >= 500.0) AS prunable
      FROM b GROUP BY 1"""

    # AMS tug-of-war F2: d=32 signed sums per group from the shared
    # universal hash family (seed 11), est = (sum of squares) // d,
    # exact Σc² audit beside it — integer-exact end-to-end
    _ams_coef = minhash_coeffs(32, seed=11)
    _ams_h = f"{duck_hash64('user_id::VARCHAR')} % {MERSENNE_P}"
    _ams_zs = ",\n             ".join(
        f"sum(1 - 2 * ((({a} * h + {b}) % {MERSENNE_P}) % 2))::BIGINT "
        f"AS z{i}"
        for i, (a, b) in enumerate(_ams_coef))
    _ams_sq = " + ".join(f"z{i} * z{i}" for i in range(len(_ams_coef)))
    o["sk_ams_f2"] = f"""
      WITH b AS (SELECT event_type AS g, user_id AS i, {_ams_h} AS h
                 FROM events WHERE user_id IS NOT NULL),
      z AS (SELECT g, count(*)::BIGINT AS n_rows,
             {_ams_zs}
            FROM b GROUP BY 1),
      ex AS (SELECT g, count(*)::BIGINT AS n_items,
                    sum(c * c)::BIGINT AS f2_exact
             FROM (SELECT g, i, count(*)::BIGINT AS c FROM b
                   GROUP BY 1, 2) GROUP BY 1)
      SELECT z.g AS event_type, z.n_rows, ex.n_items, ex.f2_exact,
             (({_ams_sq}) // 32)::BIGINT AS f2_est
      FROM z JOIN ex ON z.g = ex.g"""

    # Coordinated-sample join-size estimate: same 1/64 hash slice of
    # the join key on both sides; est scales by the rate ONCE
    _js_lh = duck_hash64("l_orderkey::VARCHAR")
    _js_oh = duck_hash64("o_orderkey::VARCHAR")
    o["sk_join_sample"] = f"""
      WITH ls AS (SELECT l_orderkey AS k FROM lineitem
                  WHERE l_orderkey IS NOT NULL AND {_js_lh} % 64 = 0),
      rs AS (SELECT o_orderkey AS k FROM orders
             WHERE o_orderkey IS NOT NULL AND {_js_oh} % 64 = 0),
      sp AS (SELECT count(*)::BIGINT AS c
             FROM ls JOIN rs ON ls.k = rs.k)
      SELECT (SELECT count(*) FROM ls)::BIGINT AS n_left_sampled,
             (SELECT count(*) FROM rs)::BIGINT AS n_right_sampled,
             sp.c AS sampled_pairs,
             (sp.c * 64)::BIGINT AS est_pairs,
             (SELECT count(*) FROM lineitem l JOIN orders o
                ON l.l_orderkey = o.o_orderkey
              WHERE l.l_orderkey IS NOT NULL)::BIGINT AS exact_pairs
      FROM sp"""

    # Histogram quantiles: width 0.5 is a power of two, so the binning
    # divide/floor are EXACT; ranks and counts integer; one interpolation
    # division floor-round-6 (quantile_cont convention NOT used — this is
    # the estimator's own interpolation, mirrored verbatim)
    _hq_est = ("0.0 + 0.5 * (bin::DOUBLE "
               "+ (r::DOUBLE - (cum - c)::DOUBLE) / c::DOUBLE)")
    o["sk_hist_quantile"] = f"""
      WITH v AS (SELECT event_type, value::DOUBLE AS v FROM events
                 WHERE value IS NOT NULL),
      b AS (SELECT event_type,
                   LEAST(GREATEST(floor((v - 0.0) / 0.5), 0),
                         1023)::BIGINT AS bin,
                   CASE WHEN floor((v - 0.0) / 0.5) < 0
                          OR floor((v - 0.0) / 0.5) >= 1024
                        THEN 1 ELSE 0 END AS oob
            FROM v),
      h AS (SELECT event_type, bin, count(*)::BIGINT AS c,
                   sum(oob)::BIGINT AS oc
            FROM b GROUP BY 1, 2),
      cm AS (SELECT event_type, bin, c,
                    sum(c) OVER (PARTITION BY event_type
                                 ORDER BY bin)::BIGINT AS cum,
                    sum(c) OVER (PARTITION BY event_type)::BIGINT AS n,
                    sum(oc) OVER (PARTITION BY event_type)::BIGINT AS nc
             FROM h),
      qq AS (SELECT cm.*, q FROM cm,
             (SELECT unnest([0.5, 0.95, 0.99])::DOUBLE AS q)),
      rr AS (SELECT *, ceil(q * n::DOUBLE)::BIGINT AS r FROM qq)
      SELECT event_type, q, n, nc AS n_clamped, {fr(_hq_est, 6)} AS est
      FROM rr WHERE cum - c < r AND r <= cum"""

    # Bloom runtime-filter audit: same md5/LCG positions, word-keyed
    # bit_or bitmap, 4 left-join bit tests on the probe side
    _bl_coef = minhash_coeffs(4, seed=5)
    _bl_kh = f"{duck_hash64('k::VARCHAR')} % {MERSENNE_P}"
    _bl_bh = f"{duck_hash64('l_partkey::VARCHAR')} % {MERSENNE_P}"
    _bl_pos = "\n            UNION ALL ".join(
        f"SELECT (({a} * h + {b}) % {MERSENNE_P}) % 1024 AS p FROM kh"
        for a, b in _bl_coef)

    def _bl_bit(s: str) -> str:
        # DuckDB raises on 1::BIGINT << 63 where the JVM wraps to the
        # sign bit — emit the wrapped value explicitly for bit 63
        return (f"(CASE WHEN ({s}) = 63 THEN (-9223372036854775807 - 1) "
                f"ELSE (1::BIGINT << ({s})::INT) END)")

    _bl_tests = " AND ".join(
        f"(COALESCE(w{i}.bits, 0) & "
        + _bl_bit(f"((({a} * pr.h + {b}) % {MERSENNE_P}) % 1024) % 64")
        + ") != 0"
        for i, (a, b) in enumerate(_bl_coef))
    _bl_joins = "\n        ".join(
        f"LEFT JOIN words w{i} ON w{i}.w = "
        f"(((({a} * pr.h + {b}) % {MERSENNE_P}) % 1024) // 64)"
        for i, (a, b) in enumerate(_bl_coef))
    o["sk_bloom"] = f"""
      WITH keys AS (SELECT DISTINCT p_partkey AS k FROM part
                    WHERE p_partkey % 13 = 0 AND p_partkey IS NOT NULL),
      kh AS (SELECT k, {_bl_kh} AS h FROM keys),
      words AS (SELECT (p // 64)::INT AS w,
                       bit_or({_bl_bit('p % 64')}) AS bits
                FROM ({_bl_pos}) GROUP BY 1),
      pr AS (SELECT l_partkey AS k, {_bl_bh} AS h FROM lineitem
             WHERE l_partkey IS NOT NULL),
      np AS (SELECT count(*)::BIGINT AS n_pass_bloom FROM pr
        {_bl_joins}
        WHERE {_bl_tests}),
      nm AS (SELECT count(*)::BIGINT AS n_true_match FROM pr
             WHERE pr.k IN (SELECT k FROM keys)),
      t AS (SELECT (SELECT count(*) FROM keys)::BIGINT AS n_small_keys,
                   (SELECT count(*) FROM pr)::BIGINT AS n_big_rows,
                   np.n_pass_bloom, nm.n_true_match
            FROM np, nm)
      SELECT n_small_keys, n_big_rows, n_pass_bloom, n_true_match,
             (n_pass_bloom - n_true_match)::BIGINT AS n_false_pos,
             (((n_pass_bloom - n_true_match) * 1000000)
              // GREATEST(1, n_big_rows - n_true_match))::BIGINT
               AS fp_ppm
      FROM t"""

    # Histogram ROLLUP: single-pass whole-range quantiles (the rollup's
    # cell-wise + merge is exact, so the oracle need not replay the
    # bucketing) + per-group count of merged day partials
    o["sk_hist_rollup"] = f"""
      WITH v AS (SELECT event_type, value::DOUBLE AS v,
                        ({EV_TIME} - {EV_TIME} % 1000) AS t
                 FROM events
                 WHERE value IS NOT NULL AND ts IS NOT NULL),
      nb AS (SELECT event_type,
                    count(DISTINCT (t - t % {DAY}))::BIGINT AS n_buckets
             FROM v GROUP BY 1),
      b AS (SELECT event_type,
                   LEAST(GREATEST(floor((v - 0.0) / 0.5), 0),
                         1023)::BIGINT AS bin,
                   CASE WHEN floor((v - 0.0) / 0.5) < 0
                          OR floor((v - 0.0) / 0.5) >= 1024
                        THEN 1 ELSE 0 END AS oob
            FROM v),
      h AS (SELECT event_type, bin, count(*)::BIGINT AS c,
                   sum(oob)::BIGINT AS oc
            FROM b GROUP BY 1, 2),
      cm AS (SELECT event_type, bin, c,
                    sum(c) OVER (PARTITION BY event_type
                                 ORDER BY bin)::BIGINT AS cum,
                    sum(c) OVER (PARTITION BY event_type)::BIGINT AS n,
                    sum(oc) OVER (PARTITION BY event_type)::BIGINT AS nc
             FROM h),
      qq AS (SELECT cm.*, q FROM cm,
             (SELECT unnest([0.5, 0.95, 0.99])::DOUBLE AS q)),
      rr AS (SELECT *, ceil(q * n::DOUBLE)::BIGINT AS r FROM qq)
      SELECT rr.event_type, nb.n_buckets, q, n, nc AS n_clamped,
             {fr(_hq_est, 6)} AS est
      FROM rr JOIN nb ON nb.event_type = rr.event_type
      WHERE cum - c < r AND r <= cum"""

    # Two-pass auto-range histogram quantiles: per-group exact min/max
    # discovered first, then the same binning/interpolation as
    # sk_hist_quantile with width = (hi - lo)/1024 (exact power-of-two
    # scaling); constant groups (hi = lo) degenerate to the exact point
    _hqa_w = "((hi - lo) / 1024.0)"
    _hqa_est = (f"CASE WHEN hi = lo THEN lo ELSE lo + {_hqa_w} "
                f"* (bin::DOUBLE + (r::DOUBLE - (cum - c)::DOUBLE) "
                f"/ c::DOUBLE) END")
    o["sk_hist_quantile_auto"] = f"""
      WITH v AS (SELECT event_type, value::DOUBLE AS v FROM events
                 WHERE value IS NOT NULL),
      rng AS (SELECT event_type, min(v) AS lo, max(v) AS hi
              FROM v GROUP BY 1),
      b AS (SELECT v.event_type,
                   (CASE WHEN hi = lo THEN 0
                         ELSE LEAST(GREATEST(
                                floor((v - lo) / {_hqa_w}), 0), 1023)
                    END)::BIGINT AS bin,
                   lo, hi
            FROM v JOIN rng ON v.event_type = rng.event_type),
      h AS (SELECT event_type, bin, count(*)::BIGINT AS c,
                   min(lo) AS lo, min(hi) AS hi
            FROM b GROUP BY 1, 2),
      cm AS (SELECT event_type, bin, c, lo, hi,
                    sum(c) OVER (PARTITION BY event_type
                                 ORDER BY bin)::BIGINT AS cum,
                    sum(c) OVER (PARTITION BY event_type)::BIGINT AS n
             FROM h),
      qq AS (SELECT cm.*, q FROM cm,
             (SELECT unnest([0.5, 0.95, 0.99])::DOUBLE AS q)),
      rr AS (SELECT *, ceil(q * n::DOUBLE)::BIGINT AS r FROM qq)
      SELECT event_type, q, n, lo AS v_min, hi AS v_max,
             {fr(_hqa_est, 6)} AS est
      FROM rr WHERE cum - c < r AND r <= cum"""

    # Time-bucketed HLL rollup: the oracle computes the SINGLE-PASS HLL
    # over the whole range (per-bucket partials merge to it exactly, by
    # register-wise-max associativity — that equality IS the gate) plus
    # the distinct-bucket provenance count
    _hru = duck_hash64("u::VARCHAR")
    _DAY_NS = 86_400_000_000_000
    o["sk_hll_rollup"] = f"""
      WITH v AS (SELECT event_type AS g,
                        ({EV_TIME} - {EV_TIME} % {_DAY_NS}) AS bkt,
                        user_id AS u
                 FROM events
                 WHERE user_id IS NOT NULL AND ts IS NOT NULL),
      hh AS (SELECT g, bkt, {_hru} AS h FROM v),
      bb AS (SELECT g, h % {HLL_M} AS j,
                    CASE WHEN h // {HLL_M} = 0 THEN 53
                         ELSE 53 - length(bin(h // {HLL_M})) END AS rho
             FROM hh),
      regs AS (SELECT g, j, max(rho) AS m FROM bb GROUP BY 1, 2),
      f AS (SELECT g, count(*)::BIGINT AS n_buckets_used,
                   sum(1::BIGINT << (53 - m)::INT)::BIGINT AS s_used
            FROM regs GROUP BY 1),
      t AS (SELECT g, n_buckets_used,
                   ({HLL_M} - n_buckets_used)::BIGINT AS n_empty,
                   (s_used + ({HLL_M} - n_buckets_used)
                    * (1::BIGINT << 53))::BIGINT AS s_total
            FROM f),
      nb AS (SELECT g, count(DISTINCT bkt)::BIGINT AS n_buckets
             FROM hh GROUP BY 1)
      SELECT t.g AS event_type, nb.n_buckets, t.n_buckets_used,
             t.n_empty,
             {fr(f'CASE WHEN {_hll_raw} <= {2.5 * HLL_M!r} '
                 f'AND n_empty > 0 '
                 f'THEN {float(HLL_M)!r} * ln({float(HLL_M)!r} '
                 f'/ n_empty::DOUBLE) '
                 f'ELSE {_hll_raw} END', 6)} AS est_distinct
      FROM t JOIN nb ON t.g = nb.g"""

    # Distinct-user cube off ONE register table: per-(type, day,
    # register) partials, then every grouping set merged by
    # register-wise max in one GROUPING SETS pass (register id is an
    # always-on key); level = the same GROUPING_ID bitmask the Spark
    # side emits (bit 0 = event_type aggregated out, bit 1 = day).
    o["sk_hll_cube"] = f"""
      WITH v AS (SELECT event_type AS g,
                        ({EV_TIME} - {EV_TIME} % {_DAY_NS}) AS d,
                        user_id AS u
                 FROM events
                 WHERE user_id IS NOT NULL AND ts IS NOT NULL),
      hh AS (SELECT g, d, {_hru} AS h FROM v),
      bb AS (SELECT g, d, h % {HLL_M} AS j,
                    CASE WHEN h // {HLL_M} = 0 THEN 53
                         ELSE 53 - length(bin(h // {HLL_M})) END AS rho
             FROM hh),
      part AS (SELECT g, d, j, max(rho) AS mp FROM bb GROUP BY 1, 2, 3),
      regs AS (SELECT g, d, j, max(mp) AS m,
                      (GROUPING(g) + 2 * GROUPING(d))::BIGINT AS level
               FROM part
               GROUP BY GROUPING SETS ((g, d, j), (g, j), (d, j), (j))),
      f AS (SELECT g, d, level, count(*)::BIGINT AS n_buckets_used,
                   sum(1::BIGINT << (53 - m)::INT)::BIGINT AS s_used
            FROM regs GROUP BY 1, 2, 3),
      t AS (SELECT g, d, level, n_buckets_used,
                   ({HLL_M} - n_buckets_used)::BIGINT AS n_empty,
                   (s_used + ({HLL_M} - n_buckets_used)
                    * (1::BIGINT << 53))::BIGINT AS s_total
            FROM f)
      SELECT g AS event_type, d AS day, level, n_buckets_used, n_empty,
             {fr(f'CASE WHEN {_hll_raw} <= {2.5 * HLL_M!r} '
                 f'AND n_empty > 0 '
                 f'THEN {float(HLL_M)!r} * ln({float(HLL_M)!r} '
                 f'/ n_empty::DOUBLE) '
                 f'ELSE {_hll_raw} END', 6)} AS est_distinct
      FROM t"""

    # Shuffle-key skew profile: one key-keyed count, totals as scalars,
    # top-20 by (cnt desc, key asc nulls first), integer floor division
    o["diag_skew"] = """
      WITH c AS (SELECT user_id, count(*)::BIGINT AS cnt
                 FROM events GROUP BY 1),
      s AS (SELECT sum(cnt)::BIGINT AS total_rows,
                   count(*)::BIGINT AS n_keys FROM c),
      t AS (SELECT user_id, cnt FROM c
            ORDER BY cnt DESC, user_id ASC NULLS FIRST LIMIT 20)
      SELECT t.user_id, t.cnt,
             ((t.cnt * 1000000) // s.total_rows)::BIGINT AS share_ppm,
             ((t.cnt + (s.total_rows // s.n_keys) - 1)
              // (s.total_rows // s.n_keys))::BIGINT AS salt_factor,
             s.total_rows, s.n_keys
      FROM t, s"""

    # Pairwise theta-sketch overlap matrix: one sketch per group (the
    # same rank-k build as sk_kmv at k=128), thetas with the exhaustive
    # convention, then pure set algebra over the G*k-row sketch table
    _OM_K = 128
    o["sk_overlap_matrix"] = f"""
      WITH v AS (SELECT DISTINCT l_returnflag AS g, l_orderkey AS v
                 FROM lineitem
                 WHERE l_returnflag IS NOT NULL
                   AND l_orderkey IS NOT NULL),
      hh AS (SELECT g, v, {_h64v} AS h FROM v),
      rk AS (SELECT g, h, row_number() OVER (
                 PARTITION BY g ORDER BY h ASC, v ASC) AS rn FROM hh),
      sk AS (SELECT g, h FROM rk WHERE rn <= {_OM_K}),
      summ AS (SELECT g, (CASE WHEN count(*) < {_OM_K}
                               THEN {HASH_SPACE}
                               ELSE max(h) END)::BIGINT AS theta
               FROM sk GROUP BY 1),
      pairs AS (SELECT a.g AS g_a, b.g AS g_b,
                       LEAST(a.theta, b.theta) AS theta
                FROM summ a JOIN summ b ON a.g < b.g),
      na AS (SELECT g_a, g_b, count(*)::BIGINT AS n_a
             FROM pairs p JOIN sk ON sk.g = p.g_a AND sk.h <= p.theta
             GROUP BY 1, 2),
      nb AS (SELECT g_a, g_b, count(*)::BIGINT AS n_b
             FROM pairs p JOIN sk ON sk.g = p.g_b AND sk.h <= p.theta
             GROUP BY 1, 2),
      nc AS (SELECT g_a, g_b, count(*)::BIGINT AS n_common
             FROM pairs p
             JOIN sk sa ON sa.g = p.g_a AND sa.h <= p.theta
             JOIN sk sb ON sb.g = p.g_b AND sb.h = sa.h
             GROUP BY 1, 2),
      cnt AS (SELECT p.g_a, p.g_b, p.theta,
                     coalesce(n_a, 0)::BIGINT AS n_a,
                     coalesce(n_b, 0)::BIGINT AS n_b,
                     coalesce(n_common, 0)::BIGINT AS n_common
              FROM pairs p
              LEFT JOIN na USING (g_a, g_b)
              LEFT JOIN nb USING (g_a, g_b)
              LEFT JOIN nc USING (g_a, g_b))
      SELECT g_a, g_b, theta, n_a, n_b, n_common,
             {fr(f'(n_a + n_b - n_common)::DOUBLE * {_M60} '
                 '/ theta::DOUBLE', 6)} AS est_union,
             {fr(f'n_common::DOUBLE * {_M60} / theta::DOUBLE', 6)}
               AS est_intersection,
             CASE WHEN (n_a + n_b - n_common) > 0 THEN
               {fr('n_common::DOUBLE / (n_a + n_b - n_common)::DOUBLE',
                   6)} END AS jaccard_est
      FROM cnt"""

    # sk_merge: the SINGLE-PASS kmv/hll forms — the Spark side builds
    # per-shard partial states and merges them; equality with these
    # single-pass definitions IS the mergeability (associativity) proof
    _hll_est_sql = fr(f'CASE WHEN {_hll_raw} <= {2.5 * HLL_M!r} '
                      f'AND ({HLL_M} - n_buckets_used) > 0 '
                      f'THEN {float(HLL_M)!r} * ln({float(HLL_M)!r} '
                      f'/ ({HLL_M} - n_buckets_used)::DOUBLE) '
                      f'ELSE {_hll_raw} END', 6)
    o["sk_merge"] = f"""
      WITH v AS (SELECT DISTINCT l_returnflag AS g, l_orderkey AS v
                 FROM lineitem WHERE l_orderkey IS NOT NULL),
      hh AS (SELECT g, v, {_h64v} AS h FROM v),
      rk AS (SELECT g, h, row_number() OVER (
                 PARTITION BY g ORDER BY h ASC, v ASC) AS rn FROM hh),
      kmv AS (SELECT g, count(*)::BIGINT AS kmv_k_used,
                     {fr(f'CASE WHEN count(*) < {_KMV_K} '
                         f'THEN count(*)::DOUBLE '
                         f'ELSE {float(_KMV_K - 1)!r} '
                         f'* {float(HASH_SPACE)!r} '
                         f'/ max(h)::DOUBLE END', 6)} AS kmv_est
              FROM rk WHERE rn <= {_KMV_K} GROUP BY 1),
      bb AS (SELECT g, h % {HLL_M} AS j,
                    CASE WHEN h // {HLL_M} = 0 THEN 53
                         ELSE 53 - length(bin(h // {HLL_M})) END AS rho
             FROM hh),
      regs AS (SELECT g, j, max(rho) AS m FROM bb GROUP BY 1, 2),
      f AS (SELECT g, count(*)::BIGINT AS n_buckets_used,
                   sum(1::BIGINT << (53 - m)::INT)::BIGINT AS s_used
            FROM regs GROUP BY 1),
      hll AS (SELECT g, n_buckets_used AS hll_buckets_used,
                     {_hll_est_sql} AS hll_est
              FROM (SELECT g, n_buckets_used,
                           (s_used + ({HLL_M} - n_buckets_used)
                            * (1::BIGINT << 53))::BIGINT AS s_total
                    FROM f))
      SELECT kmv.g AS l_returnflag, kmv_k_used, kmv_est,
             hll_buckets_used, hll_est
      FROM kmv JOIN hll ON kmv.g = hll.g"""
    return o
