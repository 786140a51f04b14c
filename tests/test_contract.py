"""Driver-contract hygiene: queries()/oracle_sql() stay in sync."""

import __spark_entry__ as entry
import oracles

# rows-only by design: the xxhash64 fast-path variant is the only query
# left without a DuckDB mirror (xxhash64 doesn't exist there; the md5-path
# twin doc_near_dups is fully oracle-gated). Canonical set lives in the
# entry module so queries() can sink these keys past the driver's window.
ROWS_ONLY = entry.ROWS_ONLY


def test_every_query_has_oracle_or_is_rows_only():
    qs = set(entry.queries())
    os_ = set(entry.oracle_sql())
    assert os_ <= qs, f"orphan oracles: {os_ - qs}"
    assert qs - os_ == ROWS_ONLY, f"missing oracles: {qs - os_ - ROWS_ONLY}"


def test_oracles_module_matches_entry():
    assert entry.oracle_sql() == oracles.build_oracles()


def test_queries_are_callable():
    for name, fn in entry.queries().items():
        assert callable(fn), name


def test_anchor_allotment_self_tunes(monkeypatch):
    """Anchors take only the window slots pending keys leave free: a
    heavy round trims them (possibly to zero); a quiet round restores
    the full per-family pool at the head."""
    import __spark_entry__ as e

    all_keys = [k for fam in e._FAMILIES for k in fam]
    # quiet round: everything already driver-green
    monkeypatch.setattr(e, "_driver_green_keys", lambda: set(all_keys))
    order = list(e.queries())
    assert order[:len(e._ANCHOR_POOL)] == e._ANCHOR_POOL
    # heavy round: nothing green -> every slot goes to pending keys
    monkeypatch.setattr(e, "_driver_green_keys", lambda: set())
    order = list(e.queries())
    window = order[:e._DRIVER_WINDOW]
    assert all(k not in e.ROWS_ONLY for k in window)
    # with zero green keys, anchors are pending themselves and must not
    # consume extra slots ahead of the interleave
    assert len(set(window)) == e._DRIVER_WINDOW


def test_oracle_output_types_fetch_losslessly():
    """r9 guard (prescribed by the r8 verdict after the 4-round
    ts_pettitt saga): DuckDB's sum(BIGINT) and HUGEINT arithmetic
    produce HUGEINT output columns, which a DataFrame/Arrow fetch
    converts to float64/decimal128 — so a driver harness hashes 3.0
    where Spark sends int64 3, while the local gate's fetchall()
    returns exact Python ints and stays green.  Exactly the two
    HUGEINT-emitting oracles (ts_pettitt, ts_pettitt_means) were the
    only driver-red keys for four rounds.  This test binds every
    oracle_sql() relation and rejects any output column whose DuckDB
    type is not in the small fetch-path-invariant allowlist, so
    writing `sum(bigint)` uncast into an oracle SELECT list fails CI
    immediately instead of after a driver round."""
    import os

    import duckdb

    sf = "/root/testdata/sf0.001"
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events", "documents", "embeddings"]:
        p = os.path.join(sf, f"{t}.parquet")
        if os.path.exists(p):
            con.sql(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    # Types whose Python value is identical under fetchall(), .df() and
    # .arrow() round-trips.  Notably ABSENT: HUGEINT/UHUGEINT (float64
    # under .df()), DECIMAL (Decimal vs float), FLOAT (float32 widening),
    # UBIGINT (overflows int64), TIMESTAMP/DATE (tz-dependent renders —
    # the engine's contract is int64 nanoseconds at the edges).
    allowed = {"VARCHAR", "DOUBLE", "BIGINT", "BOOLEAN", "INTEGER",
               "SMALLINT", "TINYINT"}
    bad = {}
    for name, sql in entry.oracle_sql().items():
        rel = con.sql(sql)  # binds + plans; does not execute
        offending = [f"{c}:{t}" for c, t in zip(rel.columns, rel.types)
                     if str(t) not in allowed]
        if offending:
            bad[name] = offending
    assert not bad, f"oracles with fetch-lossy output types: {bad}"


def test_every_query_has_a_pinned_plan_fingerprint():
    """r8 guard (prescribed by the r7 verdict after two rounds shipped a
    new key unpinned): a queries() entry without a PLAN_FINGERPRINTS.json
    row has no plan-shape regression cover — the round-end ritual must
    run `tools/plan_fingerprints.py --record` after adding keys. This
    test makes that step un-skippable."""
    import json
    import os

    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "PLAN_FINGERPRINTS.json")
    with open(path) as f:
        pinned = set(json.load(f))
    qs = set(entry.queries())
    assert qs <= pinned, f"unpinned queries (run --record): {qs - pinned}"
    assert pinned <= qs, f"stale fingerprints (re-record): {pinned - qs}"
