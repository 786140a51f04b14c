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
