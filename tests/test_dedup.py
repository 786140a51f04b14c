"""Hard evidence for the oracle-less fast-path dedup key (VERDICT r4 #4).

`doc_near_dups_fast` is ROWS_ONLY in the driver contract: its xxhash64
signature hashing has no DuckDB mirror. Its correctness evidence is this
pin instead: the exact-Jaccard VERIFY stage runs on every LSH candidate
pair, so the signature hash function can only affect LSH recall, never a
reported pair's jaccard value. On the sf0.01 gate data both hash choices
must surface the identical verified pair set as the fully oracle-gated
md5 twin `doc_near_dups`.
"""

import os

import pytest

SF_DIR = "/root/testdata/sf0.01"


@pytest.mark.skipif(not os.path.isdir(SF_DIR), reason="gate data absent")
def test_fast_path_pairs_match_md5_twin(spark):
    import __spark_entry__ as entry

    qs = entry.queries()
    fast = {(r["id_a"], r["id_b"], r["jaccard"])
            for r in qs["doc_near_dups_fast"](spark, SF_DIR).collect()}
    md5 = {(r["id_a"], r["id_b"], r["jaccard"])
           for r in qs["doc_near_dups"](spark, SF_DIR).collect()}
    assert len(md5) > 0, "gate data should contain planted near-dups"
    assert fast == md5, (
        f"fast-only: {sorted(fast - md5)[:5]} md5-only: {sorted(md5 - fast)[:5]}")
