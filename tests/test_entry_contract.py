"""T4 — driver-contract smoke: entry() runs and yields a stable schema;
queries()/oracle_sql() keys line up. (The full DuckDB value comparison runs
in tools/check_contract.py and in the driver's own verify.)"""

from __future__ import annotations

import __spark_entry__ as entrymod


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert df.columns == [
        "round", "batch_id", "canon_url", "host", "host_hash",
        "priority", "rank_in_host", "global_rank", "status",
    ]
    # rounds 0 and 1 both emitted something (discovery worked)
    assert {r["round"] for r in rows} == {0, 1}


def test_query_keys_superset_of_oracle(spark):
    qs, oq = entrymod.queries(), entrymod.oracle_sql()
    assert set(oq).issubset(set(qs))
    assert len(qs) >= 30
    # rows-only entries are intentional: xxhash64-based signatures (DuckDB
    # has no xxhash64), float fold order, and HLL sketches
    rows_only = set(qs) - set(oq)
    assert rows_only == {
        "xxhash64_hosts",
        "minhash_lsh_pairs",
        "simhash_pairs",
        "cosine_topk",
        "ann_lsh_topk",
        "ivf_topk",
        "approx_count_distinct",
    }


def test_anti_join_nonempty(spark):
    df = entrymod.queries()["anti_join"](spark, "/root/testdata/sf0.001")
    assert df.count() > 0
