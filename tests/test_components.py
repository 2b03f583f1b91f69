"""Connected components (operators/components.py) + the near-dup corpus
dedup that consumes it (plans/export.py dedup_corpus near_threshold)."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from indigo_crawler_spark.operators.components import connected_components


def _union_find(edges):
    parent: dict = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # min-label per node, matching the operator's contract
    return {n: find(n) for n in parent}


def test_cc_matches_union_find(spark):
    """200-node deterministic pseudo-random graph (sha-derived edges, no
    RNG): operator labels == union-find labels."""
    edges = []
    for i in range(260):
        h = hashlib.sha256(f"cc:{i}".encode()).digest()
        a = int.from_bytes(h[:4], "big") % 200
        b = int.from_bytes(h[4:8], "big") % 200
        edges.append((a, b))
    want = _union_find(edges)
    df = spark.createDataFrame(edges, "a int, b int")
    got = {
        r["node"]: r["component"]
        for r in connected_components(df, "a", "b").collect()
    }
    # self-loop-only nodes are dropped by the operator (no edges to anyone)
    want = {
        n: c
        for n, c in want.items()
        if any((a == n) != (b == n) for a, b in edges)
    }
    assert got == want


def test_cc_chain_selfloops_dupes(spark):
    """A long chain (worst diameter for min-propagation), duplicate and
    reversed edges, a self-loop, and string ids (lexicographic min)."""
    chain = [(f"n{i:02d}", f"n{i + 1:02d}") for i in range(20)]
    extra = [("n05", "n04"), ("n10", "n10"), ("x2", "x1"), ("x1", "x2")]
    df = spark.createDataFrame(chain + extra, "a string, b string")
    got = {
        r["node"]: r["component"]
        for r in connected_components(df, "a", "b").collect()
    }
    for i in range(21):
        assert got[f"n{i:02d}"] == "n00"
    assert got["x1"] == "x1" and got["x2"] == "x1"


def test_dedup_near_collapses_chain(spark, tmp_path):
    """Near-dup mode: A~B and B~C pass the Jaccard threshold but A~C alone
    would not — connected components still collapse all three to ONE keeper
    (min canon_url). Exact dups collapse first; distinct text survives."""
    from indigo_crawler_spark.plans.export import (
        _write_export_manifest,
        dedup_corpus,
    )

    # 40-word texts, one word changed per link: pair jaccard = 35/41 ≈ 0.854
    # (banding miss probability ~5e-6 at b=16/r=4 — deterministic here, and
    # comfortably above the 0.8 threshold); A vs C differ in two words:
    # 32/44 ≈ 0.727 < 0.8 — below threshold, collapses only via the chain
    words = [f"w{i}" for i in range(40)]
    a = list(words)
    b = list(words)
    b[10] = "CHANGED1"
    c = list(b)
    c[30] = "CHANGED2"
    rows = [
        ("https://a.example.org/1", "a.example.org", 0, " ".join(a), 3),
        ("https://b.example.org/2", "b.example.org", 1, " ".join(b), 7),
        ("https://c.example.org/3", "c.example.org", 0, " ".join(c), 11),
        # exact dup of A under a smaller url — exact pass keeps THIS one,
        # then the near pass must keep the component min over keepers
        ("https://a.example.org/0", "a.example.org", 2, " ".join(a), 5),
        ("https://z.example.org/9", "z.example.org", 0, "totally different "
         "content with completely other tokens here now", 2),
    ]
    src = str(tmp_path / "corpus")
    df = spark.createDataFrame(
        rows, "canon_url string, host string, fetch_round int, text string, pk int"
    )
    df.repartition("pk").write.partitionBy("pk").parquet(src)
    _write_export_manifest(
        src, {"through_round": 2, "num_buckets": 16, "rows": len(rows)}
    )

    out = str(tmp_path / "dedup_near")
    rep = dedup_corpus(spark, src, out, near_threshold=0.8)
    # exact: 5 → 4 (the two copies of A collapse to /0); near: A,B,C → one
    assert rep["rows_in"] == 5
    assert rep["rows_out"] == 2
    assert rep["near_dropped"] == 2
    kept = sorted(r["canon_url"] for r in spark.read.parquet(out).collect())
    assert kept == ["https://a.example.org/0", "https://z.example.org/9"]

    # sanity on the threshold story: A~C alone is BELOW 0.8 (the chain only
    # collapses because components are transitive)
    from indigo_crawler_spark.operators.text_dedup import (
        jaccard_verify_pairs,
        word_shingles,
    )

    docs = spark.createDataFrame(
        [("A", " ".join(a)), ("C", " ".join(c))], "doc_id string, text string"
    )
    cands = spark.createDataFrame([("A", "C")], "a string, b string")
    direct = jaccard_verify_pairs(word_shingles(docs), cands, 0.8).collect()
    assert direct == []
