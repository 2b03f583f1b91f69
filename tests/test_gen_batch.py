"""rows_batch must be bit-identical to the normative row-wise generator —
the r6 bootstrap optimization rides on this equivalence (the synthetic
corpus feeds the bench whose urls_scheduled is pinned across rounds)."""

from __future__ import annotations

from fixtures.gen import PagesSpec


def _cmp(spec: PagesSpec, ids: list[int]) -> None:
    batch = spec.rows_batch(ids)
    rows = [spec.row(i) for i in ids]
    for k in ("url", "warc_ts", "html", "text", "lang"):
        got = batch[k]
        want = [r[k] for r in rows]
        assert got == want, f"field {k} diverged for ids {ids[:5]}..."


def test_rows_batch_matches_rowwise_all_cohorts():
    # 7/11/13 cohort interactions, plus the 13*7=91 and 11*13=143 overlaps
    spec = PagesSpec(5000, 200)
    _cmp(spec, list(range(0, 300)))
    _cmp(spec, [91, 143, 77, 1001, 4999, 0])


def test_rows_batch_matches_rowwise_sparse_large():
    spec = PagesSpec(200_000, 5000)
    ids = [0, 1, 12, 13, 14, 76, 77, 78, 90, 91, 142, 143, 1000, 99999, 199999]
    ids += [i * 7919 % 200_000 for i in range(50)]
    _cmp(spec, ids)


def test_rows_batch_empty():
    spec = PagesSpec(100, 10)
    out = spec.rows_batch([])
    assert out["url"] == [] and out["html"] == []
