"""Meta-test — determinism rules enforced by grep (SURVEY.md §5).

The engine package must contain no RNG, no wall-clock, no classic per-row
``udf(`` (BASELINE.json:15), and no ``collect()`` in the round path other
than the sanctioned small aggregates (counters, lineage digests, emitted-pk
pruning list — all O(P) or O(counters), never O(rows)).
"""

from __future__ import annotations

import re
from pathlib import Path

ENGINE = Path(__file__).resolve().parent.parent / "indigo_crawler_spark"

BANNED = [
    (r"\brandom\b", "RNG"),
    (r"\btime\.time\(", "wall clock"),
    (r"\buuid\b", "uuid"),
    (r"(?<![\w.])udf\(", "classic per-row udf"),
    (r"\bdatetime\.now\b", "wall clock"),
]

# files allowed to call .collect()/.isEmpty() — each use is O(P) or O(1)
# (similarity.py: the IVF index build collects ≤n_centroids vectors once;
# export.py: the incremental export's affected-pk list is ≤num_buckets rows;
# components.py: one single-row convergence count per propagation iteration;
# sharding.py: the prefix-sum offsets collect is one row per partition;
# pagerank.py: one scalar dangling-mass aggregate per iteration)
COLLECT_ALLOWED = {
    "round.py", "lineage.py", "skew.py", "politeness.py", "skin.py",
    "similarity.py", "export.py", "components.py", "sharding.py",
    "pagerank.py",
}


def _sources():
    return sorted(ENGINE.rglob("*.py"))


def test_no_banned_tokens():
    for path in _sources():
        src = path.read_text()
        for pat, why in BANNED:
            assert not re.search(pat, src), f"{path.name}: banned token ({why})"


def test_collect_only_where_sanctioned():
    for path in _sources():
        src = path.read_text()
        if re.search(r"\.collect\(\)|\.isEmpty\(\)|\.toPandas\(\)", src):
            assert path.name in COLLECT_ALLOWED, (
                f"{path.name}: driver-side materialization outside sanctioned files"
            )


def test_oracle_shares_kernels():
    sim = (Path(__file__).resolve().parent.parent / "oracle" / "simulator.py").read_text()
    for kernel in ("canonicalize", "priority", "robots", "textextract"):
        assert f"kernels.{kernel}" in sim, f"oracle must import shared kernel {kernel}"
