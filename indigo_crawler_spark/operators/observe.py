"""A8 — single-pass counters via ``DataFrame.observe`` (SURVEY.md §2.5).

Since build round 2 this IS how every round/bootstrap counter is computed
(plans/round.py attaches Observations to frames that materialize anyway —
zero extra counting jobs, still bit-equal to the oracle in T2). This helper
remains the reusable write-and-observe wrapper for ad-hoc callers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F


def observed_write(df: DataFrame, write_fn, metrics: dict[str, "F.Column"]) -> dict:
    """Attach named aggregate metrics to *df*, run ``write_fn(observed_df)``
    (any single action), return the collected metric values.

    Example::

        counts = observed_write(
            frontier_next,
            lambda d: io.write(d, f"frontier/round={r+1}"),
            {"rows": F.count(F.lit(1)),
             "new": F.sum((F.col("discovered_round") == r + 1).cast("long"))},
        )
    """
    obs = Observation()
    names = list(metrics)
    observed = df.observe(obs, *[metrics[n].alias(n) for n in names])
    write_fn(observed)
    got = obs.get
    return {n: got[n] for n in names}
