"""A8 — single-pass counters via ``DataFrame.observe`` (SURVEY.md §2.5).

The default round counts with separate (cached) actions for oracle-equality
testing; at scale, attach an Observation to a DataFrame that is about to be
written anyway and read the metrics after the action — zero extra passes.
Used by callers that want counters without the extra jobs.
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
