"""Grouped aggregation for SMALL group cardinality.

Ray's ``Dataset.groupby().aggregate()`` runs a sort-based all-to-all
shuffle whose fixed cost (~1.5 s at 32 cpus) dwarfs rollup-style
aggregates whose group count is tiny (TPC-H Q1 has 6 groups). For
those, a per-batch pandas combine followed by ONE single-block
repartition and a final combine is both faster and shuffle-free: the
repartitioned intermediate is ``groups x blocks`` rows (bounded —
at 10k blocks and 6 groups it is 60k rows), so the single final task
is never the bottleneck. NOT for high-cardinality keys: use
``Dataset.groupby`` or ``bucketed_group_apply`` there.
"""

from __future__ import annotations

import pandas as pd

__all__ = ["grouped_agg_small", "grouped_topk", "approx_quantiles"]

_FINAL_HOW = {"sum": "sum", "size": "sum", "count": "sum", "min": "min", "max": "max"}


def grouped_agg_small(ds, keys, spec):
    """``spec``: {out_col: (src_col, how)} with how in
    sum / size / count / min / max (two-phase decomposable only —
    mean needs its own sum+count)."""
    keys = list(keys)
    for out, (_src, how) in spec.items():
        if how not in _FINAL_HOW:
            raise ValueError(f"{how!r} is not two-phase decomposable")
    partial_spec = {out: (src, how) for out, (src, how) in spec.items()}
    final_spec = {out: (out, _FINAL_HOW[how]) for out, (_src, how) in spec.items()}

    def _partial(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby(keys, as_index=False).agg(**partial_spec)

    def _final(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby(keys, as_index=False).agg(**final_spec)

    return (
        ds.map_batches(_partial, batch_format="pandas")
        .repartition(1)
        .map_batches(_final, batch_format="pandas")
    )


def grouped_topk(ds, keys, order_by, k=1, ascending=False, tie_cols=None,
                 num_buckets=64):
    """Top-k rows per group — the "best N docs per domain/language"
    primitive. Two-phase: every batch keeps its LOCAL top-k per group
    (combiner — at most ``groups x k`` rows per batch survive), then
    one coarse-bucket shuffle on the group keys finalizes. Adds a
    ``rank`` column (1..k). Ties on ``order_by`` are broken by
    ``tie_cols`` when given; with no tie_cols the order among ties is
    partition-dependent — pass tie_cols for deterministic output.
    """
    from .dedup import bucketed_group_apply

    keys = list(keys)
    order_cols = [order_by] if isinstance(order_by, str) else list(order_by)
    ties = list(tie_cols or [])
    sort_cols = order_cols + ties
    asc = [ascending] * len(order_cols) + [True] * len(ties)

    def _local(df: pd.DataFrame) -> pd.DataFrame:
        return (
            df.sort_values(sort_cols, ascending=asc, kind="mergesort")
            .groupby(keys, sort=False)
            .head(k)
        )

    def _final(group: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        g = group.sort_values(sort_cols, ascending=asc,
                              kind="mergesort").head(k).copy()
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g

    return bucketed_group_apply(
        ds.map_batches(_local, batch_format="pandas"), keys, _final,
        num_buckets=num_buckets,
    )


def approx_quantiles(ds, col, qs, per_batch_samples=256):
    """Approximate quantiles of a numeric column via a mergeable
    per-batch summary: each batch contributes
    ``per_batch_samples`` stratum-center order statistics weighted by
    ``batch_rows / samples`` (extreme quantiles are therefore
    interpolated within the outer strata, not the exact min/max).
    Driver-side merge cost is ``blocks x samples`` rows — bounded by
    the block count, never the corpus. Monotone in qs; per-batch rank
    error is O(1/samples).

    Returns a list of floats aligned with ``qs``."""
    import numpy as np

    k = int(per_batch_samples)

    def _summary(df: pd.DataFrame) -> pd.DataFrame:
        v = pd.to_numeric(df[col], errors="coerce").dropna().to_numpy(
            dtype=float)
        if not len(v):
            return pd.DataFrame({"value": [], "weight": []})
        v.sort()
        if len(v) <= k:
            return pd.DataFrame(
                {"value": v, "weight": np.ones(len(v))})
        # stratum-CENTER order statistics: each sample represents the
        # stratum around it, so its weight centroid is unbiased —
        # edge sampling (including the batch max) biases tail
        # quantiles high by up to a stratum width
        idx = ((np.arange(k) + 0.5) * len(v) / k).astype(int)
        return pd.DataFrame(
            {"value": v[idx], "weight": np.full(k, len(v) / k)})

    parts = ds.map_batches(_summary, batch_format="pandas").to_pandas()
    if not len(parts):
        return [float("nan")] * len(qs)
    order = np.argsort(parts["value"].to_numpy())
    vals = parts["value"].to_numpy()[order]
    w = parts["weight"].to_numpy()[order]
    cum = np.cumsum(w)
    total = cum[-1]
    # centroid positions (cum - w/2): the standard weighted-percentile
    # convention — picking the first sample with cum >= q*total has a
    # systematic +half-sample-weight bias that shows up in heavy tails
    pos = cum - w / 2.0
    return [
        float(np.interp(q * total, pos, vals)) for q in qs
    ]
