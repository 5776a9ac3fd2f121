"""Deterministic sampling for training-data curation.

Sampling at corpus scale must be (a) reproducible across re-runs and
re-executed tasks (no RNG state), and (b) combiner-decomposable so no
stage materializes a group. Both forms rank rows by the md5 of their
id — a stable uniform order any SQL engine can reproduce (DuckDB
``md5(cast(id AS varchar))``), which is what makes these operators
oracle-checkable — and keep the n smallest per stratum via per-batch
partial top-n + one coarse-bucket merge. The per-batch partial bounds
every intermediate at ``groups x n`` rows regardless of corpus size.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

__all__ = ["stratified_sample", "uniform_sample"]


def _rank_keys(ids) -> np.ndarray:
    return np.array(
        [hashlib.md5(str(i).encode()).hexdigest() for i in ids], dtype=object
    )


def stratified_sample(ds, group_col: str, n_per_group: int, id_col: str,
                      num_buckets: int = 64):
    """n_per_group rows per stratum, chosen by md5(id) rank (ties by
    id). Per-batch partial top-n, then a per-group merge shuffled on a
    coarse hash bucket of the stratum key."""
    from .dedup import bucketed_group_apply

    def _partial(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return df
        df = df.assign(_rk=_rank_keys(df[id_col]))
        return (
            df.sort_values(["_rk", id_col])
            .groupby(group_col, sort=False)
            .head(n_per_group)
        )

    def _final(group: pd.DataFrame) -> pd.DataFrame:
        return (
            group.sort_values(["_rk", id_col])
            .head(n_per_group)
            .drop(columns=["_rk"])
        )

    partials = ds.map_batches(_partial, batch_format="pandas")
    return bucketed_group_apply(partials, [group_col], _final,
                                num_buckets=num_buckets)


def uniform_sample(ds, n: int, id_col: str):
    """n rows globally, by md5(id) rank. Partials bound the merge input
    at ``blocks x n`` rows; the final merge is one small task."""

    def _partial(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return df
        df = df.assign(_rk=_rank_keys(df[id_col]))
        return df.sort_values(["_rk", id_col]).head(n)

    def _final(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values(["_rk", id_col]).head(n).drop(columns=["_rk"])

    return (
        ds.map_batches(_partial, batch_format="pandas")
        .repartition(1)
        .map_batches(_final, batch_format="pandas")
    )
