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

__all__ = ["grouped_agg_small"]

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
