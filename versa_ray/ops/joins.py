"""Temporal joins Ray Data lacks natively.

``asof_join``: for each left row, the single most recent right row
with ``right[on] <= left[on]`` (direction='backward'; 'forward' /
'nearest' per pandas) sharing the same ``by`` key. One tagged union
shuffled on a coarse hash bucket of ``by``; inside the bucket a
sorted ``pandas.merge_asof`` does the per-key matching (C-speed).

PARTITIONING ASSUMPTION (documented): all rows of one ``by`` key
co-locate in one bucket task — the standard as-of requirement; a
pathologically hot key needs salting by time range plus a boundary
pass, which this implementation does not do.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

__all__ = ["asof_join", "range_join"]


def asof_join(left, right, on="ts", by="user_id", right_cols=(),
              suffix="_r", direction="backward", num_buckets=32,
              inner=True):
    """Returns left columns + ``{on}{suffix}`` (the matched right
    timestamp) + each requested right column renamed with ``suffix``.
    ``inner=True`` drops left rows with no match (DuckDB ASOF JOIN
    semantics — the oracle surface); ``inner=False`` keeps them with
    nulls. Right columns are suffixed BEFORE the tagged union, and
    the union's null-filled right-side columns are dropped from the
    left inside the bucket, so the output schema is exactly
    left + suffixed-right. ``by`` keys are bucketed with a
    dtype-normalized hash (coarse_bucket) so an int32 right key still
    co-locates with an int64 left key."""
    from .dedup import coarse_bucket

    right_cols = [c for c in right_cols if c not in (on, by)]
    out_right = [on + suffix] + [c + suffix for c in right_cols]

    sch = left.schema(fetch_if_missing=False)
    if sch is not None:
        collide = set(sch.names) & set(out_right)
        if collide:
            raise ValueError(
                f"left columns {sorted(collide)} collide with suffixed "
                f"right output names; pass a different suffix"
            )

    def _tag_left(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["_kind"] = np.int8(1)
        df["_cbucket"] = coarse_bucket(df, [by], num_buckets)
        return df

    def _tag_right(df: pd.DataFrame) -> pd.DataFrame:
        out = df[[by, on] + right_cols].rename(
            columns={c: c + suffix for c in [on] + right_cols}
        )
        out["_kind"] = np.int8(0)
        out["_cbucket"] = coarse_bucket(out, [by], num_buckets)
        return out

    def _join(bucket: pd.DataFrame) -> pd.DataFrame:
        if "_kind" not in bucket.columns or not len(bucket):
            return pd.DataFrame()
        drop = ["_kind", "_cbucket"]
        l = bucket[bucket["_kind"] == 1].drop(columns=drop + out_right,
                                              errors="ignore")
        if not len(l):
            return pd.DataFrame(columns=list(l.columns) + out_right)
        r = bucket[bucket["_kind"] == 0][[by] + out_right]
        l = l.sort_values(on, kind="stable")
        r = r.sort_values(on + suffix, kind="stable")
        m = pd.merge_asof(
            l, r, left_on=on, right_on=on + suffix, by=by,
            direction=direction,
        )
        if inner:
            m = m[m[on + suffix].notna()]
        return m

    tagged = left.map_batches(_tag_left, batch_format="pandas").union(
        right.map_batches(_tag_right, batch_format="pandas")
    )
    return tagged.groupby("_cbucket").map_groups(_join, batch_format="pandas")


def range_join(left, right, on="ts", by="user_id",
               start_col="session_start", end_col="session_end",
               right_cols=(), suffix="_r", num_buckets=32):
    """Interval join for NON-OVERLAPPING per-key intervals (sessions,
    validity windows, SCD-style ranges): each left row matches the
    interval containing ``left[on]``. Because intervals don't overlap
    per key, this reduces to an as-of backward match on the interval
    start followed by an end-bound filter — one shuffle, no per-key
    cartesian product. Overlapping intervals need an interval-tree
    bucket variant (not implemented; documented limit). Inner-join
    semantics: rows outside every interval are dropped.

    Output: left columns + ``{start_col}{suffix}`` /
    ``{end_col}{suffix}`` + requested right columns with ``suffix``."""
    extra = [c for c in right_cols if c not in (start_col, end_col, by)]

    def _prep(df: pd.DataFrame) -> pd.DataFrame:
        out = df[[by, start_col, end_col] + extra].rename(
            columns={start_col: on}
        )
        return out

    prepped = right.map_batches(_prep, batch_format="pandas")
    out = asof_join(
        left, prepped, on=on, by=by, right_cols=[end_col] + extra,
        suffix=suffix, direction="backward", num_buckets=num_buckets,
        inner=True,
    )

    def _bound(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df[end_col + suffix] >= df[on]]
        return df.rename(columns={on + suffix: start_col + suffix})

    return out.map_batches(_bound, batch_format="pandas")
