"""Graph analytics over link-sets: degrees and PageRank.

Both reuse the engine's shuffle discipline: degrees are a per-batch
partial count + small-bucket merge; PageRank is the same tagged
working-set pattern as ops.dedup.cluster_pairs_ds — node rows and edge
rows co-bucketed by node key, one fused shuffle per iteration
(contributions are emitted with the just-updated ranks), scalar-only
convergence signals on the driver.

PageRank semantics (fixed, deterministic): damping d, uniform
teleport, dangling mass redistributed uniformly each iteration —
identical to the dense reference iteration in tests/test_graph.py.
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def out_degrees(links_ds, num_buckets=64):
    """(origin, out_degree) for every origin — per-batch partial
    counts merged in a coarse-bucket shuffle (origins are near-unique
    keys)."""
    import pyarrow as pa

    def _partial(df: pd.DataFrame) -> pa.Table:
        g = df.groupby("origin", as_index=False).agg(out_degree=("rel", "size"))
        g["_cbucket"] = (
            pd.util.hash_pandas_object(g["origin"], index=False) % num_buckets
        ).astype("int32")
        return pa.Table.from_pandas(g, preserve_index=False)

    def _merge(bucket: pd.DataFrame) -> pd.DataFrame:
        return bucket.groupby("origin", as_index=False).agg(
            out_degree=("out_degree", "sum")
        )

    return (
        links_ds.map_batches(_partial, batch_format="pandas")
        .groupby("_cbucket")
        .map_groups(_merge, batch_format="pandas")
    )


def _iri_edges(links_ds):
    """Directed (src, dst) pairs from links whose target is an IRI —
    the entity graph underneath a link-set."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def _edges(tbl: pa.Table) -> pa.Table:
        mask = pc.and_(
            tbl["target_is_iri"], pc.is_valid(tbl["target"])
        )
        sub = tbl.filter(mask)
        return pa.table({"src": sub["origin"], "dst": sub["target"]})

    return links_ds.map_batches(_edges, batch_format="pyarrow")


def pagerank(links_ds, damping=0.85, n_iters=20, num_buckets=None):
    """Distributed PageRank over the IRI-target entity graph.

    Working-set rows (all string-keyed): kind 0 = node state
    (key=node, rank, out_deg), kind 1 = edge (key=src, dst), kind 2 =
    in-flight contribution (key=dst, rank share). One fused
    coarse-bucket shuffle per iteration: apply incoming contributions
    to this node's rank AND emit outgoing shares with the new rank.
    Dangling-node mass is summed per bucket, aggregated driver-side
    (one scalar per iteration), and re-injected uniformly next round.
    Returns a Dataset (node, rank); ranks sum to 1."""
    import ray
    import pyarrow as pa

    if num_buckets is None:
        try:
            num_buckets = max(16, int(ray.cluster_resources().get("CPU", 8)))
        except Exception:
            num_buckets = 16

    edges = _iri_edges(links_ds)

    def _init(tbl: pa.Table) -> pa.Table:
        src = tbl["src"].to_pylist()
        dst = tbl["dst"].to_pylist()
        nodes = sorted(set(src) | set(dst))
        n_e, n_n = len(src), len(nodes)
        return pa.table(
            {
                "key": pa.array(src + nodes, type=pa.string()),
                "kind": pa.array([1] * n_e + [0] * n_n, type=pa.int8()),
                "other": pa.array(dst + [None] * n_n, type=pa.string()),
                "val": pa.array([0.0] * (n_e + n_n), type=pa.float64()),
            }
        )

    work = edges.map_batches(_init, batch_format="pyarrow").materialize()

    # node count + duplicate-node-seed collapse need one pre-pass
    def _bucketize(df: pd.DataFrame) -> "pa.Table":
        df = df.copy()
        df["_cbucket"] = (
            pd.util.hash_pandas_object(df["key"], index=False) % num_buckets
        ).astype("int32")
        return pa.Table.from_pandas(df, preserve_index=False)

    def _collapse(bucket: pd.DataFrame) -> pd.DataFrame:
        edg = bucket[bucket["kind"] == 1]
        nodes = bucket[bucket["kind"] == 0].drop_duplicates("key")
        deg = edg.groupby("key").size()
        out = pd.concat(
            [
                pd.DataFrame(
                    {"key": nodes["key"].to_numpy(), "kind": np.int8(0),
                     "other": None,
                     "val": nodes["key"].map(deg).fillna(0.0).to_numpy()}
                ),
                edg[["key", "kind", "other", "val"]],
            ],
            ignore_index=True,
        )
        return out

    work = (
        work.map_batches(_bucketize, batch_format="pandas")
        .groupby("_cbucket")
        .map_groups(_collapse, batch_format="pandas")
        .materialize()
    )
    n_nodes = work.map_batches(
        lambda df: pd.DataFrame({"n": [int((df["kind"] == 0).sum())]}),
        batch_format="pandas",
    ).sum("n")
    if not n_nodes:
        import ray.data as rd

        return rd.from_arrow(
            pa.table({"node": pa.array([], type=pa.string()),
                      "rank": pa.array([], type=pa.float64())})
        )

    init_rank = 1.0 / n_nodes
    state = {"dangling": 0.0}

    for it in range(n_iters):
        first = it == 0
        dangling_in = state["dangling"]

        def _step(bucket: pd.DataFrame, first=first, dangling_in=dangling_in):
            nodes = bucket[bucket["kind"] == 0]
            edg = bucket[bucket["kind"] == 1]
            msgs = bucket[bucket["kind"] == 2]
            # node "val" holds out_degree; the round's ranks are
            # emitted as fresh kind-3 rows (stale ones are consumed
            # and dropped here each round)
            if first:
                rank = pd.Series(init_rank, index=nodes.index)
                rank_map = pd.DataFrame(
                    {"key": nodes["key"].to_numpy(), "_r": rank.to_numpy()}
                )
            else:
                contrib = (
                    msgs.groupby("key", as_index=False)["val"].sum()
                    .rename(columns={"val": "_c"})
                )
                base = pd.DataFrame({"key": nodes["key"].to_numpy()})
                base = base.merge(contrib, on="key", how="left")
                inflow = base["_c"].fillna(0.0).to_numpy()
                new_rank = (
                    (1.0 - damping) / n_nodes
                    + damping * (inflow + dangling_in / n_nodes)
                )
                rank_map = pd.DataFrame(
                    {"key": base["key"].to_numpy(), "_r": new_rank}
                )
            deg = pd.DataFrame(
                {"key": nodes["key"].to_numpy(),
                 "_d": nodes["val"].to_numpy()}
            )
            rm = rank_map.merge(deg, on="key")
            # outgoing shares along edges
            shares = edg[["key", "other"]].merge(rm, on="key", how="inner")
            share_val = np.where(
                shares["_d"].to_numpy() > 0,
                shares["_r"].to_numpy() / np.maximum(shares["_d"].to_numpy(), 1),
                0.0,
            )
            # dangling mass in this bucket (nodes with no out-edges)
            dang = float(rm.loc[rm["_d"] == 0, "_r"].sum())
            out_parts = [
                nodes[["key", "kind", "other", "val"]],
                edg[["key", "kind", "other", "val"]],
                pd.DataFrame(
                    {"key": rm["key"].to_numpy(), "kind": np.int8(3),
                     "other": None, "val": rm["_r"].to_numpy()}
                ),
                pd.DataFrame(
                    {"key": shares["other"].to_numpy(), "kind": np.int8(2),
                     "other": None, "val": share_val}
                ),
            ]
            if dang:
                out_parts.append(
                    pd.DataFrame(
                        {"key": ["__dangling__"], "kind": np.int8(4),
                         "other": None, "val": [dang]}
                    )
                )
            return pd.concat(out_parts, ignore_index=True)

        work = (
            work.map_batches(_bucketize, batch_format="pandas")
            .groupby("_cbucket")
            .map_groups(_step, batch_format="pandas")
            .materialize()
        )
        # collect this round's dangling mass (one scalar), then drop
        # the marker rows and stale contributions for the next round
        state["dangling"] = work.map_batches(
            lambda df: pd.DataFrame(
                {"d": [float(df.loc[df["kind"] == 4, "val"].sum())]}
            ),
            batch_format="pandas",
        ).sum("d") or 0.0

        def _carry(df: pd.DataFrame, last=(it == n_iters - 1)) -> pd.DataFrame:
            # bound at definition: this map executes lazily, after the
            # loop variable has moved on
            keep = (df["kind"] == 3) if last else df["kind"].isin([0, 1, 2, 3])
            return df[keep]

        work = work.map_batches(_carry, batch_format="pandas")

    def _final(df: pd.DataFrame) -> pd.DataFrame:
        lab = df[df["kind"] == 3]
        return pd.DataFrame(
            {"node": lab["key"].to_numpy(), "rank": lab["val"].to_numpy()}
        )

    return work.map_batches(_final, batch_format="pandas")
