"""End-to-end training-corpus curation: the composition a pipeline
user actually runs (language allow-list -> quality gates ->
normalization -> exact dedup -> optional near-dedup -> partitioned
parquet), built from the repo's vectorized kernels so the whole flow
is ONE filter/normalize map stage plus one dedup shuffle.

Every deterministic stage is SQL-oracle-checked end to end
(doc_curation); the optional minhash stage reuses the oracle-proven
cluster machinery (ops/dedup.minhash_dedup).
"""

from __future__ import annotations

import pandas as pd

from .textstats import normalize_text, token_stats

__all__ = ["curate_documents"]


def curate_documents(ds, *, text_col="text", id_col="doc_id", lang_col="lang",
                     lang_allow=None, min_tokens=0, max_digit_ratio=1.0,
                     normalize=True, near_dedup=False, near_threshold=0.5,
                     line_dedup_words=None, num_buckets=64, out_path=None,
                     **near_kw):
    """Curated rows ``(id, lang, norm_text|text)``: language
    allow-list, token-count floor, digit-ratio ceiling (expressed as
    ``n_digits <= ratio * n_chars`` — division-free, empty-doc safe),
    optional normalization, optional CCNet-style line-level dedup
    (``line_dedup_words`` token windows; docs whose SURVIVING text is
    empty — every line duplicated, or nothing but whitespace to begin
    with — drop out), exact dedup keyed on the (normalized)
    content keeping the minimum id, optional minhash near-dedup
    keeping only cluster representatives. ``out_path`` additionally
    writes the result as lang-partitioned parquet (resumable layout).
    """
    allow = sorted(lang_allow) if lang_allow else None
    out_text = "norm_text" if normalize else text_col
    cols = [id_col, lang_col, out_text]

    def _filter_normalize(df: pd.DataFrame) -> pd.DataFrame:
        df = df[[id_col, lang_col, text_col]].copy()
        if allow:
            df = df[df[lang_col].isin(allow)]
        if not len(df):
            return pd.DataFrame({c: [] for c in cols})
        df = token_stats(df, text_col)
        keep = (df["n_tokens"] >= min_tokens) & (
            df["n_digits"] <= max_digit_ratio * df["n_chars"]
        )
        df = df[keep]
        if normalize:
            df = normalize_text(df, text_col)
        return df[cols]

    filtered = ds.map_batches(_filter_normalize, batch_format="pandas")

    if line_dedup_words:
        from .dedup import line_dedup

        filtered = line_dedup(
            filtered, text_col=out_text, id_col=id_col,
            line_words=line_dedup_words, num_buckets=num_buckets,
            keep_cols=(lang_col,),
        ).map_batches(
            # docs whose every line was a duplicate drop out
            lambda df: df.loc[df[out_text] != "", cols],
            batch_format="pandas",
        )

    # exact dedup on content, keeping full survivor rows (min id per
    # distinct content; fingerprint-bucketed shuffle, never the text)
    def _local(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            df = df.copy()
            df["_fp"] = pd.Series([], dtype="int64")
            df["_cbucket"] = pd.Series([], dtype="int32")
            return df
        out = df.loc[df.groupby(out_text)[id_col].idxmin()].copy()
        fp = pd.util.hash_pandas_object(out[out_text], index=False).to_numpy()
        out["_fp"] = fp.astype("int64")
        out["_cbucket"] = (fp % num_buckets).astype("int32")
        return out

    def _bucket_dedup(group: pd.DataFrame) -> pd.DataFrame:
        return group.loc[
            group.groupby(["_fp", out_text], sort=False)[id_col].idxmin(), cols
        ]

    deduped = (
        filtered.map_batches(_local, batch_format="pandas")
        .groupby("_cbucket")
        .map_groups(_bucket_dedup, batch_format="pandas")
    )

    if near_dedup:
        import numpy as np

        from .dedup import _int_bucket, minhash_dedup

        # the lazy deduped dataset is consumed three times below
        # (candidate pairs, cluster assignment, keep_rows) — pin it
        # once so the filter + dedup shuffle don't re-execute per
        # consumer (blocks spill to the object store as needed)
        deduped = deduped.materialize()

        clusters = minhash_dedup(
            deduped, text_col=out_text, id_col=id_col,
            threshold=near_threshold, **near_kw
        )
        # non-representatives (cluster label = min member id) form the
        # DROP set; anti-join it onto the full rows by one id-keyed
        # bucket merge, so neither side is ever broadcast
        drops = clusters.map_batches(
            lambda df: df.loc[df[id_col] != df["cluster"], [id_col]].assign(
                _kind=np.int8(1)
            ),
            batch_format="pandas",
        )
        keep_rows = deduped.map_batches(
            lambda df: df.assign(_kind=np.int8(0)), batch_format="pandas"
        )

        def _bucketize(df: pd.DataFrame) -> pd.DataFrame:
            df = df.copy()
            df["_cbucket"] = _int_bucket(
                df[id_col].to_numpy().astype("int64"), num_buckets
            )
            return df

        def _anti(bucket: pd.DataFrame) -> pd.DataFrame:
            if id_col not in bucket.columns or not len(bucket):
                return pd.DataFrame({c: [] for c in cols})
            dropset = set(bucket.loc[bucket["_kind"] == 1, id_col])
            keep = bucket[bucket["_kind"] == 0]
            if dropset:
                keep = keep[~keep[id_col].isin(dropset)]
            return keep[cols]

        deduped = (
            keep_rows.union(drops)
            .map_batches(_bucketize, batch_format="pandas")
            .groupby("_cbucket")
            .map_groups(_anti, batch_format="pandas")
        )

    if out_path:
        deduped.write_parquet(out_path, partition_cols=[lang_col])
    return deduped
