"""Benchmark-contamination detection for training corpora.

Two forms:

* ``flag_contaminated`` — exact substring containment against a SMALL
  benchmark snippet list (eval sets are small by nature). Snippets are
  broadcast once via ray.put; matching is one vectorized
  ``str.contains`` pass per snippet (literal, not regex). Output is
  one row per contaminated document with its hit count — SQL-oracle
  checkable (DuckDB ``position(snippet IN text)``).

* ``flag_contaminated_ngrams`` — word n-gram overlap: any document
  sharing at least ``min_hits`` hashed word n-grams with the
  benchmark texts is flagged. The benchmark's n-gram hash set is
  broadcast; per-document n-gram hashing reuses the vectorized
  shingle kernel. Catches paraphrase-adjacent leakage that exact
  substrings miss.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

__all__ = ["flag_contaminated", "flag_contaminated_ngrams"]


def flag_contaminated(ds, snippets, text_col="text", id_col="doc_id"):
    """Rows ``(id, n_hits)`` for documents containing >=1 of the
    benchmark ``snippets`` as an exact substring."""
    import ray

    snips = [s for s in snippets if s]
    ref = ray.put(snips)

    def _scan(df: pd.DataFrame) -> pd.DataFrame:
        sn = ray.get(ref)
        if not len(df) or not sn:
            return pd.DataFrame({id_col: pd.Series([], dtype="int64"),
                                 "n_hits": pd.Series([], dtype="int64")})
        text = df[text_col].fillna("")
        hits = np.zeros(len(df), dtype=np.int64)
        for s in sn:
            hits += text.str.contains(s, regex=False).to_numpy()
        keep = hits > 0
        return pd.DataFrame(
            {id_col: df[id_col].to_numpy()[keep], "n_hits": hits[keep]}
        )

    return ds.map_batches(_scan, batch_format="pandas")


def flag_contaminated_ngrams(ds, benchmark_texts, n=8, min_hits=1,
                             text_col="text", id_col="doc_id"):
    """Rows ``(id, n_hits)`` for documents sharing >= ``min_hits``
    word n-grams (hashed) with any benchmark text."""
    import ray

    from .dedup import _shingle_hashes

    bench = set()
    for t in benchmark_texts:
        bench.update(_shingle_hashes(t or "", k=n).tolist())
    ref = ray.put(np.fromiter(bench, dtype=np.uint64, count=len(bench)))

    def _scan(df: pd.DataFrame) -> pd.DataFrame:
        barr = ray.get(ref)
        ids, hits = [], []
        for i, t in zip(df[id_col], df[text_col].fillna("")):
            h = _shingle_hashes(t, k=n)
            if not len(h):
                continue
            cnt = int(np.isin(np.unique(h), barr, assume_unique=True).sum())
            if cnt >= min_hits:
                ids.append(i)
                hits.append(cnt)
        return pd.DataFrame(
            {id_col: pd.Series(ids, dtype="int64"),
             "n_hits": pd.Series(hits, dtype="int64")}
        )

    return ds.map_batches(_scan, batch_format="pandas")
