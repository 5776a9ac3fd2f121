"""URL normalization and host analytics for web-page corpora.

The canonicalization rules are the standard crawl-dedup set (lowercase
scheme/host, default-port strip, fragment drop, tracking-param removal,
query-param sort, empty path -> '/') — every rule is replayable in
DuckDB SQL (the ``doc_url_normalize`` oracle runs the same regexes and
list ops), which pins the semantics.

Everything is vectorized pandas string kernels; the query-param
filter/sort is explode -> vectorized filter -> sort -> groupby-join,
no per-row Python. Per-host rollups ride the existing
``grouped_agg_small`` / coarse-bucket shuffle patterns.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

# two-level public suffixes we recognize for registered-domain
# extraction (a small deliberate subset of the PSL — the full list is
# data, not logic; swap in the real PSL file in production)
PUBLIC_SUFFIXES_2 = frozenset({
    "co.uk", "org.uk", "ac.uk", "gov.uk",
    "com.au", "net.au", "org.au",
    "co.jp", "ne.jp", "or.jp",
    "com.br", "com.cn", "co.in", "co.nz", "co.za",
})

TRACKING_PARAMS = frozenset({"fbclid", "gclid"})  # plus any utm_* name

_DEFAULT_PORTS = {"http": "80", "https": "443"}


def parse_urls(batch: pd.DataFrame, url_col: str = "url") -> pd.DataFrame:
    """Split ``url_col`` into normalized components + a canonical form.

    Adds columns: ``scheme`` (lowercased), ``host`` (lowercased, no
    port), ``port`` ('' when absent or the scheme default), ``path``
    ('/' when empty), ``query`` (tracking params removed, rest sorted),
    ``reg_domain`` (registered domain via a two-level-suffix rule) and
    ``canonical_url``."""
    s = batch[url_col].fillna("")
    out = batch.copy()

    scheme = s.str.extract(r"^([A-Za-z][A-Za-z0-9+.\-]*)://", expand=False)
    scheme = scheme.fillna("").str.lower()
    nofrag = s.str.replace(r"#.*$", "", regex=True)
    rest = nofrag.str.replace(r"^[A-Za-z][A-Za-z0-9+.\-]*://", "", regex=True)
    authority = rest.str.extract(r"^([^/?]*)", expand=False).fillna("")
    hostport = authority.str.lower()
    host = hostport.str.extract(r"^([^:]*)", expand=False).fillna("")
    port = hostport.str.extract(r":([0-9]+)$", expand=False).fillna("")
    default = scheme.map(_DEFAULT_PORTS).fillna("")
    port = port.where(port != default, "")

    tail = rest.str.replace(r"^[^/?]*", "", regex=True)
    path = tail.str.extract(r"^([^?]*)", expand=False).fillna("")
    path = path.where(path != "", "/")
    query = tail.str.extract(r"\?(.*)$", expand=False).fillna("")

    out["scheme"] = scheme
    out["host"] = host
    out["port"] = port
    out["path"] = path
    out["query"] = _clean_query(query)
    out["reg_domain"] = registered_domain(host)
    canon = scheme + "://" + host
    canon = canon + np.where(out["port"] != "", ":" + out["port"], "")
    canon = canon + path
    canon = canon + np.where(out["query"] != "", "?" + out["query"], "")
    out["canonical_url"] = np.where((scheme != "") & (host != ""), canon, "")
    return out


def _clean_query(query: pd.Series) -> pd.Series:
    """Drop tracking params (utm_*, fbclid, gclid), sort the rest —
    explode/filter/sort/groupby-join, all C passes."""
    query = query.reset_index(drop=True)
    ps = query.str.split("&").explode()
    ps = ps[(ps != "") & ps.notna()]
    if not len(ps):
        return pd.Series(np.full(len(query), "", dtype=object))
    name = ps.str.extract(r"^([^=]*)", expand=False)
    keep = ~(name.str.startswith("utm_") | name.isin(TRACKING_PARAMS))
    ps = ps[keep]
    fr = pd.DataFrame({"_i": ps.index, "p": ps.to_numpy()})
    fr = fr.sort_values(["_i", "p"], kind="stable")
    joined = fr.groupby("_i", sort=False)["p"].agg("&".join)
    return pd.Series(joined.reindex(range(len(query))).fillna("").to_numpy())


def registered_domain(host: pd.Series) -> pd.Series:
    """eTLD+1 under the two-level-suffix rule: 'a.b.example.co.uk' ->
    'example.co.uk', 'a.example.com' -> 'example.com'."""
    host = host.fillna("")
    last2 = host.str.extract(r"([^.]+\.[^.]+)$", expand=False).fillna("")
    last3 = host.str.extract(r"([^.]+\.[^.]+\.[^.]+)$", expand=False).fillna("")
    use3 = last2.isin(PUBLIC_SUFFIXES_2) & (last3 != "")
    out = np.where(use3, last3, np.where(last2 != "", last2, host))
    return pd.Series(out, index=host.index)


def host_doc_counts(ds, url_col: str = "url", small: bool = True):
    """Documents per registered domain — the crawl-health rollup.
    Registered-domain cardinality is tiny relative to the corpus, so
    the default is the partial-combine + single-merge shape
    (``grouped_agg_small``); pass ``small=False`` for the full
    hash-shuffle groupby when domain cardinality is itself web-scale."""
    from .agg import grouped_agg_small

    def _domains(df: pd.DataFrame) -> pd.DataFrame:
        parsed = parse_urls(df[[url_col]], url_col)
        return pd.DataFrame({"reg_domain": parsed["reg_domain"],
                             "n_docs": np.ones(len(parsed), dtype="int64")})

    mapped = ds.map_batches(_domains, batch_format="pandas")
    if small:
        return grouped_agg_small(mapped, ["reg_domain"],
                                 {"n_docs": ("n_docs", "sum")})
    return mapped.groupby("reg_domain").sum("n_docs")
