"""Gazetteer mention detection — the "batched mention detection"
stage of a KG-construction pipeline: find known entity surface forms
in free text and emit (doc, entity) candidate links.

Shaped as a stateful ACTOR-POOL stage: the gazetteer's per-surface
patterns are compiled ONCE per actor in ``__init__`` (the pattern set
is the expensive part for real gazetteers with 10^5+ surfaces), and
``__call__`` runs vectorized pandas ``str.contains`` kernels per
batch — a loop over the bounded surface set, never over rows.

Match contract (shared with the SQL oracle): a surface mentions a doc
iff it appears in the lowercased text as a whole token run — not
flanked by ``[a-z0-9]``. Python uses lookarounds; the DuckDB oracle
pads the text with '#' and uses character classes (RE2 has no
lookarounds) — equivalent for presence testing.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd


def _surface_pattern(surface: str) -> str:
    return r"(?<![a-z0-9])" + re.escape(surface.lower()) + r"(?![a-z0-9])"


class GazetteerMentions:
    """map_batches(GazetteerMentions, fn_constructor_args=(gaz,),
    concurrency=N) — emits one row per (doc, matched entity):
    ``(doc_id, surface, entity)``."""

    def __init__(self, gazetteer: dict):
        # surface form -> entity IRI; patterns compiled once per actor
        self.entries = [
            (s.lower(), iri, re.compile(_surface_pattern(s)))
            for s, iri in sorted(gazetteer.items())
        ]

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        low = df["text"].fillna("").str.lower()
        ids = df["doc_id"].to_numpy()
        out_id, out_s, out_e = [], [], []
        for surface, iri, pat in self.entries:
            hit = low.str.contains(pat).to_numpy()
            if hit.any():
                sel = ids[hit]
                out_id.extend(sel.tolist())
                out_s.extend([surface] * len(sel))
                out_e.extend([iri] * len(sel))
        return pd.DataFrame(
            {"doc_id": np.array(out_id, dtype=np.int64),
             "surface": np.array(out_s, dtype=object),
             "entity": np.array(out_e, dtype=object)})


def detect_mentions(ds, gazetteer: dict, concurrency=4):
    """Run the mention stage as an actor pool over the corpus."""
    return ds.map_batches(
        GazetteerMentions,
        fn_constructor_args=(gazetteer,),
        concurrency=concurrency,
        batch_format="pandas",
    )
