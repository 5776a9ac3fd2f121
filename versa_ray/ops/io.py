"""Row-oriented text sinks for document corpora.

``write_jsonl_ds`` is the trainer-handoff format: one JSON object per
line, sharded files, written through the same resolved-pyarrow-
FileSystem contract as the link-set text sinks
(model/linkset._resolve_sink) so shards land in ONE target filesystem
on a multi-node cluster — never scattered worker-local files.
"""

from __future__ import annotations

import pandas as pd


def write_jsonl_ds(ds, path: str, columns=None, filesystem=None):
    """Shard-write a Dataset as JSON Lines (utf-8, one object/line,
    ``part-<uuid>.jsonl`` files). ``columns`` restricts the output
    fields. Returns the list of shard paths (file-count cardinality,
    safe to collect). Binary columns are not JSON-serializable —
    select or decode them first.

    Retry caveat (inherited from the text-sink pattern): a Ray task
    retried after its shard write succeeded leaves an orphan
    part-<uuid> file. Consume the RETURNED path list, or write to a
    fresh directory per attempt, rather than globbing the directory
    after a run with failures."""
    import json

    from ..model.linkset import _resolve_sink, _write_shard

    fs_, root = _resolve_sink(path, filesystem)
    if columns is not None:
        ds = ds.select_columns(list(columns))

    def _dump(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({"file": pd.Series([], dtype=object)})
        text = df.to_json(
            orient="records", lines=True, force_ascii=False,
            date_format="iso",
        )
        if not text.endswith("\n"):
            text += "\n"
        return pd.DataFrame(
            {"file": [_write_shard(fs_, root, ".jsonl", text)]})

    return [r["file"] for r in ds.map_batches(
        _dump, batch_format="pandas").take_all()]
