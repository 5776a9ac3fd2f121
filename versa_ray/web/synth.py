"""Deterministic synthetic web-page corpus.

Generates a Parquet-able table with exactly the mandated input shape
(BASELINE.json input_hint): ``(url:string, warc_ts:timestamp,
html:binary, text:string, lang:string)``. Pages embed schema.org
entities via RDFa Lite (vocab / typeof / property / resource / content
/ href), with controlled entity overlap across pages so
canonicalization has real work, and a skewed "head entity" population
(author #0 and publisher #0 appear on a large fraction of pages) to
exercise shuffle-skew handling.

Everything is a pure function of (seed, page index): no RNG state, so
any shard of the corpus can be generated independently on any worker
(ray.data.range(n).map_batches(page_batch)).

The ``text`` column is the golden byte-identical extraction target:
it is composed directly from the text segments the page places in the
HTML body, in document order, joined with newlines — the same
convention versa_ray.web.extract.extract_text implements by parsing.
"""

from __future__ import annotations

import datetime

import pyarrow as pa

from ..core.mmh3 import hash128_x64

SCHEMA_ORG = "https://schema.org/"
BASE_URL = "https://example.org/page/"
AUTHOR_BASE = "https://example.org/author/"
PUB_BASE = "https://example.org/publisher/"

_WORDS = (
    "graph data link web page corpus entity model quad engine stream "
    "shard batch arrow vector hash merge sort shuffle actor pool block "
    "spill lineage resume partition skew salt broadcast index scan "
    "filter project join group window distinct sample read write"
).split()

_LANGS = ["en", "en", "en", "en", "en", "en", "en", "en", "ig", "fr"]

PAGES_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("ms")),
        ("html", pa.binary()),
        ("text", pa.string()),
        ("lang", pa.string()),
    ]
)

_EPOCH = datetime.datetime(2024, 1, 1)


def _h(seed: int, *parts) -> int:
    """Deterministic 64-bit value from seed + parts."""
    key = ("%d:" % seed) + ":".join(str(p) for p in parts)
    return hash128_x64(key.encode("utf-8"))[0]


def _words(seed: int, tag: str, i: int, n: int) -> str:
    out = []
    for k in range(n):
        out.append(_WORDS[_h(seed, tag, i, k) % len(_WORDS)])
    return " ".join(out)


def _author(seed: int, page_i: int, n_pages: int) -> int:
    """Pick the author for a page: ~20% of pages hit head author 0,
    the rest spread over a pool that grows with corpus size."""
    r = _h(seed, "apick", page_i)
    if r % 5 == 0:
        return 0
    pool = max(2, n_pages // 8)
    return 1 + (r % pool)


def _publisher(seed: int, page_i: int, n_pages: int) -> int:
    r = _h(seed, "ppick", page_i)
    if r % 3 == 0:
        return 0
    pool = max(2, n_pages // 20)
    return 1 + (r % pool)


def author_name(seed: int, a: int) -> str:
    return "Author %s %d" % (_WORDS[_h(seed, "aname", a) % len(_WORDS)].title(), a)


def publisher_name(seed: int, p: int) -> str:
    return "%s Press %d" % (_WORDS[_h(seed, "pname", p) % len(_WORDS)].title(), p)


def make_page(seed: int, i: int, n_pages: int) -> dict:
    """Build one page row; pure function of (seed, i, n_pages)."""
    url = "%s%08d" % (BASE_URL, i)
    lang = _LANGS[_h(seed, "lang", i) % len(_LANGS)]
    a = _author(seed, i, n_pages)
    p = _publisher(seed, i, n_pages)
    aname = author_name(seed, a)
    pname = publisher_name(seed, p)
    a_iri = "%s%05d" % (AUTHOR_BASE, a)
    p_iri = "%s%05d" % (PUB_BASE, p)
    title = _words(seed, "title", i, 4).title()
    birth = "19%02d-%02d-%02d" % (
        _h(seed, "by", a) % 80,
        1 + _h(seed, "bm", a) % 12,
        1 + _h(seed, "bd", a) % 28,
    )
    isbn = "97%011d" % (_h(seed, "isbn", i) % 10**11)
    date_pub = "20%02d-%02d-%02d" % (
        _h(seed, "py", i) % 25,
        1 + _h(seed, "pm", i) % 12,
        1 + _h(seed, "pd", i) % 28,
    )
    para1 = _words(seed, "p1", i, 24)
    para2 = _words(seed, "p2", i, 32)

    # Text segments in document order — the golden extraction target
    segments = [title, para1, aname, "Published by", pname, para2]
    text = "\n".join(segments)

    html = (
        "<html><head><title>%s</title></head>\n"
        '<body vocab="%s">\n'
        '<article resource="%s" typeof="Book">\n'
        '<h1 property="name">%s</h1>\n'
        '<meta property="isbn" content="%s">\n'
        '<meta property="datePublished" content="%s">\n'
        '<meta property="inLanguage" content="%s">\n'
        "<p>%s</p>\n"
        '<a property="author" href="%s">%s</a>\n'
        '<div resource="%s" typeof="Person">\n'
        '<meta property="name" content="%s">\n'
        '<meta property="birthDate" content="%s">\n'
        "</div>\n"
        "<span>Published by</span>\n"
        '<a property="publisher" href="%s">%s</a>\n'
        '<div resource="%s" typeof="Organization">\n'
        '<meta property="name" content="%s">\n'
        "</div>\n"
        "<p>%s</p>\n"
        "</article>\n"
        "</body></html>"
    ) % (
        "pg%d" % i, SCHEMA_ORG, url, title, isbn, date_pub, lang, para1,
        a_iri, aname, a_iri, aname, birth,
        p_iri, pname, p_iri, pname, para2,
    )

    ts = _EPOCH + datetime.timedelta(seconds=i)
    return {
        "url": url,
        "warc_ts": ts,
        "html": html.encode("utf-8"),
        "text": text,
        "lang": lang,
    }


def page_batch(seed: int, start: int, stop: int, n_pages: int) -> pa.Table:
    rows = [make_page(seed, i, n_pages) for i in range(start, stop)]
    return pa.Table.from_pylist(rows, schema=PAGES_SCHEMA)


def pages_dataset(n_pages: int, seed: int = 42, parallelism: int = -1):
    """Distributed corpus generation: ray.data.range -> map_batches.

    Block count is sized so downstream stages parallelize (one
    coalesced mega-batch would serialize the whole extraction pool)."""
    import ray.data as rd

    def _gen(batch: pa.Table) -> pa.Table:
        ids = batch["id"].to_numpy()
        return page_batch(seed, int(ids.min()), int(ids.max()) + 1, n_pages)

    if parallelism <= 0:
        import ray

        cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
        # ~4 blocks per core: enough for balance, fat enough that
        # per-task overhead stays amortized
        parallelism = max(8, min(n_pages // 256 or 1, cpus * 4))
    ds = rd.range(n_pages, override_num_blocks=parallelism)
    return ds.map_batches(_gen, batch_format="pyarrow")


def write_pages(path: str, n_pages: int, seed: int = 42) -> None:
    """Driver-side small-corpus writer (tests / fixtures)."""
    import pyarrow.parquet as pq

    pq.write_table(page_batch(seed, 0, n_pages, n_pages), path)
