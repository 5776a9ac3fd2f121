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


def page_batch_rows(seed: int, start: int, stop: int, n_pages: int) -> pa.Table:
    """Scalar reference path (one make_page per row) — kept as the
    equality oracle for the vectorized page_batch below."""
    rows = [make_page(seed, i, n_pages) for i in range(start, stop)]
    return pa.Table.from_pylist(rows, schema=PAGES_SCHEMA)


def page_batch(seed: int, start: int, stop: int, n_pages: int) -> pa.Table:
    """Vectorized batch generation, BIT-IDENTICAL to make_page row by
    row (tests/test_synth_vec.py asserts table equality): the ~80
    murmur draws per page go through ``hash64_arrow`` — one call per
    key family, keys assembled by pyarrow C kernels and hashed
    straight off the NUL-padded Arrow buffer, zero per-key Python —
    leaving only the final per-page html/text format as a Python
    loop. The generator was ~40%% of the headline bench's wall time
    (6.4 s of 15 s at 100k pages), which is why it is worth
    vectorizing at all; this path measures ~6.5x the scalar one."""
    import numpy as np
    import pyarrow.compute as pc

    from ..core.mmh3 import hash64_arrow

    n = stop - start
    if n <= 0:
        return pa.Table.from_pylist([], schema=PAGES_SCHEMA)
    ids = np.arange(start, stop, dtype=np.int64)
    ids_pa = pc.cast(pa.array(ids), pa.string())
    sp = "%d:" % seed
    WN = np.uint64(len(_WORDS))
    words_u = np.array(_WORDS)

    def hkey(tag, arr_pa):
        # key assembly stays in pyarrow C kernels ('' separator =
        # plain concat); hashing reads the Arrow buffers directly
        return hash64_arrow(
            pc.binary_join_element_wise(sp + tag + ":", arr_pa, ""))

    def words_of(tag, count):
        """(n, count) word matrix for _words(seed, tag, i, k)."""
        parts = [
            pc.binary_join_element_wise(
                sp + tag + ":", ids_pa, ":%d" % k, "")
            for k in range(count)
        ]
        h = hash64_arrow(pa.concat_arrays(parts))  # k-major blocks
        return words_u[(h % WN).astype(np.int64)].reshape(count, n).T

    lang = np.array(_LANGS)[
        (hkey("lang", ids_pa) % np.uint64(len(_LANGS))).astype(np.int64)]

    r_a = hkey("apick", ids_pa)
    pool_a = np.uint64(max(2, n_pages // 8))
    a = np.where(r_a % np.uint64(5) == 0,
                 np.int64(0), (1 + r_a % pool_a).astype(np.int64))
    r_p = hkey("ppick", ids_pa)
    pool_p = np.uint64(max(2, n_pages // 20))
    p = np.where(r_p % np.uint64(3) == 0,
                 np.int64(0), (1 + r_p % pool_p).astype(np.int64))
    astr = pc.cast(pa.array(a), pa.string())
    pstr = pc.cast(pa.array(p), pa.string())

    aw = np.char.title(
        words_u[(hkey("aname", astr) % WN).astype(np.int64)])
    pw = np.char.title(
        words_u[(hkey("pname", pstr) % WN).astype(np.int64)])

    by = (hkey("by", astr) % np.uint64(80)).astype(np.int64)
    bm = (1 + hkey("bm", astr) % np.uint64(12)).astype(np.int64)
    bd = (1 + hkey("bd", astr) % np.uint64(28)).astype(np.int64)
    isbn_n = (hkey("isbn", ids_pa) % np.uint64(10 ** 11)).astype(np.int64)
    py = (hkey("py", ids_pa) % np.uint64(25)).astype(np.int64)
    pm = (1 + hkey("pm", ids_pa) % np.uint64(12)).astype(np.int64)
    pd_ = (1 + hkey("pd", ids_pa) % np.uint64(28)).astype(np.int64)

    title_w = np.char.title(words_of("title", 4))
    p1_w = words_of("p1", 24)
    p2_w = words_of("p2", 32)

    # native Python lists for the format loop: numpy unicode SCALARS
    # format an order of magnitude slower than str
    a_l = a.tolist()
    p_l = p.tolist()
    aw_l = aw.tolist()
    pw_l = pw.tolist()
    lang_l = lang.tolist()
    by_l, bm_l, bd_l = by.tolist(), bm.tolist(), bd.tolist()
    isbn_l = isbn_n.tolist()
    py_l, pm_l, pd_l = py.tolist(), pm.tolist(), pd_.tolist()
    title_l = title_w.tolist()
    p1_l = p1_w.tolist()
    p2_l = p2_w.tolist()
    ids_l = ids.tolist()
    ts_arr = (np.datetime64(_EPOCH, "ms")
              + ids.astype("timedelta64[s]").astype("timedelta64[ms]"))

    urls, htmls, texts = [], [], []
    tmpl = (
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
    )
    for j in range(n):
        i = ids_l[j]
        url = "%s%08d" % (BASE_URL, i)
        aname = "Author %s %d" % (aw_l[j], a_l[j])
        pname = "%s Press %d" % (pw_l[j], p_l[j])
        a_iri = "%s%05d" % (AUTHOR_BASE, a_l[j])
        p_iri = "%s%05d" % (PUB_BASE, p_l[j])
        title = " ".join(title_l[j])
        birth = "19%02d-%02d-%02d" % (by_l[j], bm_l[j], bd_l[j])
        isbn = "97%011d" % isbn_l[j]
        date_pub = "20%02d-%02d-%02d" % (py_l[j], pm_l[j], pd_l[j])
        para1 = " ".join(p1_l[j])
        para2 = " ".join(p2_l[j])
        urls.append(url)
        texts.append("\n".join(
            [title, para1, aname, "Published by", pname, para2]))
        htmls.append((tmpl % (
            "pg%d" % i, SCHEMA_ORG, url, title, isbn, date_pub, lang_l[j],
            para1, a_iri, aname, a_iri, aname, birth,
            p_iri, pname, p_iri, pname, para2,
        )).encode("utf-8"))
    return pa.Table.from_arrays(
        [pa.array(urls, pa.string()),
         pa.array(ts_arr, pa.timestamp("ms")),
         pa.array(htmls, pa.binary()),
         pa.array(texts, pa.string()),
         pa.array(lang_l, pa.string())],
        schema=PAGES_SCHEMA)


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
