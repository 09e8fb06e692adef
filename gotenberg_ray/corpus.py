"""Deterministic synthetic corpus + frontier generator (FIXTURES.md).

Everything is a pure function of (seed, size): no wall clock, no dict
iteration order, no PYTHONHASHSEED dependence — generation feeds the
determinism and resume harnesses, so two calls must be bit-identical.

The document model follows BASELINE.json's input_hint: rows of
``(doc_id, spans)`` where spans interleave text and media. Page
boundaries inside a document are ``kind="page_break"`` spans; an
n-page document carries text spans "Page 1".."Page n" (mirrors the
reference's `page-1-html` / `pages-3-html` / `pages-12-html` fixtures,
/root/reference/test/integration/testdata/).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .schemas import (
    DOCUMENTS_SCHEMA,
    FRONTIER_SCHEMA,
    KIND_MEDIA,
    KIND_PAGE_BREAK,
    KIND_TEXT,
    make_span,
)

HOT_HOST = "hot.example.com"

_WORDS = (
    "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu nu xi "
    "omicron pi rho sigma tau upsilon phi chi psi omega data span page crawl "
    "fetch render merge split rotate stamp watermark embed convert document"
).split()


def _doc_pages(rng: np.random.RandomState) -> int:
    # weighted toward small docs, with the fixture sizes 1/3/12 guaranteed
    return int(rng.choice([1, 1, 2, 3, 3, 4, 5, 12], p=[0.3, 0.1, 0.15, 0.15, 0.05, 0.1, 0.1, 0.05]))


def _page_text(rng: np.random.RandomState, page_no: int) -> str:
    n_extra = int(rng.randint(3, 12))
    words = " ".join(_WORDS[i] for i in rng.randint(0, len(_WORDS), n_extra))
    return f"Page {page_no} {words}"


def make_documents(n_docs: int, seed: int = 42) -> pa.Table:
    """Synthetic interleaved text+media corpus of ``n_docs`` rows."""
    rng = np.random.RandomState(seed)
    doc_ids: list[str] = []
    spans_col: list[list[dict]] = []
    for i in range(n_docs):
        doc_id = f"doc-{i:06d}"
        # guarantee the fixture shapes: docs 0,1,2 are 1/3/12-page
        pages = [1, 3, 12][i] if i < 3 else _doc_pages(rng)
        spans: list[dict] = []
        off = 0
        for p in range(1, pages + 1):
            spans.append(make_span(KIND_TEXT, text=_page_text(rng, p), offset=off))
            off += 1
            # interleave media spans on some pages (feature-rich fixture)
            if rng.rand() < 0.25:
                n_media = int(rng.randint(1, 4))
                for m in range(n_media):
                    spans.append(
                        make_span(
                            KIND_MEDIA,
                            media_ref=f"https://assets.example.com/{doc_id}/img_{p}_{m}.png",
                            offset=off,
                        )
                    )
                    off += 1
            if p < pages:
                spans.append(make_span(KIND_PAGE_BREAK, offset=off))
                off += 1
        doc_ids.append(doc_id)
        spans_col.append(spans)
    return pa.table(
        {"doc_id": pa.array(doc_ids, pa.string()), "spans": pa.array(spans_col, DOCUMENTS_SCHEMA.field("spans").type)},
        schema=DOCUMENTS_SCHEMA,
    )


def host_pool(n_hosts: int) -> list[str]:
    return [HOT_HOST] + [f"site-{i:03d}.example.org" for i in range(n_hosts - 1)]


ROUTES = (
    "convert/url",
    "convert/html",
    "convert/markdown",
    "screenshot/url",
    "libreoffice/convert",
)


def make_frontier(
    n_urls: int,
    n_docs: int,
    seed: int = 42,
    n_hosts: int = 20,
    hot_frac: float = 0.3,
    reject_frac: float = 0.08,
    dup_frac: float = 0.05,
) -> pa.Table:
    """Seed frontier (FIXTURES.md §2): raw, pre-canonicalization URLs.

    Includes mixed-case scheme/host, explicit default ports, fragments;
    reject rows (file:// scheme, private-IP literal hosts) and duplicate
    URLs to exercise the seen-set. ``url_canon``/``url_hash`` are left
    empty — the engine fills them. ``doc_id`` is the synthetic "what
    this URL fetches" join key into the documents table.
    """
    rng = np.random.RandomState(seed + 1)
    hosts = host_pool(n_hosts)
    urls: list[str] = []
    host_col: list[str] = []
    prio: list[int] = []
    routes: list[str] = []
    doc_ids: list[str] = []

    def emit(url: str, host: str, i: int):
        urls.append(url)
        host_col.append(host)
        prio.append(int(rng.randint(0, 10)))
        routes.append(ROUTES[int(rng.randint(0, len(ROUTES)))])
        doc_ids.append(f"doc-{int(rng.randint(0, n_docs)):06d}")

    i = 0
    while len(urls) < n_urls:
        r = rng.rand()
        if r < reject_frac / 2:
            emit(f"file:///etc/passwd_{i}", "", i)
        elif r < reject_frac:
            emit(f"http://192.168.1.{i % 254 + 1}/admin", f"192.168.1.{i % 254 + 1}", i)
        else:
            host = HOT_HOST if rng.rand() < hot_frac else hosts[int(rng.randint(1, n_hosts))]
            # messy raw form: mixed case, default port, fragment
            scheme = "HTTP" if rng.rand() < 0.2 else "http"
            h = host.upper() if rng.rand() < 0.15 else host
            port = ":80" if rng.rand() < 0.2 else ""
            frag = f"#sec{i % 7}" if rng.rand() < 0.3 else ""
            emit(f"{scheme}://{h}{port}/page/{i}{frag}", host, i)
            if rng.rand() < dup_frac and len(urls) < n_urls:
                # duplicate of the same canonical URL, differently messy
                emit(f"http://{host}:80/page/{i}", host, i)
        i += 1

    n = len(urls)
    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "url_canon": pa.array([""] * n, pa.string()),
            "url_hash": pa.array(np.zeros(n, dtype=np.uint64)),
            "host": pa.array(host_col, pa.string()),
            "priority": pa.array(np.array(prio, dtype=np.int32)),
            "next_fetch_time": pa.array(np.zeros(n, dtype=np.int64)),
            "route": pa.array(routes, pa.string()),
            "options_json": pa.array(["{}"] * n, pa.string()),
            "doc_id": pa.array(doc_ids, pa.string()),
            "seq": pa.array(np.arange(n, dtype=np.int64)),
        },
        schema=FRONTIER_SCHEMA,
    )


def make_robots(hosts: list[str], seed: int = 42) -> dict[str, str]:
    """Deterministic robots.txt per host: some disallow rules + crawl-delay."""
    rng = np.random.RandomState(seed + 2)
    out: dict[str, str] = {}
    for h in sorted(hosts):
        lines = ["User-agent: *"]
        if rng.rand() < 0.5:
            lines.append(f"Disallow: /private{int(rng.randint(0, 5))}/")
        if rng.rand() < 0.3:
            lines.append("Disallow: /tmp/")
        delay = int(rng.choice([0, 1, 1, 2, 5]))
        if delay:
            lines.append(f"Crawl-delay: {delay}")
        out[h] = "\n".join(lines) + "\n"
    return out
