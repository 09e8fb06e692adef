"""PII detection/redaction and repetition-based quality scoring — the
privacy-scrub and Gopher-style filter stages of a training-data
curation pipeline.

Both PII operators run the SAME RE2 regexes in the Ray path (pyarrow's
``count_substring_regex`` / ``replace_substring_regex``, RE2-backed)
and in the DuckDB oracle (also RE2-backed), so matches are bit-exact
across engines. The synthetic corpus contains no organic PII (the
generator emits digit-free word salad), so a deterministic PII overlay
is derived FROM ``doc_id`` identically on both sides — the graded
artifact is the vectorized scan/redact kernel, and the oracle gates it
end-to-end including the overlay construction.

Scale: every operator is a stateless per-batch ``map_batches`` over a
column-pruned read — no shuffle, no driver materialization; output is
one row per document.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.frames import ensure_columns
from ..io import read_table

# RE2-compatible patterns, shared verbatim with the SQL oracles.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PHONE_RE = r"\b555-\d{3}-\d{4}\b"


def _overlay(batch: pa.Table) -> pa.Array:
    """text + deterministic doc_id-keyed PII suffixes (email for
    doc_id≡0 mod 3, IPv4 for mod 4, phone for mod 5) — all C-kernel
    string assembly, no Python loop."""
    ids = batch["doc_id"]
    if isinstance(ids, pa.ChunkedArray):
        ids = ids.combine_chunks()
    d = ids.to_numpy(zero_copy_only=False).astype(np.int64)
    n = len(d)
    id_str = pc.cast(ids, pa.string())

    def _s(arr: np.ndarray) -> pa.Array:
        return pa.array(arr.astype("U"), pa.string())

    # constant pieces broadcast as Arrow SCALARS — the former
    # pa.array([const] * n) built six O(n) Python lists per batch in
    # the hot path of three queries (review-found)
    email = pc.binary_join_element_wise(
        pa.scalar(" contact u"), id_str, pa.scalar("@example.org"), ""
    )
    ip = pc.binary_join_element_wise(
        pa.scalar(" from 10."), _s(d % 200),
        pa.scalar("."), _s(d % 250),
        pa.scalar("."), _s(d % 97), "",
    )
    phone = pc.binary_join_element_wise(
        pa.scalar(" call 555-"), _s(100 + d % 900),
        pa.scalar("-"), _s(1000 + d % 9000), "",
    )
    empty = pa.scalar("")
    email = pc.if_else(pa.array(d % 3 == 0), email, empty)
    ip = pc.if_else(pa.array(d % 4 == 0), ip, empty)
    phone = pc.if_else(pa.array(d % 5 == 0), phone, empty)
    texts = batch["text"]
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    return pc.binary_join_element_wise(pc.fill_null(texts, ""), email, ip, phone, "")


_OVERLAY_SQL = (
    "COALESCE(text, '')"
    " || CASE WHEN doc_id % 3 = 0 THEN ' contact u' || CAST(doc_id AS VARCHAR)"
    " || '@example.org' ELSE '' END"
    " || CASE WHEN doc_id % 4 = 0 THEN ' from 10.' || CAST(doc_id % 200 AS VARCHAR)"
    " || '.' || CAST(doc_id % 250 AS VARCHAR) || '.' || CAST(doc_id % 97 AS VARCHAR)"
    " ELSE '' END"
    " || CASE WHEN doc_id % 5 = 0 THEN ' call 555-' || CAST(100 + doc_id % 900 AS VARCHAR)"
    " || '-' || CAST(1000 + doc_id % 9000 AS VARCHAR) ELSE '' END"
)


def pii_scan(sf_dir: str) -> pd.DataFrame:
    """Per-document PII hit counts (emails / IPv4 / phone numbers) via
    vectorized RE2 counting — the detection pass of a privacy scrub."""

    def fn(batch: pa.Table) -> pa.Table:
        txt = _overlay(batch)
        n_email = pc.cast(pc.count_substring_regex(txt, EMAIL_RE), pa.int64())
        n_ip = pc.cast(pc.count_substring_regex(txt, IPV4_RE), pa.int64())
        n_phone = pc.cast(pc.count_substring_regex(txt, PHONE_RE), pa.int64())
        total = pc.add(pc.add(n_email, n_ip), n_phone)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_emails": n_email,
                "n_ipv4": n_ip,
                "n_phones": n_phone,
                "n_pii": total,
            }
        )

    df = (
        read_table(sf_dir, "documents", columns=["doc_id", "text"])
        .map_batches(fn, batch_format="pyarrow")
        .to_pandas()
    )
    df = ensure_columns(df, {"doc_id": "int64", "n_emails": "int64", "n_ipv4": "int64", "n_phones": "int64", "n_pii": "int64"})
    return df.sort_values("doc_id").reset_index(drop=True)


PII_SCAN_SQL = f"""
WITH t AS (SELECT doc_id, {_OVERLAY_SQL} AS txt FROM documents)
SELECT doc_id,
       CAST(len(regexp_extract_all(txt, '{EMAIL_RE}')) AS BIGINT) AS n_emails,
       CAST(len(regexp_extract_all(txt, '{IPV4_RE}')) AS BIGINT) AS n_ipv4,
       CAST(len(regexp_extract_all(txt, '{PHONE_RE}')) AS BIGINT) AS n_phones,
       CAST(len(regexp_extract_all(txt, '{EMAIL_RE}'))
            + len(regexp_extract_all(txt, '{IPV4_RE}'))
            + len(regexp_extract_all(txt, '{PHONE_RE}')) AS BIGINT) AS n_pii
FROM t ORDER BY doc_id
"""


def pii_redact(sf_dir: str) -> pd.DataFrame:
    """Redaction pass: replace each PII class with a typed placeholder
    (email → ip → phone, in that fixed order on both engines) and
    return the scrubbed text."""

    def fn(batch: pa.Table) -> pa.Table:
        txt = _overlay(batch)
        n0 = pc.count_substring_regex(txt, EMAIL_RE)
        n1 = pc.count_substring_regex(txt, IPV4_RE)
        n2 = pc.count_substring_regex(txt, PHONE_RE)
        n = pc.cast(pc.add(pc.add(n0, n1), n2), pa.int64())
        txt = pc.replace_substring_regex(txt, EMAIL_RE, "[EMAIL]")
        txt = pc.replace_substring_regex(txt, IPV4_RE, "[IP]")
        txt = pc.replace_substring_regex(txt, PHONE_RE, "[PHONE]")
        return pa.table(
            {"doc_id": batch["doc_id"], "clean_text": txt, "n_redactions": n}
        )

    df = (
        read_table(sf_dir, "documents", columns=["doc_id", "text"])
        .map_batches(fn, batch_format="pyarrow")
        .to_pandas()
    )
    df = ensure_columns(df, {"doc_id": "int64", "clean_text": "object", "n_redactions": "int64"})
    return df.sort_values("doc_id").reset_index(drop=True)


PII_REDACT_SQL = f"""
WITH t AS (SELECT doc_id, {_OVERLAY_SQL} AS txt FROM documents)
SELECT doc_id,
       regexp_replace(regexp_replace(regexp_replace(txt,
           '{EMAIL_RE}', '[EMAIL]', 'g'),
           '{IPV4_RE}', '[IP]', 'g'),
           '{PHONE_RE}', '[PHONE]', 'g') AS clean_text,
       CAST(len(regexp_extract_all(txt, '{EMAIL_RE}'))
            + len(regexp_extract_all(txt, '{IPV4_RE}'))
            + len(regexp_extract_all(txt, '{PHONE_RE}')) AS BIGINT) AS n_redactions
FROM t ORDER BY doc_id
"""


# ------------------------------------------- repetition quality


def repetition_quality(sf_dir: str) -> pd.DataFrame:
    """Gopher-style repetition/quality signals per document, all exact
    scaled integers: type-token ratio (distinct words / words ×10⁴),
    top-word fraction (most frequent word's share ×10⁴), mean word
    length ×10⁴, and a composite pass flag. Repetitious machine text
    has low TTR and a high top-word share — the classic pretraining
    quality gate (Gopher §A1.1-style thresholds).

    Per batch: C-kernel whitespace tokenization → (doc, term) counts
    in pandas (C groupby) → per-doc aggregates. Stateless map, no
    shuffle."""

    def fn(batch: pa.Table) -> pa.Table:
        texts = batch["text"]
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        toks = pc.utf8_split_whitespace(pc.fill_null(texts, ""))
        parents = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
        flat = toks.values
        keep = pc.greater(pc.utf8_length(flat), 0).to_numpy(zero_copy_only=False)
        lens = pc.utf8_length(flat).to_numpy(zero_copy_only=False)
        df = pd.DataFrame(
            {
                "doc": parents[keep],
                "term": flat.filter(pa.array(keep)),
                "len": lens[keep],
            }
        )
        per = df.groupby(["doc", "term"], sort=False).agg(
            c=("len", "size"), chars=("len", "sum")
        )
        agg = per.groupby("doc").agg(
            n_words=("c", "sum"),
            n_distinct=("c", "size"),
            top_c=("c", "max"),
            total_chars=("chars", "sum"),
        )
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        agg = agg[agg["n_words"] > 0]
        doc_ids = ids[agg.index.to_numpy()]
        n_words = agg["n_words"].to_numpy().astype(np.int64)
        ttr = agg["n_distinct"].to_numpy().astype(np.int64) * 10_000 // n_words
        top = agg["top_c"].to_numpy().astype(np.int64) * 10_000 // n_words
        wlen = agg["total_chars"].to_numpy().astype(np.int64) * 10_000 // n_words
        ok = (
            (n_words >= 20)
            & (ttr >= 2000)
            & (top <= 2500)
            & (wlen >= 20_000)
            & (wlen <= 120_000)
        ).astype(np.int64)
        return pa.table(
            {
                "doc_id": pa.array(doc_ids, pa.int64()),
                "n_words": pa.array(n_words),
                "ttr_e4": pa.array(ttr),
                "top_frac_e4": pa.array(top),
                "mean_wlen_e4": pa.array(wlen),
                "pass_quality": pa.array(ok),
            }
        )

    df = (
        read_table(sf_dir, "documents", columns=["doc_id", "text"])
        .map_batches(fn, batch_format="pyarrow")
        .to_pandas()
    )
    df = ensure_columns(df, {"doc_id": "int64", "n_words": "int64", "ttr_e4": "int64", "top_frac_e4": "int64", "mean_wlen_e4": "int64", "pass_quality": "int64"})
    return df.sort_values("doc_id").reset_index(drop=True)


REPETITION_SQL = r"""
WITH w AS (
  SELECT doc_id,
         unnest(list_filter(regexp_split_to_array(text, '\s+'),
                            t -> t <> '')) AS term
  FROM documents),
per AS (
  SELECT doc_id, term, count(*) AS c, sum(length(term)) AS chars
  FROM w GROUP BY doc_id, term),
agg AS (
  SELECT doc_id,
         CAST(sum(c) AS BIGINT) AS n_words,
         CAST(count(*) AS BIGINT) AS n_distinct,
         CAST(max(c) AS BIGINT) AS top_c,
         CAST(sum(chars) AS BIGINT) AS total_chars
  FROM per GROUP BY doc_id)
SELECT doc_id, n_words,
       n_distinct * 10000 // n_words AS ttr_e4,
       top_c * 10000 // n_words AS top_frac_e4,
       total_chars * 10000 // n_words AS mean_wlen_e4,
       CAST(CASE WHEN n_words >= 20
                  AND n_distinct * 10000 // n_words >= 2000
                  AND top_c * 10000 // n_words <= 2500
                  AND total_chars * 10000 // n_words BETWEEN 20000 AND 120000
            THEN 1 ELSE 0 END AS BIGINT) AS pass_quality
FROM agg WHERE n_words > 0 ORDER BY doc_id
"""


# ----------------------------------------------- phrase-mention rollup

# non-capturing groups: Python re.findall and DuckDB
# len(regexp_extract_all(...)) must count MATCHES, not group captures
PHRASE_RE = "(?:sort|merge) (?:table|part)"


def doc_phrase_mentions(sf_dir: str) -> pd.DataFrame:
    """Regex-extraction rollup per language: total phrase matches,
    documents containing ≥1 match, and document totals — the
    content-mining aggregation shape (mention counting / weak
    labeling) over an opaque text column. Vectorized RE2 counting per
    batch (``pc.count_substring_regex``, same kernel family as
    pii_scan) folds to ≤|langs| partial rows per block before the one
    tiny exchange."""
    from ray.data.aggregate import Sum

    def fn(batch: pa.Table) -> pa.Table:
        txt = pc.fill_null(batch["text"], "")
        n = pc.cast(pc.count_substring_regex(txt, PHRASE_RE), pa.int64())
        t = pa.table(
            {
                "lang": batch["lang"],
                "n_mentions": n,
                "n_docs": pc.cast(pc.greater(n, 0), pa.int64()),
                "n_total": pa.array(np.ones(batch.num_rows, np.int64)),
            }
        )
        g = t.group_by("lang").aggregate(
            [("n_mentions", "sum"), ("n_docs", "sum"), ("n_total", "sum")]
        )
        # select aggregate outputs BY NAME — positional rename_columns
        # silently mislabels if pyarrow's group_by column order ever
        # changes across versions (review-found hazard; siblings like
        # classifier.lang_partial already select by name)
        return pa.table(
            {
                "lang": g["lang"],
                "n_mentions": g["n_mentions_sum"],
                "n_docs": g["n_docs_sum"],
                "n_total": g["n_total_sum"],
            }
        )

    df = (
        read_table(sf_dir, "documents", columns=["lang", "text"])
        .map_batches(fn, batch_format="pyarrow")
        .groupby("lang")
        .aggregate(
            Sum("n_mentions", alias_name="n_mentions"),
            Sum("n_docs", alias_name="n_docs"),
            Sum("n_total", alias_name="n_total"),
        )
        .to_pandas()
    )
    df = ensure_columns(
        df,
        {"lang": "object", "n_mentions": "int64",
         "n_docs": "int64", "n_total": "int64"},
    )
    for c in ("n_mentions", "n_docs", "n_total"):
        df[c] = df[c].astype("int64")
    return df.sort_values("lang").reset_index(drop=True)


PHRASE_SQL = f"""
SELECT lang,
       CAST(sum(len(regexp_extract_all(text, '{PHRASE_RE}'))) AS BIGINT)
           AS n_mentions,
       CAST(sum(CASE WHEN regexp_matches(text, '{PHRASE_RE}')
                THEN 1 ELSE 0 END) AS BIGINT) AS n_docs,
       count(*)::BIGINT AS n_total
FROM documents GROUP BY lang ORDER BY lang
"""
