"""PII scan/redact and repetition-quality operators vs their DuckDB
oracles at sf0.001 (RE2 parity across both engines)."""

import duckdb
import pandas as pd
import pytest

from gotenberg_ray.pipelines import quality as Q


def _con(sf_dir):
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS FROM '{sf_dir}/documents.parquet'")
    return con


def _check(got, want):
    g = got.reindex(sorted(got.columns), axis=1).reset_index(drop=True)
    w = want.reindex(sorted(want.columns), axis=1).reset_index(drop=True)
    for c in w.columns:
        if str(w[c].dtype).startswith("int") or str(g[c].dtype).startswith("int"):
            w[c] = w[c].astype("int64")
            g[c] = g[c].astype("int64")
    pd.testing.assert_frame_equal(g, w)


@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize(
    "fn,sql",
    [
        (Q.pii_scan, Q.PII_SCAN_SQL),
        (Q.pii_redact, Q.PII_REDACT_SQL),
        (Q.repetition_quality, Q.REPETITION_SQL),
    ],
    ids=["pii_scan", "pii_redact", "repetition_quality"],
)
def test_matches_oracle(sf_dir, fn, sql):
    got = fn(sf_dir)
    con = _con(sf_dir)
    _check(got, con.sql(sql).df())


@pytest.mark.usefixtures("ray_session")
def test_pii_nondegenerate_and_consistent(sf_dir):
    scan = Q.pii_scan(sf_dir)
    red = Q.pii_redact(sf_dir)
    # detection found real hits, and redaction count equals scan count
    assert (scan["n_pii"] > 0).any() and (scan["n_pii"] == 0).any()
    merged = scan.merge(red, on="doc_id")
    assert (merged["n_pii"] == merged["n_redactions"]).all()
    # no residual PII after redaction
    assert not merged["clean_text"].str.contains("@example.org").any()
    assert not merged["clean_text"].str.contains(r"\b555-\d{3}-\d{4}\b", regex=True).any()


@pytest.mark.usefixtures("ray_session")
def test_quality_flags_discriminate(sf_dir):
    rq = Q.repetition_quality(sf_dir)
    assert (rq["pass_quality"] == 1).any()
    assert (rq["ttr_e4"] <= 10_000).all()
    assert (rq["top_frac_e4"] <= 10_000).all()
