"""Kernel-vs-row-path parity: the Arrow-native convert kernels
(pipelines/convert_vec.py) must reproduce convert_row exactly for every
option/route combination they claim, on randomized span inputs."""

import json

import numpy as np
import pyarrow as pa
import pytest

from gotenberg_ray.frontier.crawler import LINK_OPTIONS, LINK_ROUTES
from gotenberg_ray.pipelines import convert as CM
from gotenberg_ray.pipelines.convert import PAGES_OUT_SCHEMA, convert_batch
from gotenberg_ray.schemas import (
    KIND_MEDIA,
    KIND_PAGE_BREAK,
    KIND_TEXT,
    SPANS_TYPE,
    make_span,
)


def random_spans(rng, allow_empty=True):
    n = int(rng.integers(0, 14 if allow_empty else 12) )
    out = []
    for i in range(n):
        r = rng.random()
        if r < 0.2:
            out.append(make_span(KIND_PAGE_BREAK))
        elif r < 0.35:
            out.append(make_span(KIND_MEDIA, media_ref=f"m{i}.png"))
        elif r < 0.45:
            out.append(make_span(KIND_TEXT, text=""))
        else:
            words = " ".join(
                rng.choice(["alpha", "# head", "**b**", "plain", "tail"], size=3)
            )
            out.append(make_span(KIND_TEXT, text=words))
    return [{**s, "offset": i} for i, s in enumerate(out)]


def batch_for(rows, opts_json, route):
    return pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.string()),
            "spans": pa.array([r[1] for r in rows], SPANS_TYPE),
            "options_json": pa.array([opts_json] * len(rows), pa.string()),
            "route": pa.array([route] * len(rows), pa.string()),
        }
    )


def canon(t: pa.Table):
    t = t.sort_by([("doc_id", "ascending"), ("part_index", "ascending")])
    return t.to_pylist()


# screenshot routes never take the row fallback — they dispatch to the
# vectorized image-part branch (covered by tests/test_convert.py)
PDF_ROUTES = sorted(set(LINK_ROUTES) - {"screenshot/url"})


@pytest.mark.parametrize("opts_json", sorted(set(LINK_OPTIONS)))
@pytest.mark.parametrize("route", PDF_ROUTES)
def test_kernels_match_row_path(opts_json, route):
    rng = np.random.default_rng(hash((opts_json, route)) % 2**32)
    rows = [(f"doc-{i:03d}", random_spans(rng)) for i in range(40)]
    # guarantee the edge shapes are present
    rows[0] = ("doc-edge0", [])  # empty doc
    rows[1] = ("doc-edge1", [make_span(KIND_PAGE_BREAK)])  # lone page break
    rows[2] = (
        "doc-edge2",
        [make_span(KIND_PAGE_BREAK), make_span(KIND_PAGE_BREAK)],  # empty pages
    )
    rows[3] = ("doc-edge3", [make_span(KIND_TEXT, text="# only *md*")])
    batch = batch_for(rows, opts_json, route)

    got = canon(convert_batch(batch))
    exp = canon(CM._convert_rows_fallback(batch))
    assert got == exp


def test_mixed_batch_groups_cover_all_rows():
    rng = np.random.default_rng(5)
    rows, opts, routes = [], [], []
    for i in range(120):
        rows.append(random_spans(rng))
        opts.append(LINK_OPTIONS[int(rng.integers(len(LINK_OPTIONS)))])
        routes.append(LINK_ROUTES[int(rng.integers(len(LINK_ROUTES)))])
    batch = pa.table(
        {
            "doc_id": pa.array([f"d{i:03d}" for i in range(120)], pa.string()),
            "spans": pa.array(rows, SPANS_TYPE),
            "options_json": pa.array(opts, pa.string()),
            "route": pa.array(routes, pa.string()),
        }
    )
    got = canon(convert_batch(batch))
    # expected: PDF-chain rows via the row-path reference; screenshot
    # rows via the (single-group) screenshot branch
    import pyarrow.compute as pc

    is_shot = pc.equal(batch.column("route"), "screenshot/url")
    pdf_rows = batch.filter(pc.invert(is_shot))
    shot_rows = batch.filter(is_shot)
    exp_parts = [CM._convert_rows_fallback(pdf_rows)]
    for opt in sorted(set(shot_rows.column("options_json").to_pylist())):
        exp_parts.append(
            convert_batch(shot_rows.filter(pc.equal(shot_rows.column("options_json"), opt)))
        )
    exp = canon(pa.concat_tables(exp_parts))
    assert got == exp
    assert shot_rows.num_rows > 0


def test_unsupported_options_fall_back():
    # encryption is outside the kernel set — must still work via fallback
    rows = [("d1", [make_span(KIND_TEXT, text="x")])]
    b = batch_for(rows, json.dumps({"user_password": "s3cret"}), "convert/url")
    out = convert_batch(b)
    assert out.schema.equals(PAGES_OUT_SCHEMA)
    assert json.loads(out.column("encrypt_json")[0].as_py())["user_password"] == "s3cret"


@pytest.mark.parametrize(
    "opts_json",
    [
        '{"rotate_angle": 90, "rotate_pages": "", "flatten": true}',
        '{"rotate_angle": 180, "rotate_pages": "1", "flatten": true}',
        '{"split_mode": "intervals", "split_span": "2", "flatten": true}',
        '{"header_template": "h <span class=\\"pageNumber\\"></span>", "flatten": true}',
        '{"flatten": true}',
    ],
)
def test_flatten_combos_match_row_path(opts_json):
    """flatten over inputs that already carry ROT / overlay spans from
    earlier kernels (rotate, header/footer, split) — the class-ordered
    page reassembly must equal the row path span for span."""
    rng = np.random.default_rng(hash(opts_json) % 2**32)
    rows = [(f"doc-{i:03d}", random_spans(rng)) for i in range(60)]
    rows[0] = ("doc-edge0", [])
    rows[1] = ("doc-edge1", [make_span(KIND_PAGE_BREAK)])
    rows[2] = (
        "doc-edge2",
        [make_span(KIND_PAGE_BREAK), make_span(KIND_PAGE_BREAK)],
    )
    batch = batch_for(rows, opts_json, "convert/url")
    got = canon(convert_batch(batch))
    exp = canon(CM._convert_rows_fallback(batch))
    assert got == exp
