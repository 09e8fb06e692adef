"""downloadFrom acquisition semantics vs the reference
(/root/reference/pkg/modules/api/context.go:208-431): entry validation,
SSRF filter, retry envelope, Content-Disposition parsing, sanitized +
collision-proof naming, per-field routing."""

import json

import pyarrow as pa
import pytest

from gotenberg_ray.schemas import ERR_FILTERED, ERR_INVALID_INPUT
from gotenberg_ray.stages.download import (
    RESULT_SCHEMA,
    DownloadFromStage,
    disk_name_for,
    parse_content_disposition_filename,
)


def _batch(doc_id: str, entries) -> pa.Table:
    return pa.table(
        {
            "doc_id": pa.array([doc_id], pa.string()),
            "download_from_json": pa.array([json.dumps(entries)], pa.string()),
        }
    )


def _ok_transport(url, headers):
    return 200, 'attachment; filename="report.pdf"', b"x" * 10


@pytest.mark.parametrize(
    "header,want",
    [
        ('attachment; filename="report.pdf"', "report.pdf"),
        ("attachment; filename=plain.docx", "plain.docx"),
        # RFC 2231 extended syntax
        ("attachment; filename*=UTF-8''na%C3%AFve.pdf", "naïve.pdf"),
        ("attachment", None),
        ("", None),
        ("inline; filename=\"semi;colon.pdf\"", "semi;colon.pdf"),
    ],
)
def test_parse_content_disposition_filename(header, want):
    assert parse_content_disposition_filename(header) == want


def test_disk_name_keeps_only_extension_and_is_deterministic():
    long_name = "a" * 500 + ".pdf"
    d1 = disk_name_for("doc-1", "https://x/f", long_name)
    d2 = disk_name_for("doc-1", "https://x/f", long_name)
    assert d1 == d2 and d1.endswith(".pdf") and len(d1) < 40
    assert d1 != disk_name_for("doc-2", "https://x/f", long_name)


def test_empty_url_and_bad_json_are_400_family():
    stage = DownloadFromStage(transport=_ok_transport)
    out = stage(_batch("d1", [{"url": "  "}])).to_pylist()
    assert out[0]["error_type"] == ERR_INVALID_INPUT
    assert "entry 0: URL must be set" in out[0]["error_detail"]
    bad = pa.table(
        {
            "doc_id": pa.array(["d2"], pa.string()),
            "download_from_json": pa.array(["{not json"], pa.string()),
        }
    )
    out = stage(bad).to_pylist()
    assert out[0]["error_type"] == ERR_INVALID_INPUT
    assert out[0]["entry_index"] == -1


def test_ssrf_filter_blocks_before_any_fetch():
    calls = []

    def spy(url, headers):
        calls.append(url)
        return _ok_transport(url, headers)

    stage = DownloadFromStage(transport=spy, deny_private_ips=True)
    out = stage(
        _batch("d1", [{"url": "http://169.254.169.254/latest/meta-data/"}])
    ).to_pylist()
    assert out[0]["error_type"] == ERR_FILTERED
    assert calls == []  # the filter decides BEFORE the dial (context.go:247-255)


def test_retry_envelope_on_5xx_then_success():
    attempts = {"n": 0}

    def flaky(url, headers):
        attempts["n"] += 1
        if attempts["n"] < 3:
            return 503, "", b""
        return _ok_transport(url, headers)

    stage = DownloadFromStage(transport=flaky)
    out = stage(_batch("d1", [{"url": "https://ok.example.com/f"}])).to_pylist()
    assert out[0]["error_type"] == "" and out[0]["attempts"] == 3
    # 404 does NOT retry (default retry policy: only 5xx/conn errors)
    stage2 = DownloadFromStage(transport=lambda u, h: (404, "", b""))
    out = stage2(_batch("d1", [{"url": "https://ok.example.com/g"}])).to_pylist()
    assert out[0]["attempts"] == 1
    assert out[0]["error_type"] == ERR_INVALID_INPUT
    assert "got status" in out[0]["error_detail"]


def test_missing_content_disposition_is_an_error():
    stage = DownloadFromStage(transport=lambda u, h: (200, "", b"x"))
    out = stage(_batch("d1", [{"url": "https://ok.example.com/f"}])).to_pylist()
    assert out[0]["error_type"] == ERR_INVALID_INPUT
    assert "No 'Content-Disposition'" in out[0]["error_detail"]


def test_field_routing_and_zip_slip_sanitize():
    def evil(url, headers):
        return 200, 'attachment; filename="../../etc/passwd\x01.pdf"', b"y"

    stage = DownloadFromStage(transport=evil)
    out = stage(
        _batch(
            "d1",
            [
                {"url": "https://a.example.com/1", "field": "watermark"},
                {"url": "https://a.example.com/2", "embedded": True},
                {"url": "https://a.example.com/3", "field": "stamp"},
                {"url": "https://a.example.com/4"},
            ],
        )
    ).to_pylist()
    assert [r["form_field"] for r in out] == ["watermark", "embeds", "stamp", ""]
    # path separators + control chars stripped (context.go:692-703)
    assert out[0]["filename"] == "....etcpasswd.pdf"
    assert all(r["disk_name"].startswith("dl-") for r in out)


def test_extra_headers_and_user_agent_propagate():
    seen = {}

    def capture(url, headers):
        seen.update(headers)
        return _ok_transport(url, headers)

    stage = DownloadFromStage(transport=capture)
    stage(
        _batch(
            "d1",
            [{"url": "https://a.example.com/f", "extraHttpHeaders": {"X-Auth": "t"}}],
        )
    )
    assert seen["User-Agent"] == "Gotenberg" and seen["X-Auth"] == "t"


def test_schema_and_empty_batch():
    stage = DownloadFromStage(transport=_ok_transport)
    out = stage(_batch("d1", []))
    assert out.num_rows == 0 and out.schema.equals(RESULT_SCHEMA)
    out = stage(_batch("d1", [{"url": "https://a.example.com/f"}]))
    assert out.schema.equals(RESULT_SCHEMA)
