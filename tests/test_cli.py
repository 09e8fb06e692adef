"""CLI entry point (`python -m gotenberg_ray`) — each subcommand runs
in its own process with its own Ray session (the CLI owns init)."""

import json
import subprocess
import sys
from pathlib import Path

REPO = str(Path(__file__).resolve().parent.parent)


def _run(*argv, timeout=240):
    return subprocess.run(
        [sys.executable, "-m", "gotenberg_ray", *argv],
        capture_output=True,
        text=True,
        timeout=timeout,
        cwd=REPO,
    )


def test_list_names_every_query():
    r = _run("list")
    assert r.returncode == 0
    lines = [l for l in r.stdout.splitlines() if l.strip()]
    assert len(lines) >= 70
    assert any("oracle" in l for l in lines)
    assert any("rows-only" in l for l in lines)


def test_query_json_roundtrip():
    r = _run("query", "sample_bottomk", "--json")
    assert r.returncode == 0, r.stderr[-500:]
    rows = json.loads(r.stdout.strip().splitlines()[-1])
    assert len(rows) == 100 and {"doc_id", "lang"} <= set(rows[0])


def test_unknown_query_is_an_error():
    r = _run("query", "no_such_pipeline")
    assert r.returncode == 2
    assert "unknown query" in r.stderr
