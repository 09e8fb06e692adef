"""Empty-input totality sweep: run every registered query against a
zero-row corpus (real schemas, no rows) and report crashes.

A production filter chain can legitimately reduce any stage to zero
rows; every operator must degrade to a typed empty result instead of
crashing (Ray's ``to_pandas()`` on an empty dataset loses column
labels, so unguarded column access raises KeyError).

Usage: python tools/empty_sweep.py [name ...]
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_empty_corpus(dst: str = "/tmp/sf_empty") -> str:
    import pyarrow.parquet as pq

    src = "/root/testdata/sf0.001"
    os.makedirs(dst, exist_ok=True)
    for f in os.listdir(src):
        if f.endswith(".parquet"):
            t = pq.read_table(os.path.join(src, f))
            pq.write_table(t.slice(0, 0), os.path.join(dst, f))
    return dst


def main() -> int:
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local", num_cpus=8, include_dashboard=False,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "entry", os.path.join(os.path.dirname(__file__), "..", "__ray_entry__.py")
    )
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    qs = m.queries()
    only = set(sys.argv[1:])
    dst = make_empty_corpus()
    fails = []
    for name, fn in sorted(qs.items()):
        if only and name not in only:
            continue
        try:
            with contextlib.redirect_stderr(io.StringIO()):
                r = fn(dst)
            n = len(r) if hasattr(r, "__len__") else r.count()
            print(f"{name:32s} ok ({n} rows)")
        except Exception as e:  # noqa: BLE001 — report, don't die
            fails.append(name)
            print(f"{name:32s} FAIL {type(e).__name__}: {str(e)[:100]}")
    print(f"\n{len(fails)} failures")
    ray.shutdown()
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
