"""§D streaming-scale check for the dedup family (VERDICT r3 next #7).

Repeats the round-2 10×-data flat-RSS measurement (BASELINE.md §D) for
``dedup_exact`` and ``dedup_minhash``: the scaled corpus is 16
key-shifted unions of the sf0.1 documents table (doc_ids lifted into
disjoint ranges; replica i>0 prefixes every token with ``i_`` so
within-replica near-dup structure is preserved exactly while replicas
are not near-dups of each other — otherwise a 94%-duplicate corpus
measures the pathological all-pairs output, not streaming).

Each configuration runs in a FRESH process (its own ray session) and
reports wall time, docs/s, result rows, and the driver's peak RSS
(ru_maxrss), so 1× vs 16× shows whether the driver footprint is flat.

Usage:
    python tools/streaming_check.py            # build + run all 4 configs
    python tools/streaming_check.py --extra    # round-4 families (percentiles, TWAP)
    python tools/streaming_check.py --joins    # multi-way join family (q9 at 16×)
    python tools/streaming_check.py --holistic # tenth wave (overlap ranks, bounded-k)
    python tools/streaming_check.py --ann      # ANN family (brute recall, IVF-PQ)
    python tools/streaming_check.py --drift    # corpus-drift family (TV, vocab Jaccard)
    python tools/streaming_check.py --child dedup_exact /path/dir  # internal
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

BASE = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
SCALED = "/tmp/gotenberg_ray_streamcheck_16x"
COPIES = 16
ID_SHIFT = 10**9


def build_scaled() -> str:
    import pyarrow as pa
    import pyarrow.parquet as pq

    out = Path(SCALED)
    marker = out / "documents.parquet"
    if marker.exists():
        return str(out)
    out.mkdir(parents=True, exist_ok=True)
    t = pq.read_table(f"{BASE}/documents.parquet")
    parts = [t]
    texts = t["text"].to_pylist()
    for i in range(1, COPIES):
        tag = f"{i}_"
        retagged = [
            " ".join(tag + w for w in (s or "").split()) for s in texts
        ]
        parts.append(
            t.set_column(
                t.column_names.index("doc_id"),
                "doc_id",
                pa.array(
                    (t["doc_id"].to_numpy(zero_copy_only=False) + i * ID_SHIFT)
                ),
            ).set_column(
                t.column_names.index("text"), "text", pa.array(retagged)
            )
        )
    pq.write_table(pa.concat_tables(parts), marker)
    return str(out)


def build_scaled_table(table: str, id_cols: tuple[str, ...]) -> str:
    """16 unions of a base table with the id columns lifted into
    disjoint ranges per replica (keeps per-key structure inside each
    replica; replicas never share keys)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    out = Path(SCALED)
    out.mkdir(parents=True, exist_ok=True)
    marker = out / f"{table}.parquet"
    if marker.exists():
        return str(out)
    t = pq.read_table(f"{BASE}/{table}.parquet")
    parts = [t]
    for i in range(1, COPIES):
        p = t
        for col in id_cols:
            p = p.set_column(
                p.column_names.index(col),
                col,
                pa.array(
                    t[col].to_numpy(zero_copy_only=False) + i * ID_SHIFT
                ),
            )
        parts.append(p)
    pq.write_table(pa.concat_tables(parts), marker)
    return str(out)


# query -> (main table, id columns shifted per replica); documents is
# handled by build_scaled (token retagging, not just id shifts)
EXTRA_CONFIGS = {
    "order_price_quantiles": ("orders", ("o_orderkey", "o_custkey")),
    "user_value_twap": ("events", ("event_id", "user_id")),
    # --holistic: 16× disjoint users over the SAME calendar → global
    # session concurrency itself grows 16× (the adversarial direction
    # for the day-bucketed rank exchange); 16× members per (nation,
    # segment) group exercises the bounded-k ordered-concat fold
    "session_concurrency": ("events", ("event_id", "user_id")),
    "segment_first_names": ("customer", ("c_custkey",)),
    # --windows: 16× disjoint users over the same calendar — the
    # adversarial direction for the user-bucketed segmented passes
    # (per-bucket group count grows 16×, window width per user fixed)
    "events_asof_attribution": ("events", ("event_id", "user_id")),
    "events_rolling_peak": ("events", ("event_id", "user_id")),
}

HOLISTIC_QUERIES = ("session_concurrency", "segment_first_names")

WINDOW_QUERIES = ("events_asof_attribution", "events_rolling_peak")

# --classifier: the retagged 16× documents corpus (disjoint replica
# vocabularies hash into the SAME fixed feature buckets — 16× the
# featurize/Newton-partial mass, constant model/driver state)
CLASSIFIER_QUERIES = ("quality_classifier",)

# --ann: 16 vec_id-shifted replicas of the embedding store (the query
# row vec_id=0 stays unique to replica 0) — 16× the recall/scan mass
# for the brute-force and IVF-PQ paths, constant result size
ANN_QUERIES = ("knn_topk", "knn_ivfpq")

# --retrieval: maxsim over the 16× vec-shifted store (16× groups to
# max-fold) and BM25 over the retagged 16× documents corpus (16× the
# index-build mass; the query terms live only in replica 0, so the
# PROBED buckets stay query-bounded — the index-side pruning posture)
RETRIEVAL_QUERIES = ("maxsim_topk", "search_bm25")

# --substring: the sampled substring-dedup 100-TB posture over the
# retagged 16× documents corpus (replica token prefixes break
# cross-replica 20-char windows, so per-replica duplicate structure is
# preserved while the discovery exchange grows ~16× in sampled window
# mass — the flat-driver-RSS direction for the hash-pid fold)
SUBSTRING_QUERIES = ("dedup_substring_sampled",)

# --train: the two end-to-end crawl→curate→pack→shard compositions over
# the retagged 16× documents corpus — the span corpus, the crawl, the
# extraction/gate/dedup funnel and the pack manifest all scale 16×
# while the driver holds only the one-row summary + prefix-sum bases
TRAIN_QUERIES = ("training_data_pipeline", "training_interleaved_pipeline")

# multi-table join family: every foreign key shifts by the SAME replica
# offset so each replica is a self-contained TPC-H-shaped sub-universe
# (join structure × 16, join selectivity unchanged). nation is shared
# (s_nationkey unshifted) — the broadcast dimension stays tiny while the
# fact and mid-size sides grow, which is exactly the auto_join posture
# the check is evidencing.
JOIN_CONFIGS = {
    "q9_product_profit": {
        "main": "lineitem",
        "tables": {
            "lineitem": ("l_orderkey", "l_partkey", "l_suppkey"),
            "orders": ("o_orderkey", "o_custkey"),
            "part": ("p_partkey",),
            "supplier": ("s_suppkey",),
        },
        "copy": ("nation",),
    },
}


# corpus-drift family: runs on the token-retagged 16× documents corpus
# (each replica's vocabulary is disjoint — 16× the histogram/vocab AND
# 16× the token mass, the adversarial direction for a vocab-keyed
# exchange)
DRIFT_QUERIES = ("source_tv_distance", "source_vocab_jaccard")


def run_child(query: str, sf_dir: str) -> None:
    import resource

    import ray

    ray.init(
        address="local",
        num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
        include_dashboard=False,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import pyarrow.parquet as pq

    if query in JOIN_CONFIGS:
        table = JOIN_CONFIGS[query]["main"]
    else:
        table = (
            "embeddings"
            if query in ANN_QUERIES or query == "maxsim_topk"
            else EXTRA_CONFIGS.get(query, ("documents", ()))[0]
        )
    n_docs = pq.ParquetFile(f"{sf_dir}/{table}.parquet").metadata.num_rows
    if (
        query in EXTRA_CONFIGS
        or query in JOIN_CONFIGS
        or query in DRIFT_QUERIES
        or query in ANN_QUERIES
        or query in CLASSIFIER_QUERIES
        or query in RETRIEVAL_QUERIES
        or query in TRAIN_QUERIES
    ):
        import importlib.util

        spec = importlib.util.spec_from_file_location(
            "entry", str(Path(__file__).resolve().parent.parent / "__ray_entry__.py")
        )
        m = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(m)
        fn = m.queries()[query]
    else:
        from gotenberg_ray.pipelines import textops as T

        fn = getattr(T, query)
    t0 = time.time()
    res = fn(sf_dir)
    dt = time.time() - t0
    peak_mb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024
    print(
        json.dumps(
            {
                "query": query,
                "dir": sf_dir,
                "n_docs": n_docs,
                "sec": round(dt, 2),
                "docs_per_sec": round(n_docs / dt, 1),
                "result_rows": int(len(res)),
                "driver_peak_rss_mb": round(peak_mb, 1),
            }
        )
    )
    ray.shutdown()


def main() -> None:
    if "--child" in sys.argv:
        i = sys.argv.index("--child")
        run_child(sys.argv[i + 1], sys.argv[i + 2])
        return
    if "--joins" in sys.argv:
        # multi-way join family: q9 over a 16× fact+dimension universe
        import shutil

        queries = list(JOIN_CONFIGS)
        for q in queries:
            cfg = JOIN_CONFIGS[q]
            for table, cols in cfg["tables"].items():
                build_scaled_table(table, cols)
            for table in cfg["copy"]:
                dst = Path(SCALED) / f"{table}.parquet"
                if not dst.exists():
                    shutil.copy(f"{BASE}/{table}.parquet", dst)
        scaled = SCALED
    elif "--extra" in sys.argv:
        # round-4 families: value-histogram percentiles (orders) and
        # LEAD-gap TWAP (events)
        queries = [q for q in EXTRA_CONFIGS if q not in HOLISTIC_QUERIES]
        for q in queries:
            build_scaled_table(*EXTRA_CONFIGS[q])
        scaled = SCALED
    elif "--holistic" in sys.argv:
        # tenth wave: interval-overlap global ranks + bounded-k concat
        queries = list(HOLISTIC_QUERIES)
        for q in queries:
            build_scaled_table(*EXTRA_CONFIGS[q])
        scaled = SCALED
    elif "--ann" in sys.argv:
        queries = list(ANN_QUERIES)
        build_scaled_table("embeddings", ("vec_id",))
        scaled = SCALED
    elif "--retrieval" in sys.argv:
        build_scaled()                      # retagged 16x documents (bm25)
        build_scaled_table("embeddings", ("vec_id",))  # 16x vectors (maxsim)
        queries = list(RETRIEVAL_QUERIES)
        scaled = SCALED
    elif "--windows" in sys.argv:
        queries = list(WINDOW_QUERIES)
        for q in queries:
            build_scaled_table(*EXTRA_CONFIGS[q])
        scaled = SCALED
    elif "--classifier" in sys.argv:
        scaled = build_scaled()
        queries = list(CLASSIFIER_QUERIES)
    elif "--substring" in sys.argv:
        scaled = build_scaled()
        queries = list(SUBSTRING_QUERIES)
    elif "--train" in sys.argv:
        scaled = build_scaled()
        queries = list(TRAIN_QUERIES)
    elif "--drift" in sys.argv:
        # corpus-drift family over the retagged 16× documents corpus
        scaled = build_scaled()
        queries = list(DRIFT_QUERIES)
    else:
        scaled = build_scaled()
        queries = ["dedup_exact", "dedup_minhash"]
    for query in queries:
        for d in (BASE, scaled):
            out = subprocess.run(
                [sys.executable, __file__, "--child", query, d],
                capture_output=True,
                text=True,
                check=True,
                cwd=str(Path(__file__).resolve().parent.parent),
            ).stdout
            print(out.strip().splitlines()[-1])


if __name__ == "__main__":
    main()
