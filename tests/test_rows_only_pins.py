"""Query-level invariant pins for the rows-only entries that had only
kernel-level coverage (VERDICT r3 next #6): dedup_simhash,
lang_id_confusion, doc_fingerprints, knn_lsh. Each pin is an exact
driver reimplementation (or a recall floor vs the exact twin for the
approximate-by-design ANN), so the distributed path can't silently
drift from the query's contract.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


@pytest.mark.usefixtures("ray_session")
def test_dedup_simhash_matches_driver_bruteforce(sf_dir):
    from gotenberg_ray.functions.hashing import hamming64, simhash64_batch
    from gotenberg_ray.pipelines import textops as T

    got = T.dedup_simhash(sf_dir)

    docs = pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    ).sort_by([("doc_id", "ascending")])
    ids = docs["doc_id"].to_numpy(zero_copy_only=False)
    sigs = simhash64_batch(docs["text"]).astype(np.uint64)
    buckets = (sigs >> np.uint64(48)).astype(np.int64)
    rows = []
    for b in np.unique(buckets):
        sel = np.flatnonzero(buckets == b)
        for x in range(len(sel)):
            for y in range(x + 1, len(sel)):
                i, j = sel[x], sel[y]
                d = int(hamming64(sigs[i : i + 1], int(sigs[j]))[0])
                if d <= 10:
                    rows.append((int(ids[i]), int(ids[j]), d))
    exp = (
        pd.DataFrame(rows, columns=["a_id", "b_id", "hamming"])
        .astype("int64")
        .sort_values(["a_id", "b_id"])
        .reset_index(drop=True)
    )
    if exp.empty:
        exp = pd.DataFrame(
            {c: pd.Series([], dtype="int64") for c in ("a_id", "b_id", "hamming")}
        )
    pd.testing.assert_frame_equal(got, exp)
    # determinism: the bucketed shuffle must not reorder results
    pd.testing.assert_frame_equal(got, T.dedup_simhash(sf_dir))


@pytest.mark.usefixtures("ray_session")
def test_lang_id_confusion_matches_driver(sf_dir):
    from gotenberg_ray.functions import textkit as TK
    from gotenberg_ray.pipelines import textops as T

    got = T.lang_id_confusion(sf_dir)

    docs = pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["text", "lang"]
    ).to_pandas()
    docs["predicted"] = TK.predict_lang(docs["text"].tolist())
    exp = (
        docs.groupby(["lang", "predicted"], as_index=False)
        .size()
        .rename(columns={"size": "n"})
        .sort_values(["lang", "predicted"])
        .reset_index(drop=True)
    )
    exp["n"] = exp["n"].astype("int64")
    pd.testing.assert_frame_equal(got, exp)
    # the confusion matrix must account for every document exactly once
    assert got["n"].sum() == len(docs)


@pytest.mark.usefixtures("ray_session")
def test_doc_fingerprints_match_driver_and_whitespace_invariance(sf_dir, tmp_path):
    from gotenberg_ray.functions import textkit as TK
    from gotenberg_ray.pipelines import textops as T

    got = T.doc_fingerprints(sf_dir)
    docs = (
        pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    exp = pd.DataFrame(
        {
            "doc_id": docs["doc_id"].astype("int64"),
            "fingerprint": TK.fingerprint(docs["text"].tolist()),
        }
    )
    pd.testing.assert_frame_equal(got, exp)

    # winnowing contract: equal token STREAMS fingerprint equally even
    # under different whitespace; different streams differ
    t = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "text": pa.array(
                [
                    "alpha beta gamma delta epsilon zeta",
                    "  alpha\tbeta  gamma\ndelta epsilon zeta ",
                    "alpha beta gamma delta epsilon DIFFERENT",
                ]
            ),
        }
    )
    pq.write_table(t, tmp_path / "documents.parquet")
    fp = T.doc_fingerprints(str(tmp_path)).set_index("doc_id")["fingerprint"]
    assert fp[1] == fp[2]
    assert fp[1] != fp[3]


@pytest.mark.usefixtures("ray_session")
def test_knn_lsh_recall_and_score_exactness(sf_dir):
    from gotenberg_ray.pipelines import embedops as E

    exact = E.knn_topk(sf_dir)
    approx = E.knn_lsh(sf_dir)
    assert len(approx) == len(exact) == 10
    # recall floor vs the brute-force twin (deterministic planes+data)
    recall = len(set(exact["vec_id"]) & set(approx["vec_id"])) / len(exact)
    assert recall >= 0.5
    # rank order must agree with the TRUE cosine order of the returned
    # ids (the LSH filter may drop neighbors, but must never mis-rank
    # the ones it returns)
    emb = pq.read_table(f"{sf_dir}/embeddings.parquet").to_pandas()
    vecs = {int(r.vec_id): np.asarray(r.embedding, dtype=np.float64) for r in emb.itertuples()}
    q = vecs[0] / np.linalg.norm(vecs[0])
    ids = approx.sort_values("rank")["vec_id"].to_numpy()
    true = np.array([float(vecs[int(v)] @ q / np.linalg.norm(vecs[int(v)])) for v in ids])
    # sims strictly compatible with the (sim desc, vec_id asc) contract
    for i in range(len(ids) - 1):
        assert true[i] > true[i + 1] - 1e-9 and (
            true[i] > true[i + 1] + 1e-9 or ids[i] < ids[i + 1]
        )
    # determinism
    pd.testing.assert_frame_equal(approx, E.knn_lsh(sf_dir))
