"""Text / dedup / ANN operator tests over the driver's sf0.001 tables
plus controlled synthetic corpora for near-dup recall checks."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import ray.data as rd

from osm2shp_ray.stages import ann, dedup, text

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs_ds(ray_session):
    t = pq.read_table(f"{SF}/documents.parquet")
    return rd.from_arrow(t), t


@pytest.fixture(scope="module")
def emb_ds(ray_session):
    t = pq.read_table(f"{SF}/embeddings.parquet")
    return rd.from_arrow(t), t


def test_token_count_matches_python(docs_ds):
    ds, t = docs_ds
    out = ds.map_batches(text.token_count_batch, batch_format="pyarrow").to_pandas()
    exp = [len(s.split()) if s.strip() else 0 for s in t["text"].to_pylist()]
    assert out.sort_values("doc_id")["n_tokens"].tolist() == \
        pd.DataFrame({"doc_id": t["doc_id"].to_numpy(), "e": exp}).sort_values("doc_id")["e"].tolist()
    assert (out["n_bpe_tokens"] >= out["n_tokens"]).all()


def test_quality_scores_bounded(docs_ds):
    ds, _ = docs_ds
    out = ds.map_batches(text.quality_score_batch, batch_format="pyarrow").to_pandas()
    for c in ("punct_ratio", "upper_ratio", "digit_ratio"):
        assert (out[c] >= 0).all() and (out[c] <= 1).all()
    assert out["quality"].between(0, 1.01).all()


def test_langid(ray_session):
    t = pa.table({
        "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
        "text": pa.array([
            "the cat and the dog went to the park and it was good",
            "der Hund und die Katze sind nicht auf der Straße",
            "le chat est dans la maison et il ne dort pas",
            "zzz qqq xxx",
        ]),
    })
    out = (rd.from_arrow(t)
           .map_batches(text.langid_batch, batch_format="pyarrow")
           .to_pandas().sort_values("doc_id"))
    assert out["lang_pred"].tolist() == ["en", "de", "fr", "und"]


def test_fingerprint_properties(docs_ds):
    ds, t = docs_ds
    out = (ds.map_batches(text.fingerprint_batch, batch_format="pyarrow")
           .take_batch(500, batch_format="pyarrow"))
    fps = out["fingerprint"].to_pylist()
    assert all(len(f) <= 8 for f in fps)
    assert all(list(f) == sorted(f) for f in fps)
    # deterministic: same text -> same fingerprint
    df = pd.DataFrame({"text": t["text"].to_pylist(), "fp": [tuple(f) for f in fps]})
    for _txt, grp in df.groupby("text"):
        assert grp["fp"].nunique() == 1


def _near_dup_corpus():
    base = ("the quick brown fox jumps over the lazy dog while the sun "
            "sets behind distant purple mountains casting long shadows")
    rng = np.random.default_rng(13)
    vocab = [f"w{rng.integers(0, 10**9):09d}" for _ in range(600)]
    rows = []
    for i in range(30):
        words = rng.choice(vocab, size=20, replace=False)
        rows.append((i, " ".join(words)))
    rows.append((100, base))
    rows.append((101, base.replace("quick", "quik")))        # near-dup of 100
    rows.append((102, base))                                  # exact dup of 100
    rows.append((103, "completely unrelated text about cooking pasta al dente"))
    return pa.table({"doc_id": pa.array([r[0] for r in rows], pa.int64()),
                     "text": pa.array([r[1] for r in rows], pa.string())})


def test_minhash_lsh_pairs(ray_session):
    t = _near_dup_corpus()
    pairs = dedup.lsh_candidate_pairs(rd.from_arrow(t), threshold=0.6).to_pandas()
    got = set(zip(pairs["id_a"], pairs["id_b"]))
    assert (100, 102) in got     # exact dup found
    assert (100, 101) in got     # near dup found
    assert all(a >= 100 or b >= 100 for a, b in got)  # no false pairs among uniques


def test_dedup_minhash_filters(ray_session):
    t = _near_dup_corpus()
    out = dedup.dedup_minhash(rd.from_arrow(t), threshold=0.6).to_pandas()
    ids = set(out["doc_id"])
    assert 100 in ids and 101 not in ids and 102 not in ids
    assert 103 in ids and len(ids) == 32


def test_simhash_near_dup(ray_session):
    t = _near_dup_corpus()
    pairs = dedup.simhash_near_dup_pairs(rd.from_arrow(t), max_hamming=4).to_pandas()
    got = set(zip(pairs["id_a"], pairs["id_b"]))
    assert (100, 102) in got
    assert (100, 101) in got


def test_ngram_jaccard(ray_session):
    t = _near_dup_corpus()
    pairs = dedup.ngram_jaccard_pairs(rd.from_arrow(t), threshold=0.5).to_pandas()
    got = set(zip(pairs["id_a"], pairs["id_b"]))
    assert (100, 102) in got


def test_embedding_near_dup(emb_ds):
    ds, t = emb_ds
    # plant a near-identical pair
    vecs = [np.asarray(v, dtype=np.float64) for v in t["embedding"].to_pylist()]
    planted = pa.table({
        "vec_id": pa.array([9001, 9002], pa.int64()),
        "embedding": pa.array([vecs[0].tolist(),
                               (vecs[0] * 1.001 + 1e-4).tolist()]),
        "label": pa.array([0, 0], pa.int32()),
    })
    full = rd.from_arrow(pa.concat_tables(
        [t.cast(planted.schema), planted]))
    pairs = dedup.embedding_near_dup_pairs(full, threshold=0.999).to_pandas()
    got = set(zip(pairs["id_a"], pairs["id_b"]))
    assert (9001, 9002) in got


def test_brute_force_topk_matches_numpy(emb_ds):
    ds, t = emb_ds
    vecs = np.stack([np.asarray(v, dtype=np.float64) for v in t["embedding"].to_pylist()])
    ids = t["vec_id"].to_numpy()
    q = vecs[[3, 17]]
    out = ann.brute_force_topk(ds, q, k=5).to_pandas()
    vn = ann._normalize(vecs)
    qn = ann._normalize(q)
    sims = vn @ qn.T
    for qi in range(2):
        order = np.lexsort((ids, -sims[:, qi]))[:5]
        exp = ids[order].tolist()
        got = out[out["query_id"] == qi].sort_values(
            ["cosine", "vec_id"], ascending=[False, True])["vec_id"].tolist()
        assert got == exp


def test_ivf_topk_recall(emb_ds):
    ds, t = emb_ds
    vecs = np.stack([np.asarray(v, dtype=np.float64) for v in t["embedding"].to_pylist()])
    q = vecs[[3, 17]]
    cent = ann.train_centroids(ds, n_centroids=8)
    indexed = ann.assign_centroids(ds, cent)
    got = ann.ivf_topk(indexed, cent, q, k=5, nprobe=4).to_pandas()
    exact = ann.brute_force_topk(ds, q, k=5).to_pandas()
    for qi in range(2):
        g = set(got[got["query_id"] == qi]["vec_id"])
        e = set(exact[exact["query_id"] == qi]["vec_id"])
        assert len(g & e) >= 3   # recall@5 >= 0.6 with nprobe=4 of 8
