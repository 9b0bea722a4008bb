"""Similarity search + multimodal plumbing tests.

numpy is the independent oracle for cosine math; the Arrow fast path
must agree with the expression path (which the driver separately
verifies against DuckDB).
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from graftlink.multimodal import decode_media, media_stats, resize_stub, synth_media
from graftlink.similarity import (
    ann_buckets,
    ann_lsh_topk,
    cosine_topk,
    cosine_topk_arrow,
    embedding_near_dups,
    embedding_norms,
)

DIM = 16
N = 120
N_CLUSTERS = 4


def _make_vectors() -> list[tuple[int, list[float]]]:
    """Deterministic clustered vectors: cluster centers + small offsets,
    so true nearest neighbors are same-cluster."""
    rng = np.random.RandomState(42)
    centers = rng.randn(N_CLUSTERS, DIM) * 5
    rows = []
    for i in range(N):
        c = i % N_CLUSTERS
        v = centers[c] + rng.randn(DIM) * 0.3
        rows.append((i, [float(x) for x in v.astype(np.float32)]))
    return rows


@pytest.fixture(scope="module")
def emb_df(spark):
    return spark.createDataFrame(_make_vectors(), "vec_id long, embedding array<float>")


def _np_topk(rows, qids, k):
    ids = np.array([r[0] for r in rows])
    mat = np.array([r[1] for r in rows], dtype=np.float64)
    norms = np.linalg.norm(mat, axis=1)
    out = {}
    for q in qids:
        qv = mat[ids == q][0]
        cos = (mat @ qv) / (norms * np.linalg.norm(qv))
        order = sorted(
            [(round(c, 6), int(i)) for c, i in zip(cos, ids) if i != q],
            key=lambda t: (-t[0], t[1]),
        )
        out[q] = [(i, c) for c, i in order[:k]]
    return out


def test_cosine_topk_matches_numpy(emb_df):
    rows = _make_vectors()
    qids = [0, 1, 2]
    want = _np_topk(rows, qids, k=5)
    got: dict[int, list] = {q: [] for q in qids}
    for r in cosine_topk(emb_df, qids, k=5).collect():
        got[r.query_id].append((r.neighbor_id, r.cos))
    for q in qids:
        got[q].sort(key=lambda t: (-t[1], t[0]))
        assert [i for i, _ in got[q]] == [i for i, _ in want[q]]
        for (gi, gc), (wi, wc) in zip(got[q], want[q]):
            assert gc == pytest.approx(wc, abs=1e-6)


def test_arrow_path_matches_expression_path(emb_df):
    qids = [0, 5, 10]
    expr = {(r.query_id, r.neighbor_id): r.cos for r in cosine_topk(emb_df, qids, k=5).collect()}
    arrow = {(r.query_id, r.neighbor_id): r.cos for r in cosine_topk_arrow(emb_df, qids, k=5).collect()}
    assert set(expr) == set(arrow)
    for key in expr:
        assert expr[key] == pytest.approx(arrow[key], abs=1e-6)


def test_topk_neighbors_are_same_cluster(emb_df):
    got = cosine_topk(emb_df, [0, 1], k=5).collect()
    for r in got:
        assert r.neighbor_id % N_CLUSTERS == r.query_id % N_CLUSTERS
        assert r.cos > 0.9


def test_ann_recall_vs_brute_force(emb_df):
    qids = [0, 1, 2, 3]
    brute = {(r.query_id, r.neighbor_id) for r in cosine_topk(emb_df, qids, k=5).collect()}
    ann = {(r.query_id, r.neighbor_id) for r in ann_lsh_topk(emb_df, qids, k=5, dim=DIM).collect()}
    recall = len(brute & ann) / len(brute)
    # clustered vectors land in the same hyperplane bucket most of the time
    assert recall >= 0.5, f"ANN recall {recall}"
    # and whatever ANN returns must be genuinely high-cosine
    for r in ann_lsh_topk(emb_df, qids, k=5, dim=DIM).collect():
        assert r.cos > 0.8


def test_ann_buckets_deterministic(emb_df):
    b1 = {(r.id, r.bucket) for r in ann_buckets(emb_df, dim=DIM).collect()}
    b2 = {(r.id, r.bucket) for r in ann_buckets(emb_df.repartition(7), dim=DIM).collect()}
    assert b1 == b2
    assert all(0 <= b < 256 for _, b in b1)


def test_embedding_near_dups_symmetric_clusters(emb_df):
    pairs = embedding_near_dups(emb_df, threshold=0.95).collect()
    assert len(pairs) > 0
    for r in pairs:
        assert r.a < r.b
        assert r.a % N_CLUSTERS == r.b % N_CLUSTERS


def test_embedding_near_dups_tiled_equals_allpairs(emb_df):
    """The default tiled plan must be EXACT: same (a, b, cos) set as
    the cross-join spec, regardless of block layout (block_rows=32
    forces 4 blocks / 10 tiles on the 120-row fixture)."""
    tiled = {
        (r.a, r.b, r.cos)
        for r in embedding_near_dups(
            emb_df, threshold=0.9, block_rows=32
        ).collect()
    }
    spec = {
        (r.a, r.b, r.cos)
        for r in embedding_near_dups(emb_df, threshold=0.9, method="allpairs").collect()
    }
    assert tiled == spec
    assert len(tiled) > 0


def test_embedding_near_dups_no_crossjoin_in_tiled_plan(emb_df):
    from tests.test_plans import plan_of

    plan = plan_of(embedding_near_dups(emb_df, block_rows=32))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_embedding_norms(emb_df):
    rows = _make_vectors()
    want = {i: np.linalg.norm(np.array(v, dtype=np.float64)) for i, v in rows}
    for r in embedding_norms(emb_df).collect():
        assert r.dim == DIM
        assert r.norm == pytest.approx(want[r.id], abs=1e-5)


# ---------------------------------------------------------------------------
# multimodal
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def media_df(spark):
    docs = spark.createDataFrame(
        [(i, f"document body {i} " * (i + 1)) for i in range(9)],
        "doc_id long, text string",
    )
    return synth_media(docs)


def test_synth_media_schema(media_df):
    row = media_df.orderBy("media_id").first()
    assert row.kind == "image"  # id 0 -> element_at(kinds, 1)
    assert isinstance(row.payload, (bytes, bytearray))
    assert row.meta.width == 16 and row.meta.sample_rate == 16000


def test_decode_media_fake_features(media_df):
    feats = {r.media_id: r for r in decode_media(media_df, codec="fake").collect()}
    payloads = {r.media_id: bytes(r.payload) for r in media_df.collect()}
    for mid, p in payloads.items():
        arr = np.frombuffer(p, dtype=np.uint8)
        f = feats[mid]
        assert f.n_bytes == len(arr)
        assert f.byte_mean == pytest.approx(float(arr.mean()), abs=1e-9)
        assert sum(f.histogram) == len(arr)
        assert len(f.frames) <= 8


def test_decode_media_real_raises(media_df):
    import pytest as _pytest

    with _pytest.raises(Exception) as exc_info:
        decode_media(media_df, codec="real").collect()
    assert "NotImplementedError" in str(exc_info.value) or isinstance(
        exc_info.value, NotImplementedError
    )


def test_resize_stub_updates_meta_only(media_df):
    out = resize_stub(media_df, 32, 32).collect()
    assert len(out) > 0
    for r in out:
        assert r.kind == "image"
        assert r.meta.width == 32 and r.meta.height == 32


def test_media_stats(media_df):
    rows = {r.kind: r for r in media_stats(media_df).collect()}
    assert set(rows) == {"image", "audio", "video"}
    assert sum(r.n_items for r in rows.values()) == 9
