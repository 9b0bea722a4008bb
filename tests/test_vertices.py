"""Dense-id dictionary (E2) + degrees (E9)."""

from graftlink.vertices import degrees, dense_rank_ids, encode_edges, encode_vertices

from tests.conftest import edges_df


def test_dense_ids_both_methods_identical(spark):
    urls = spark.createDataFrame(
        [(f"https://h{i % 7}.example/p{i}",) for i in range(200)], "url string"
    )
    via_window = {
        r["url"]: r["id"]
        for r in encode_vertices(urls, method="window").collect()
    }
    via_two_pass = {
        r["url"]: r["id"]
        for r in encode_vertices(urls, method="two_pass", partitions=5).collect()
    }
    assert via_window == via_two_pass
    ids = sorted(via_window.values())
    assert ids == list(range(len(ids)))  # dense 0..k-1
    # rank == ascending url order
    by_id = sorted(via_window, key=via_window.get)
    assert by_id == sorted(by_id)


def test_dense_ids_deterministic_across_runs(spark):
    urls = spark.createDataFrame(
        [(f"u{i}",) for i in range(57)], "url string"
    )
    a = {r["url"]: r["id"] for r in encode_vertices(urls).collect()}
    b = {r["url"]: r["id"] for r in encode_vertices(urls).collect()}
    assert a == b


def test_dense_rank_long_keys(spark):
    labels = spark.createDataFrame([(x,) for x in [42, 7, 42, 99]], "label long")
    m = {r["label"]: r["component"] for r in
         dense_rank_ids(labels, "label", out_col="component").collect()}
    assert m == {7: 0, 42: 1, 99: 2}


def test_encode_edges_roundtrip(spark):
    es = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("a", "c")], "src_url string, dst_url string"
    )
    verts = encode_vertices(
        es.selectExpr("src_url as url").union(es.selectExpr("dst_url as url"))
    )
    edges = encode_edges(es, verts)
    got = {(r["src"], r["dst"]) for r in edges.collect()}
    assert got == {(0, 1), (1, 2), (0, 2)}  # a=0, b=1, c=2


def test_degrees(spark):
    e = edges_df(spark, [(0, 1), (0, 2), (1, 2), (3, 0)])
    out = {r["id"]: r["degree"] for r in degrees(e, "out").collect()}
    assert out == {0: 2, 1: 1, 3: 1}
    inn = {r["id"]: r["degree"] for r in degrees(e, "in").collect()}
    assert inn == {1: 1, 2: 2, 0: 1}
    alld = {r["id"]: r["degree"] for r in degrees(e, "all").collect()}
    assert alld == {0: 3, 1: 2, 2: 2, 3: 1}


def test_salted_pack_splits_hub_and_keeps_full_degree(spark):
    """A src with deg > max_block is packed as multiple (src, chunk)
    rows by the salted two-phase pack; out_deg stays the full degree
    on every chunk (the rank/out_deg correctness invariant)."""
    from pyspark.sql import functions as F

    from graftlink.adjacency import pack_adjacency
    from tests.conftest import edges_df

    hub_edges = [(0, i) for i in range(1, 101)] + [(1, 2), (2, 3)]
    e = edges_df(spark, hub_edges)
    adj = pack_adjacency(e, buckets=4, max_block=16)
    rows = adj.where(F.col("src") == 0).collect()
    assert len(rows) >= 4  # 100 neighbors / 16 per block
    assert all(r.out_deg == 100 for r in rows)
    assert all(len(r.neighbors) <= 40 for r in rows)  # ~max_block + hash slack
    got = sorted(n for r in rows for n in r.neighbors)
    assert got == list(range(1, 101))  # no neighbor lost or duplicated
