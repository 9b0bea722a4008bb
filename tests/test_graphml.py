"""GraphML/GML interchange I/O: fixture parse, attribute typing,
round-trips, name determinism (round-4 verdict Missing #1)."""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import functions as F

from graftlink.graphml import (
    read_gml,
    read_graphml,
    write_gml,
    write_graphml,
)

FIXTURE = str(Path(__file__).parent / "fixtures" / "sample.graphml")


def test_read_graphml_fixture(spark):
    edges, names, directed = read_graphml(spark, FIXTURE)
    assert directed
    nm = {r["name"]: r for r in names.collect()}
    assert set(nm) == {"a", "b", "c", "d"}
    # dense ids are sorted-name ranks (read_ncol convention)
    assert [nm[k]["id"] for k in ["a", "b", "c", "d"]] == [0, 1, 2, 3]
    # typed attribute + <default>
    assert nm["a"]["color"] == "red"
    assert nm["b"]["color"] == "gray"
    got = {
        (r["src"], r["dst"]): r["weight"] for r in edges.collect()
    }
    assert got == {(0, 1): 1.5, (1, 2): 2.0, (2, 0): 0.25, (2, 3): 3.0}


def test_graphml_roundtrip(spark, tmp_path):
    edges, names, _ = read_graphml(spark, FIXTURE)
    out = str(tmp_path / "rt.graphml")
    write_graphml(
        edges, names.select("id", "name"), out, weight_col="weight"
    )
    e2, n2, directed = read_graphml(spark, out)
    assert directed
    assert sorted(map(tuple, e2.collect())) == sorted(map(tuple, edges.collect()))
    assert sorted(map(tuple, n2.select("id", "name").collect())) == sorted(
        map(tuple, names.select("id", "name").collect())
    )


def test_gml_roundtrip(spark, tmp_path):
    edges, names, _ = read_graphml(spark, FIXTURE)
    out = str(tmp_path / "rt.gml")
    write_gml(edges, names.select("id", "name"), out, weight_col="weight")
    e2, n2, directed = read_gml(spark, out)
    assert directed
    # GML node ids are our dense ids; labels carry the names
    assert sorted(map(tuple, e2.select("src", "dst").collect())) == sorted(
        map(tuple, edges.select("src", "dst").collect())
    )
    got_w = {(r["src"], r["dst"]): r["weight"] for r in e2.collect()}
    want_w = {(r["src"], r["dst"]): r["weight"] for r in edges.collect()}
    assert got_w == want_w
    assert {r["name"] for r in n2.collect()} == {"a", "b", "c", "d"}


def test_gml_hand_built(spark, tmp_path):
    p = tmp_path / "hand.gml"
    p.write_text(
        'graph [\n  directed 1\n'
        '  node [ id 7 label "x" size 3 ]\n'
        '  node [ id 9 label "y" size 5 ]\n'
        '  edge [ source 7 target 9 weight 2.5 ]\n'
        ']\n'
    )
    edges, names, directed = read_gml(spark, str(p))
    assert directed
    nm = {r["name"]: r for r in names.collect()}
    assert nm["x"]["size"] == 3 and nm["y"]["size"] == 5
    (er,) = edges.collect()
    assert er["weight"] == 2.5
    # ids are dense ranks over the gml id strings ("7" < "9")
    assert (er["src"], er["dst"]) == (0, 1)


def test_undirected_flag(spark, tmp_path):
    p = tmp_path / "u.graphml"
    p.write_text(
        '<graphml xmlns="http://graphml.graphdrawing.org/xmlns">'
        '<graph edgedefault="undirected">'
        '<node id="n0"/><node id="n1"/>'
        '<edge source="n0" target="n1"/>'
        "</graph></graphml>"
    )
    _, _, directed = read_graphml(spark, str(p))
    assert not directed


def test_implicit_nodes_get_ids(spark, tmp_path):
    """GraphML allows edges referencing undeclared nodes."""
    p = tmp_path / "i.graphml"
    p.write_text(
        '<graphml xmlns="http://graphml.graphdrawing.org/xmlns">'
        '<graph edgedefault="directed">'
        '<edge source="p" target="q"/>'
        "</graph></graphml>"
    )
    edges, names, _ = read_graphml(spark, str(p))
    assert {r["name"] for r in names.collect()} == {"p", "q"}
    assert edges.count() == 1


def test_determinism_across_partitioning(spark):
    e1, n1, _ = read_graphml(spark, FIXTURE)
    orig = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "7")
    try:
        e2, n2, _ = read_graphml(spark, FIXTURE)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", orig)
    assert sorted(map(tuple, e1.collect())) == sorted(map(tuple, e2.collect()))
    assert sorted(map(tuple, n1.collect())) == sorted(map(tuple, n2.collect()))
