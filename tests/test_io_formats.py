"""igraph text I/O surface (Read_Edgelist / Write_Edgelist /
Read_Ncol): round-trip parity, comment/blank skipping, name-dictionary
determinism."""

from __future__ import annotations

from graftlink.sources import read_edgelist, read_ncol, write_edgelist

from tests.conftest import edges_df
from tests.oracles import er_edges


def test_edgelist_round_trip(spark, tmp_path):
    pairs = er_edges(40, 0.1, 9)
    e = edges_df(spark, pairs)
    out = str(tmp_path / "el")
    write_edgelist(e, out)
    back = read_edgelist(spark, out)
    assert sorted(map(tuple, back.collect())) == sorted(pairs)


def test_edgelist_weights_comments_blanks(spark, tmp_path):
    p = tmp_path / "w.el"
    p.write_text("# a comment\n0 1 2.5\n\n1 2 0.25\n# another\n2 0 1.0\n")
    e = read_edgelist(spark, str(p), weight=True)
    rows = sorted(map(tuple, e.collect()))
    assert rows == [(0, 1, 2.5), (1, 2, 0.25), (2, 0, 1.0)]


def test_ncol_names_and_determinism(spark, tmp_path):
    p = tmp_path / "g.ncol"
    p.write_text("b.example a.example\na.example c.example\nc.example b.example\n")
    edges, names = read_ncol(spark, str(p))
    nm = {r["name"]: r["id"] for r in names.collect()}
    # dense ascending ranks over the sorted name universe
    assert nm == {"a.example": 0, "b.example": 1, "c.example": 2}
    got = sorted(map(tuple, edges.collect()))
    assert got == [(0, 2), (1, 0), (2, 1)]
    # re-read is bit-identical (two-pass rank is deterministic)
    edges2, names2 = read_ncol(spark, str(p))
    assert sorted(map(tuple, edges2.collect())) == got
    assert {r["name"]: r["id"] for r in names2.collect()} == nm


def test_ncol_weighted(spark, tmp_path):
    p = tmp_path / "gw.ncol"
    p.write_text("x y 3.0\ny z 0.5\n")
    edges, names = read_ncol(spark, str(p), weight=True)
    nm = {r["name"]: r["id"] for r in names.collect()}
    got = sorted(map(tuple, edges.collect()))
    assert got == [(nm["x"], nm["y"], 3.0), (nm["y"], nm["z"], 0.5)]
