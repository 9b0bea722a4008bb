"""Forward-push batch PPR (graftlink/ppr.py): python spec twin, mass
conservation, locality, determinism, DuckDB twin."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from graftlink.ppr import ppr_push
from tests.conftest import edges_df


def _python_ppr(edges, seeds, alpha=0.85, rounds=10):
    """Pure-python sync forward push, contributions summed in
    ascending pusher order (the module's fold spec)."""
    e = sorted({(a, b) for a, b in edges if a != b})
    out = {}
    for a, b in e:
        out.setdefault(a, []).append(b)
    state = {s: {s: (0.0, 1.0)} for s in seeds}
    for _ in range(rounds):
        for s in seeds:
            cur = state[s]
            contribs = {}  # tgt -> list of (u, c)
            for v in sorted(cur):
                p, r = cur[v]
                if r <= 0:
                    continue
                nbrs = out.get(v, [])
                if nbrs:
                    c = (1.0 - alpha) * r / len(nbrs)
                    for t in nbrs:
                        contribs.setdefault(t, []).append((v, c))
                else:
                    contribs.setdefault(s, []).append((-1, (1.0 - alpha) * r))
            nxt = {}
            for v, (p, r) in cur.items():
                nxt[v] = [p + alpha * r, 0.0]
            for t, lst in contribs.items():
                acc = 0.0
                for _, c in sorted(lst):
                    acc += c
                if t not in nxt:
                    nxt[t] = [0.0, 0.0]
                nxt[t][1] = acc
            state[s] = {v: (p, r) for v, (p, r) in nxt.items()}
    res = {}
    for s in seeds:
        for v, (p, r) in state[s].items():
            if p > 0 and round(p, 6) > 0:
                res[(s, v)] = round(p, 6)
    return res


def _spark_ppr(spark, edges, seeds, **kw):
    return {
        (r["seed"], r["id"]): r["ppr"]
        for r in ppr_push(edges_df(spark, edges), seeds, **kw).collect()
    }


def test_ppr_matches_python_spec(spark):
    rng = random.Random(9)
    e = sorted({(rng.randrange(40), rng.randrange(40)) for _ in range(130)})
    e = [(a, b) for a, b in e if a != b]
    got = _spark_ppr(spark, e, [0, 5, 11])
    want = _python_ppr(e, [0, 5, 11])
    assert set(got) == set(want)
    for k in want:
        assert got[k] == pytest.approx(want[k], abs=2e-6)


def test_ppr_mass_conservation(spark):
    # total settled mass after R rounds = alpha * sum_{t<R} (1-alpha)^t
    # exactly (dangling teleports keep every unit of mass in play)
    ring_with_tail = [(i, (i + 1) % 10) for i in range(10)] + [(10, 0)]
    got = ppr_push(edges_df(spark, ring_with_tail), [0], rounds=8)
    total = got.agg(F.sum("ppr")).collect()[0][0]
    expect = 0.85 * sum(0.15**t for t in range(8))
    assert total == pytest.approx(expect, abs=1e-5)


def test_ppr_locality(spark):
    # a long path: after R rounds nothing beyond R hops has mass
    path = [(i, i + 1) for i in range(30)]
    got = _spark_ppr(spark, path, [0], rounds=5)
    assert all(v <= 5 for (_, v) in got)
    assert (0, 0) in got


def test_ppr_seed_self_mass_dominates(spark):
    rng = random.Random(4)
    e = sorted({(rng.randrange(30), rng.randrange(30)) for _ in range(100)})
    e = [(a, b) for a, b in e if a != b]
    got = _spark_ppr(spark, e, [3])
    by_node = {v: p for (_, v), p in got.items()}
    assert by_node[3] == max(by_node.values())


def test_ppr_deterministic_across_partitioning(spark):
    rng = random.Random(17)
    e = sorted({(rng.randrange(35), rng.randrange(35)) for _ in range(110)})
    e = [(a, b) for a, b in e if a != b]
    a = sorted(
        map(tuple, ppr_push(edges_df(spark, e).repartition(1), [0, 7]).collect())
    )
    b = sorted(
        map(tuple, ppr_push(edges_df(spark, e).repartition(7), [0, 7]).collect())
    )
    assert a == b


def test_ppr_duckdb_twin(spark):
    import duckdb

    from graftlink.ppr import ppr_push_sql

    rng = random.Random(23)
    e = sorted({(rng.randrange(30), rng.randrange(30)) for _ in range(90)})
    e = [(a, b) for a, b in e if a != b]
    sp = sorted(map(tuple, ppr_push(edges_df(spark, e), [0, 9]).collect()))
    vals = ",".join(f"(CAST({a} AS BIGINT), CAST({b} AS BIGINT))" for a, b in e)
    tw = sorted(
        map(
            tuple,
            duckdb.connect()
            .execute(
                ppr_push_sql(f"SELECT * FROM (VALUES {vals}) AS t(src,dst)", [0, 9])
            )
            .fetchall(),
        )
    )
    assert sp == tw


def test_ppr_resume_exact(spark, tmp_path):
    from graftlink.checkpoint import fingerprint_edges
    from graftlink.ppr import ppr_push

    rng = random.Random(31)
    e = sorted({(rng.randrange(30), rng.randrange(30)) for _ in range(90)})
    e = [(a, b) for a, b in e if a != b]
    df = edges_df(spark, e)
    fp = fingerprint_edges(df)

    def vecs(res):
        return {(r.seed, r.id): r.ppr for r in res.collect()}

    full = vecs(
        ppr_push(df, [0, 5], rounds=8,
                 checkpoint_dir=str(tmp_path / "f"), fingerprint=fp)
    )
    d = str(tmp_path / "k")
    ppr_push(df, [0, 5], rounds=3, checkpoint_dir=d, fingerprint=fp)
    resumed = vecs(
        ppr_push(df, [0, 5], rounds=8, checkpoint_dir=d, resume=True,
                 fingerprint=fp)
    )
    assert full == resumed  # same fold sequence -> bit-equal at 6dp
