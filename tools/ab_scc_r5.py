"""Interleaved A/B: round-4 SCC (unhinted loop joins) vs round-5 SCC
(shuffle_hash-hinted) on the bench graph (round-4 verdict task #6 —
separate box noise from the hint effect). Alternating runs in ONE
session so environment drift hits both arms equally.

Usage: python tools/ab_scc_r5.py [reps] [out.json]
"""

from __future__ import annotations

import importlib.util
import json
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def load_variant(name: str, path: str):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    out = sys.argv[2] if len(sys.argv) > 2 else "ab_scc_r5.json"
    from graftlink.gen import synthetic_edges
    from graftlink.session import get_spark

    import graftlink.scc as scc_r5

    scc_r4 = load_variant("scc_r4_variant", "/tmp/scc_r4.py")

    spark = get_spark("ab-scc", cores=32, shuffle_partitions=32)
    edges = synthetic_edges(spark, 200000, 2000000).localCheckpoint(eager=True)
    walls = {"r4_unhinted": [], "r5_hinted": []}
    counts = set()
    for rep in range(reps):
        for arm, mod in (("r4_unhinted", scc_r4), ("r5_hinted", scc_r5)):
            t0 = time.monotonic()
            n = (
                mod.strongly_connected_components(edges)
                .select("component").distinct().count()
            )
            walls[arm].append(round(time.monotonic() - t0, 2))
            counts.add(n)
            print(arm, rep, walls[arm][-1], "s", flush=True)
    assert len(counts) == 1, f"arms disagree on SCC count: {counts}"
    res = {
        arm: {
            "walls": w,
            "median": round(statistics.median(w), 2),
            "min": min(w),
        }
        for arm, w in walls.items()
    }
    res["scc_count"] = counts.pop()
    res["graph"] = "200k v / 2M e, local[32]"
    res["r4_bench_wall"] = 32.16
    res["r3_bench_wall"] = 27.99
    with open(out, "w") as f:
        json.dump(res, f, indent=1)
    print(json.dumps({k: v for k, v in res.items() if k != "graph"}))


if __name__ == "__main__":
    main()
