"""spark-submit entry point: community detection family.

--algo picks louvain | leiden | infomap | walktrap | fastgreedy |
leading_eigenvector (lpa has its own job). Bounded-rounds knobs
mirror the library defaults; walktrap is Theta(mn) by algorithm (see
graftlink/walktrap.py envelope) so size inputs accordingly.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--algo", default="louvain",
                    choices=["louvain", "leiden", "infomap", "walktrap",
                             "fastgreedy", "leading_eigenvector"])
    ap.add_argument("--edges")
    ap.add_argument("--synthetic")
    ap.add_argument("--levels", type=int, default=3)
    ap.add_argument("--max-rounds", type=int, default=20)
    ap.add_argument("--steps", type=int, default=4,
                    help="walktrap walk length t")
    ap.add_argument("--output")
    args = ap.parse_args()

    from graftlink.gen import synthetic_edges
    from graftlink.session import get_spark

    spark = get_spark(f"graftlink-{args.algo}")
    if args.synthetic:
        n, m = (int(x) for x in args.synthetic.split(","))
        edges = synthetic_edges(spark, n, m)
    else:
        edges = spark.read.parquet(args.edges)

    t0 = time.monotonic()
    if args.algo == "louvain":
        from graftlink.louvain import louvain_communities

        comm = louvain_communities(
            edges, levels=args.levels, max_rounds=args.max_rounds
        )
    elif args.algo == "leiden":
        from graftlink.louvain import leiden_communities

        comm = leiden_communities(
            edges, levels=args.levels, max_rounds=args.max_rounds
        )
    elif args.algo == "infomap":
        from graftlink.infomap import infomap_communities

        comm = infomap_communities(
            edges, levels=args.levels, max_rounds=args.max_rounds
        )
    elif args.algo == "fastgreedy":
        from graftlink.fastgreedy import fastgreedy_communities

        comm = fastgreedy_communities(edges, max_rounds=args.max_rounds)
    elif args.algo == "leading_eigenvector":
        from graftlink.leading_eigenvector import (
            leading_eigenvector_communities,
        )

        comm = leading_eigenvector_communities(edges)
    else:
        from graftlink.walktrap import walktrap_communities

        comm = walktrap_communities(edges, steps=args.steps)

    if args.output:
        comm.write.mode("overwrite").parquet(args.output)
        comm = spark.read.parquet(args.output)
    n_comm = comm.agg({"community": "max"}).collect()[0][0] + 1
    n_vert = comm.count()
    print(json.dumps({
        "job": f"community-{args.algo}",
        "n_communities": int(n_comm),
        "n_vertices": int(n_vert),
        "wall_s": round(time.monotonic() - t0, 2),
    }))


if __name__ == "__main__":
    main()
