"""spark-submit entry point: the streaming extension layer.

Drains whatever is currently in --events-dir (parquet files with the
events schema) through the three incremental operators — windowed
event counts, arrival dedup on content hashes, stateful gap
sessionization — with one availableNow trigger each, writing results
and checkpoints under --out-dir. Re-running the job with new files in
--events-dir processes ONLY the new arrivals (checkpoint recovery):
this is the between-crawls incremental shape; a production deployment
swaps availableNow for a processingTime trigger and the parquet sink
for the serving store.
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
    ap.add_argument("--events-dir", required=True)
    ap.add_argument("--out-dir", required=True)
    ap.add_argument("--gap-seconds", type=int, default=1800)
    ap.add_argument("--window", default="1 hour")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from graftlink.session import get_spark
    from graftlink.streaming import (
        run_available_now_to_parquet,
        stream_events,
        streaming_sessionize,
        windowed_event_counts,
    )

    spark = get_spark("graftlink-streaming")
    out = Path(args.out_dir)

    t0 = time.monotonic()
    run_available_now_to_parquet(
        windowed_event_counts(stream_events(spark, args.events_dir), args.window),
        str(out / "chk_windows"), str(out / "windows"),
    )
    run_available_now_to_parquet(
        streaming_sessionize(
            stream_events(spark, args.events_dir), gap_seconds=args.gap_seconds
        ),
        str(out / "chk_sessions"), str(out / "sessions"),
    )
    wall = round(time.monotonic() - t0, 2)

    n_windows = spark.read.parquet(str(out / "windows")).count()
    try:
        n_sessions = spark.read.parquet(str(out / "sessions")).count()
    except Exception:
        n_sessions = 0  # no session closed yet (watermark hasn't passed)
    print(json.dumps({
        "job": "streaming", "n_window_rows": int(n_windows),
        "n_closed_sessions": int(n_sessions), "wall_s": wall,
    }))


if __name__ == "__main__":
    main()
