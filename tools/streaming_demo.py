"""Streaming-pipeline throughput demo: events/sec through the event-time
windowed StreamSpot pipeline (watermark -> windowed chunk counts ->
per-window sketches + LSH isolation flags, exactly-once epoch sink).

Usage: python tools/streaming_demo.py [n_events] [n_gids] [cpus]

Generates (ts, gid, chunk) event files JVM-side, replays them as a file
stream in several micro-batch epochs (maxFilesPerTrigger), and reports
wall time, events/sec and the per-window output row count.  Prints ONE
JSON line.
"""

import json
import shutil
import sys
import tempfile
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from sbustreamspot_core_spark.config import StreamSpotParams
from sbustreamspot_core_spark.session import get_spark
from sbustreamspot_core_spark.streaming.windowed_pipeline import (
    WindowedSketchPipeline,
)

SCHEMA = "ts timestamp, gid long, chunk string"


def main():
    n_events = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    n_gids = int(sys.argv[2]) if len(sys.argv) > 2 else 200
    cpus = int(sys.argv[3]) if len(sys.argv) > 3 else 32
    spark = get_spark(f"sdemo{cpus}", cpus=cpus, shuffle_partitions=cpus)
    work = tempfile.mkdtemp(prefix="stream_demo_")
    src, out, ck = f"{work}/src", f"{work}/out", f"{work}/ck"

    # ~2 hours of event time -> 12 ten-minute windows; bounded chunk vocab
    ev = (
        spark.range(0, n_events, 1, 16)
        .select(
            F.timestamp_seconds(
                F.lit(1_700_000_000) + (F.col("id") * 7200 / n_events)
                .cast("long")).alias("ts"),
            F.pmod(F.xxhash64("id"), n_gids).alias("gid"),
            F.conv(F.pmod(F.xxhash64(F.col("id") + 99), 5000)
                   .cast("string"), 10, 16).alias("chunk"),
        ))
    ev.write.mode("overwrite").parquet(src)

    params = StreamSpotParams()
    pipe = WindowedSketchPipeline(spark, params, out_dir=out,
                                  window="10 minutes", watermark="5 minutes")
    stream = (spark.readStream.schema(SCHEMA)
              .option("maxFilesPerTrigger", 4).parquet(src))
    t0 = time.time()
    q = pipe.start(stream, checkpoint_dir=ck)
    q.awaitTermination()
    wall = round(time.time() - t0, 2)

    res = pipe.results()
    rows = res.count()
    windows = res.select("win_start").distinct().count()
    print(json.dumps({
        "n_events": n_events, "n_gids": n_gids, "cpus": cpus,
        "epochs": len(pipe.epochs_processed),
        "wall_sec": wall,
        "events_per_sec": round(n_events / wall, 1),
        "emitted_rows": rows, "closed_windows": windows,
        "sketch_bits": params.L,
    }))
    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
