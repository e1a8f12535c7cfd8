#!/usr/bin/env python
"""Round-16 probe: where does st2_tumbling_stream's ~1s go?

Runs the same staged-events availableNow stream as the registered query
but keeps the StreamingQuery handle to dump per-batch progress metrics
(durationMs breakdown: addBatch / getBatch / queryPlanning / walCommit /
commitOffsets / stateStore), then times N repeats.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    from recipes_spark.session import get_session
    from recipes_spark.streaming.core import stage_events, stream_events
    from recipes_spark.streaming.queries import tumbling_agg

    overrides = json.loads(os.environ.get("SPARK_GRAFT_PROBE_CONF", "{}"))
    if overrides:
        from pyspark.sql import SparkSession

        from recipes_spark.session import DEFAULT_LOCAL_CPUS, configure

        n = DEFAULT_LOCAL_CPUS
        b = (
            SparkSession.builder.master(f"local[{n}]")
            .appName("st2-probe")
            .config("spark.sql.shuffle.partitions", n)
            .config("spark.driver.memory", "24g")
            .config("spark.ui.enabled", "false")
        )
        b = configure(b)
        for k, v in overrides.items():
            b = b.config(k, v)
        spark = b.getOrCreate()
    else:
        spark = get_session("st2-probe")
    spark.sparkContext.setLogLevel("ERROR")
    stage_events(spark, SF_DIR)
    # warm python workers + parquet footers
    spark.read.parquet(f"{SF_DIR}/lineitem.parquet").count()

    def run_once(idx: int, dump: bool) -> float:
        agg = tumbling_agg(stream_events(spark, SF_DIR))
        t0 = time.perf_counter()
        q = (
            agg.writeStream.format("memory")
            .queryName(f"st2probe_{idx}")
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        wall = time.perf_counter() - t0
        if dump:
            for p in q.recentProgress:
                print(
                    json.dumps(
                        {
                            "batchId": p.get("batchId"),
                            "numInputRows": p.get("numInputRows"),
                            "durationMs": p.get("durationMs"),
                            "stateOperators": [
                                {
                                    k: so.get(k)
                                    for k in (
                                        "numRowsTotal",
                                        "commitTimeMs",
                                        "numShufflePartitions",
                                    )
                                }
                                for so in p.get("stateOperators", [])
                            ],
                        }
                    )
                )
        q.stop()
        return wall

    walls = []
    for i in range(6):
        walls.append(round(run_once(i, dump=(i == 1)), 3))
    print(json.dumps({"walls": walls, "best": min(walls)}))


if __name__ == "__main__":
    main()
