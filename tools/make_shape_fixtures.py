#!/usr/bin/env python3
"""Re-encode the sf0.001 events table as parquet TIMESTAMP(NANOS) — the
physical shape the ORIGINAL driver corpus used before the round-5
regeneration flipped it to micros. CorpusShapeSpec reads this fixture to
prove graft.Tables detects the unit from the footer and returns identical
rows either way (the round-6 "detect, don't bake in" lesson, pinned).

Usage: python3 tools/make_shape_fixtures.py <sfDir> <outDir>
"""
import sys, os
import pyarrow as pa
import pyarrow.parquet as pq


def main(src, out):
    os.makedirs(out, exist_ok=True)
    t = pq.read_table(f"{src}/events.parquet")
    fields = [
        pa.field(f.name, pa.timestamp("ns") if f.name == "ts" else f.type)
        for f in t.schema
    ]
    cast = t.cast(pa.schema(fields))
    pq.write_table(cast, f"{out}/events.parquet",
                   use_deprecated_int96_timestamps=False,
                   coerce_timestamps=None, store_schema=False)
    back = pq.read_schema(f"{out}/events.parquet")
    assert str(back.field("ts").type) == "timestamp[ns]", back
    print(f"wrote nanos events fixture to {out} ({t.num_rows} rows)")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
