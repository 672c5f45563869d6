#!/usr/bin/env python3
"""Write a zero-row copy of every corpus table, preserving the EXACT
parquet schemas (including events.ts timestamp[ns]) — fixture input for
EmptyCorpusSpec's "every query must execute on an empty corpus" sweep.

Usage: python3 tools/make_empty_corpus.py <srcSfDir> <outDir>
"""
import sys, os
import pyarrow.parquet as pq

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def main(src, out):
    os.makedirs(out, exist_ok=True)
    for t in TABLES:
        table = pq.read_table(f"{src}/{t}.parquet")
        pq.write_table(table.slice(0, 0), f"{out}/{t}.parquet")
    print(f"wrote 10 empty tables to {out}")

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
