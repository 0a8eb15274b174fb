"""PQ benefit measurement (BENCH §6l): scan-byte reduction + wall time +
recall of the product-quantized ANN search vs the exact probed-cell scan,
on the sf0.1 embeddings.

Prints one JSON line:
  - bytes: compressed parquet column bytes the ADC stage needs (code
    column of probed cells) vs what the exact search needs (vector column
    of probed cells) — measured from the layout's footers, i.e. the real
    I/O ratio a column-pruned scan pays;
  - sec_exact / sec_pq: median wall time of 3 trials each;
  - recall: PQ top-k pairs ∩ exact top-k pairs / exact (same index, same
    probed cells, so this isolates the ADC+rerank approximation).

Usage: python tools/bench_pq.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from postgres_to_snowflake_data_pipeline_spark.session import get_spark  # noqa: E402

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
K, NPROBE, RERANK = 5, 2, 40
PQ = (8, 16)  # 8 subspaces x 16 codes over dim 64
N_QUERIES = 8


def main() -> None:
    import pyarrow.parquet as pq

    from pyspark.sql import functions as F

    from postgres_to_snowflake_data_pipeline_spark.functions.vector import (
        to_double_array,
    )
    from postgres_to_snowflake_data_pipeline_spark.lake.ann_index import AnnIndex

    spark = get_spark("bench-pq")
    work = os.path.join(tempfile.gettempdir(), "bench-pq-idx")
    shutil.rmtree(work, ignore_errors=True)

    emb = spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet"))
    ev = emb.select("vec_id", to_double_array("embedding").alias("v"))
    t0 = time.perf_counter()
    idx = AnnIndex.build(
        spark, ev.filter(F.col("vec_id") >= N_QUERIES), work,
        key_col="vec_id", vec_col="v", k=16, iters=3, sample_mod=4, pq=PQ,
    )
    build_s = time.perf_counter() - t0
    queries = ev.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), "v"
    )

    probe = idx.probed_cells(queries, NPROBE)
    vec_b = code_b = 0
    for f in idx.data_files():
        cell = int(f.split("cell=")[1].split("/")[0])
        if cell not in probe:
            continue
        md = pq.ParquetFile(f).metadata
        for rg in range(md.num_row_groups):
            g = md.row_group(rg)
            for ci in range(g.num_columns):
                col = g.column(ci)
                if col.path_in_schema.startswith("v."):
                    vec_b += col.total_compressed_size
                elif col.path_in_schema.startswith("pq."):
                    code_b += col.total_compressed_size

    def timed(fn):
        ts = []
        for _ in range(3):
            t = time.perf_counter()
            fn().write.format("noop").mode("overwrite").save()
            ts.append(time.perf_counter() - t)
        return sorted(ts)[1]

    sec_exact = timed(lambda: idx.search(queries, k=K, nprobe=NPROBE))
    sec_pq = timed(
        lambda: idx.search(queries, k=K, nprobe=NPROBE, pq_rerank=RERANK)
    )
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in idx.search(queries, k=K, nprobe=NPROBE).collect()
    }
    got = {
        (r["query_id"], r["neighbor_id"])
        for r in idx.search(
            queries, k=K, nprobe=NPROBE, pq_rerank=RERANK
        ).collect()
    }
    print(
        json.dumps(
            {
                "sf_dir": SF_DIR,
                "pq": {"m": PQ[0], "k": PQ[1]},
                "build_s": round(build_s, 2),
                "probed_cells": len(probe),
                "adc_scan_bytes": code_b,
                "exact_scan_bytes": vec_b,
                "bytes_ratio": round(vec_b / code_b, 1) if code_b else None,
                "sec_exact": round(sec_exact, 3),
                "sec_pq": round(sec_pq, 3),
                "recall_vs_exact": round(len(got & exact) / len(exact), 3),
                "k": K, "nprobe": NPROBE, "rerank": RERANK,
            }
        )
    )
    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
