"""Persisted IVF index: the at-rest form of the cell-partitioned ANN
layout in operators/similarity.py.

``build_ivf_index`` materializes the index as a parquet table
PARTITIONED BY cell id (one directory per cell) plus a tiny `_centroids`
side table. ``query_ivf_index`` then serves top-k with a cell IN-list
filter that Spark resolves at the FILE LISTING level (PartitionFilters —
only the probed cells' files are ever opened), so serving cost scales
with n_probe/n_cells of the stored index bytes, not just of the compute.

This is the layout a 100 TB vector corpus actually serves from: build
once (one assignment pass over the corpus), then every query batch is a
partition-pruned scan + broadcast probe join + scalar ranking window.
Same fold-exact arithmetic as the in-memory operators — a query answered
from the persisted index is bit-identical to one answered by
``ivf_topk_distributed`` over the raw embeddings (tested).
"""

from __future__ import annotations

import os

import numpy as np

from pyspark.sql import DataFrame, SparkSession, functions as F

from .similarity import (
    _block_cos,
    _normalize_rows,
    _rank_topk,
    _stack64,
    ivf_assign_frame,
)

CENTROIDS_SUBDIR = "_centroids"
CELLS_SUBDIR = "cells"


def build_ivf_index(
    emb: DataFrame, path: str, *, n_cells: int, round_digits: int = 6
) -> None:
    """One assignment pass over the corpus -> cell-partitioned parquet.

    Centroids are the first ``n_cells`` vectors by vec_id (deterministic,
    reproducible — same quantizer as ivf_topk_distributed); they persist
    alongside the cells so queries never need the raw corpus."""
    cent = emb.select("vec_id", "embedding").filter(F.col("vec_id") < n_cells)
    cent.write.mode("overwrite").parquet(os.path.join(path, CENTROIDS_SUBDIR))

    # the persisted cells are EXACTLY the shared assignment operator's
    # output (ivf_assign_frame — also the frame the inline query path
    # pools), renamed to the on-disk schema and partitioned by cell
    index = ivf_assign_frame(
        emb, n_cells=n_cells, round_digits=int(round_digits)
    ).select(F.col("vec_b").alias("vec_id"), "cell", F.col("cnv").alias("nv"))
    index.write.mode("overwrite").partitionBy("cell").parquet(
        os.path.join(path, CELLS_SUBDIR)
    )


def query_ivf_index(
    spark: SparkSession,
    path: str,
    queries: DataFrame,
    *,
    k: int,
    n_probe: int,
    round_digits: int = 6,
) -> DataFrame:
    """Top-k from the persisted index for a bounded query frame
    (vec_id, embedding). The probed cells arrive as an IN-list on the
    PARTITION column, so pruning happens at file listing — unprobed
    cells' bytes are never read (plan-asserted in tests)."""
    rd = int(round_digits)
    cent_rows = spark.read.parquet(os.path.join(path, CENTROIDS_SUBDIR)).collect()
    cent_ids = np.array([r["vec_id"] for r in cent_rows], dtype=np.int64)
    cmat = _normalize_rows(
        np.stack(
            [np.asarray(r["embedding"], dtype=np.float32) for r in cent_rows]
        ).astype(np.float64)
    )

    q_rows = queries.select("vec_id", "embedding").collect()  # bounded by contract
    qids = np.array([r["vec_id"] for r in q_rows], dtype=np.int64)
    qnv = _normalize_rows(
        np.stack(
            [np.asarray(r["embedding"], dtype=np.float32) for r in q_rows]
        ).astype(np.float64)
    )
    probe_rows = []
    if len(qids):
        qsim_r = np.round(_block_cos(qnv, cmat), rd)
        for qi, qid in enumerate(qids):
            order = cent_ids[np.lexsort((cent_ids, -qsim_r[qi]))][:n_probe]
            for c in order:
                probe_rows.append((int(qid), int(c), qnv[qi].tolist()))
    probes = spark.createDataFrame(
        probe_rows, schema="vec_a bigint, pcell bigint, qnv array<double>"
    )
    probed_cells = sorted({c for _, c, _ in probe_rows})

    index = (
        spark.read.parquet(os.path.join(path, CELLS_SUBDIR))
        # IN-list on the partition column -> file-listing-level pruning
        .filter(F.col("cell").isin(probed_cells))
        .select(F.col("vec_id").alias("vec_b"), "cell", F.col("nv").alias("cnv"))
    )
    cand = index.join(
        F.broadcast(probes),
        (F.col("cell") == F.col("pcell")) & (F.col("vec_b") != F.col("vec_a")),
    )

    def dot(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue
            a = _stack64(pdf["qnv"])
            b = _stack64(pdf["cnv"])
            acc = np.zeros(len(pdf), dtype=np.float64)
            for i in range(a.shape[1]):  # fold-identical
                acc += a[:, i] * b[:, i]
            yield pd.DataFrame(
                {
                    "vec_a": pdf["vec_a"].astype("int64"),
                    "vec_b": pdf["vec_b"].astype("int64"),
                    "cos_sim": np.round(acc, rd),
                }
            )

    scored = cand.mapInPandas(dot, schema="vec_a bigint, vec_b bigint, cos_sim double")
    return _rank_topk(scored, k)
