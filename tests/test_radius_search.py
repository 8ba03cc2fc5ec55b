"""IVF radius search: the lossless prune must (a) never drop a
qualifying neighbor and (b) genuinely CONTRACT the probe set when the
geometry has structure. The corpus query certifies (a) on isotropic
testdata where nothing is prunable (every cell's angular radius ~ pi/2
— see the sim_radius_search_ivf docstring); this module builds
CLUSTERED vectors, where the spherical-triangle bound has teeth, and
asserts both properties there."""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from project_crypto_data_engineering_gcp_spark.functions.vectors import dot as col_dot
from project_crypto_data_engineering_gcp_spark.operators.similarity import (
    _block_cos,
    _collect_centroids,
    _collect_queries,
    ivf_assign_frame,
    ivf_radius_distributed,
    radius_probe_rows,
)

DIM = 16
N_CLUSTERS = 8
PER_CLUSTER = 40
TAU = 0.8
N_QUERIES = 6


@pytest.fixture(scope="module")
def clustered(spark):
    """8 tight clusters on the unit sphere: cluster centers are
    axis-aligned-ish random directions, members are center + small
    noise. Centroid vectors (vec_id < N_CLUSTERS) are placed one per
    cluster so the deterministic first-N quantizer lands one cell per
    cluster — tight rho, prunable geometry."""
    rng = np.random.default_rng(42)
    centers = rng.normal(size=(N_CLUSTERS, DIM))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    rows = []
    vid = 0
    # one near-center vector per cluster FIRST (the quantizer seeds)
    for c in range(N_CLUSTERS):
        v = centers[c] + 0.01 * rng.normal(size=DIM)
        rows.append((vid, [float(x) for x in v]))
        vid += 1
    for c in range(N_CLUSTERS):
        for _ in range(PER_CLUSTER):
            v = centers[c] + 0.05 * rng.normal(size=DIM)
            rows.append((vid, [float(x) for x in v]))
            vid += 1
    return spark.createDataFrame(
        rows, schema="vec_id bigint, embedding array<float>"
    )


def test_radius_prune_contracts_and_stays_exact(spark, clustered):
    emb = clustered
    cent_ids, cmat = _collect_centroids(emb, N_CLUSTERS)
    index = ivf_assign_frame(emb, n_cells=N_CLUSTERS, centroids=(cent_ids, cmat))
    index = index.cache()
    cent_frame = spark.createDataFrame(
        [(int(c), cmat[i].tolist()) for i, c in enumerate(cent_ids)],
        schema="cell bigint, cv array<double>",
    )
    rho_rows = (
        index.join(F.broadcast(cent_frame), "cell")
        .groupBy("cell")
        .agg(F.min(col_dot("cnv", "cv")).alias("mc"))
        .collect()
    )
    rho = {r["cell"]: math.acos(max(-1.0, min(1.0, r["mc"]))) for r in rho_rows}
    # tight clusters: every cell radius far below pi/2
    assert max(rho.values()) < 0.5

    qids, qnv = _collect_queries(emb, F.col("vec_id") < N_QUERIES)
    probes = radius_probe_rows(
        qids, qnv, cent_ids, cmat, rho, tau=TAU, prune_slack=1e-4
    )
    n_grid = len(qids) * len(rho)
    assert len(probes) < n_grid / 2, (
        f"prune vacuous on clustered geometry: {len(probes)}/{n_grid}"
    )

    # ... and the pruned answer equals the brute-force scan exactly
    got = ivf_radius_distributed(
        emb,
        tau=TAU,
        query_filter=F.col("vec_id") < N_QUERIES,
        n_cells=N_CLUSTERS,
        index=index,
    ).collect()
    got_set = {(r["vec_a"], r["vec_b"], r["cos_sim"]) for r in got}

    # brute force in numpy with the same fold-identical arithmetic
    all_rows = emb.orderBy("vec_id").collect()
    ids = np.array([r["vec_id"] for r in all_rows])
    mat = np.stack(
        [np.asarray(r["embedding"], dtype=np.float32) for r in all_rows]
    ).astype(np.float64)
    mat /= np.sqrt((mat * mat).sum(axis=1, keepdims=True))
    want = set()
    for qi in range(N_QUERIES):
        acc = np.zeros(len(ids))
        for d in range(DIM):
            acc += mat[qi, d] * mat[:, d]
        sims = np.round(acc, 6)
        for j in range(len(ids)):
            if ids[j] != ids[qi] and sims[j] >= TAU:
                want.add((int(ids[qi]), int(ids[j]), float(sims[j])))
    assert got_set == want
    assert len(want) > 0  # non-vacuous
    index.unpersist()


def test_radius_rounding_boundary_kept_near_tau_one(spark):
    """r10 advisor finding: the emitted filter is round(cos, rd) >= tau,
    so pairs with TRUE cosine in [tau - 0.5*10^-rd, tau) belong in the
    answer — and near tau ~ 1 the extra angular reach they need exceeds
    the fixed 1e-4 slack. The prune must therefore run against
    tau_eff = tau - 0.5*10^-rd. Constructed geometry (float64 vectors,
    exact preconditions asserted): a single-member cell whose only
    answer pair sits in the rounding band, with the query angled so the
    UN-corrected bound provably prunes the cell."""
    tau = 0.999995
    rd = 6
    theta_tau = math.acos(tau)
    t = theta_tau + 1.2e-4  # beyond tau-bound + slack, inside eff-bound
    q = [math.cos(t), 0.0, math.sin(t), 0.0]
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),  # centroid seed, cell A
        (1, [0.0, 1.0, 0.0, 0.0]),  # far centroid
        (2, q),                     # the query, its own cell
        (3, [1.0, 0.0, 0.0, 0.0]),  # cell-A member: the boundary pair
    ]
    emb = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")

    # preconditions, computed exactly as the operator does
    true_cos = math.cos(t)
    assert true_cos < tau, "pair must be strictly below tau"
    assert np.round(true_cos, rd) >= tau, "…but round INTO the answer set"
    # the un-corrected bound prunes cell A (rho_A = 0: members are the
    # centroid direction itself)…
    cent_ids, cmat = _collect_centroids(emb, 3)
    index = ivf_assign_frame(emb, n_cells=3, centroids=(cent_ids, cmat))
    qids, qnv = _collect_queries(emb, F.col("vec_id") == 2)
    rho = {0: 0.0, 1: 0.0, 2: 0.0}
    naive = radius_probe_rows(
        qids, qnv, cent_ids, cmat, rho, tau=tau, prune_slack=1e-4
    )
    assert all(cell != 0 for _, cell, _ in naive), (
        "fixture no longer triggers the bug: naive bound keeps cell 0"
    )

    # …the shipped operator (rounding-aware tau_eff) keeps it lossless
    got = ivf_radius_distributed(
        emb,
        tau=tau,
        query_filter=F.col("vec_id") == 2,
        n_cells=3,
        round_digits=rd,
        index=index,
    ).collect()
    pairs = {(r["vec_a"], r["vec_b"]) for r in got}
    assert (2, 0) in pairs and (2, 3) in pairs, f"boundary pair lost: {pairs}"
