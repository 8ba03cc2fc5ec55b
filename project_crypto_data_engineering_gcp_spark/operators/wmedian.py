"""Grouped weighted median by MULTI-LEVEL bucket refinement.

The exact distributed-quantile idiom, generalized from the r10
single-level shape (plans/queries_relational.py::o8_weighted_median_prices
— whose SCALE.md sweep measured and rejected three data-sized window /
prefix-sum alternatives): the fact table is only ever touched through
MAP-COMBINABLE aggregates; cumulation happens on domain-bounded band
frames; the final exact pass sees one NARROW band of the value domain
per group.

The r10 residual lever — a pathological group concentrating most of its
weight in ONE band degrades the exact pass to a group-sized window — is
closed here by RECURSION: ``band_widths`` is a decreasing sequence; each
level re-bands only the rows inside the previous level's median band, so
after level i the exact pass is bounded by the weight mass inside one
``band_widths[-1]``-wide slice of the domain, however concentrated the
distribution. Each extra level costs one more scan of the fact (the
classic refinement price) and one more tiny band-frame cumulation.

Semantics: lower weighted median — the smallest value whose cumulative
weight w(v' <= v) satisfies 2*cum >= total, per group. All comparisons
are on the caller's integer value column and exact-summable weights, so
the selected row is bit-determined (ties cannot be engine-arbitrary).

Level-count decision rule (measured, SCALE.md r11 contrast): each extra
level costs one more scan of the fact, and pays off only when the
previous band still holds more DISTINCT value points than the per-group
exact pass should sort — 3.0x faster at x100 on a band holding ~100k
distinct values, pure overhead on a band holding ~50. With a value
domain of known width, prefer the single level whose band width already
bounds the exact pass; reach for 2+ levels when the domain is wide AND
the weight distribution may concentrate. Correctness is
band-width-invariant either way.

Contract:
  - ``value_col`` is integral (bigint); banding uses ``DIV``, which is
    monotone in the value (truncation toward zero), so every band is a
    contiguous value range and negative values order correctly.
  - ``weight_col`` is non-negative and exactly summable (bigint /
    decimal); zero-weight value points are dropped from the final frame
    (they cannot move the cumulative, and keeping them would make the
    boundary row engine-arbitrary under the 2*cum >= tot test).
  - groups with zero total weight produce no output row.
  - rows with NULL ``value_col`` or NULL ``weight_col`` are IGNORED
    (filtered before level 0) — SQL aggregate semantics, where SUM and
    PERCENTILE skip NULLs. Without the filter, NULL bands would sort
    first under Spark's NULLS FIRST and shift every cumulative while
    being unselectable by the exact pass (r11 ADVICE).
  - group keys may be NULL: the per-level state joins use eqNullSafe,
    so a NULL group gets its own output row — consistent with
    operators/rank.py::grouped_global_rank.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_B = "__wm_b"
_WB = "__wm_wb"
_BEFORE = "__wm_before"
_TOT = "__wm_tot"
_RESERVED = (_B, _WB, _BEFORE, _TOT)


def _band(value_col: str, width: int) -> Column:
    return F.expr(f"{value_col} DIV {int(width)}")


def grouped_weighted_median(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    weight_col: str,
    band_widths: tuple[int, ...] = (100_000, 1_000),
    median_col: str = "median_value",
    total_col: str = "total_weight",
    quantile_ppm: int = 500_000,
) -> DataFrame:
    """Return one row per group: (group_cols..., ``median_col`` = lower
    weighted median of ``value_col`` under ``weight_col``, ``total_col``
    = the group's total weight).

    ``band_widths`` must be strictly decreasing positive ints; level 0
    bands the whole domain, each further level re-bands only the median
    band of the previous level (broadcast semi-join on (group, band) —
    per group, one band of the domain), and the exact pass resolves
    inside the last level's band. Every per-level band frame is bounded
    by |groups| x (domain width / band width) at level 0 and by
    |groups| x (band_widths[i-1] / band_widths[i]) afterwards — config
    constants, never data-sized.

    ``quantile_ppm`` generalizes to any lower weighted QUANTILE: the
    smallest value whose cumulative weight satisfies
    1e6 * cum >= quantile_ppm * total (500_000 = the median; 250_000 =
    lower quartile; 990_000 = p99). Integer ppm keeps the boundary test
    exact — the refinement, its cost model, and bit-determinism are
    quantile-invariant (each level locates the band the same way).

    ``band_widths=()`` (r13, the "value-grain last level" degenerate
    case) skips banding entirely: ONE map-combinable (group, value)
    aggregate over the fact, cumulated per group — 1 fact scan instead
    of len(band_widths)+1. Correct at any data size but only
    scale-SAFE when the caller can bound the value DOMAIN (the
    per-group exact frame is |distinct values|, no longer
    band-width-bounded): reach for it when |domain| is a small constant
    (o9's qty_centi in [100, 5000]); keep >= 1 level when distinct
    values grow with the data (o8/o10's price domain)."""
    for r in _RESERVED:
        if r in df.columns:
            raise ValueError(
                f"grouped_weighted_median: reserved column {r!r} present"
            )
    if any(w <= 0 for w in band_widths):
        raise ValueError("band_widths must be positive")
    if any(
        band_widths[i] <= band_widths[i + 1]
        for i in range(len(band_widths) - 1)
    ):
        raise ValueError("band_widths must be strictly decreasing")
    q_ppm = int(quantile_ppm)
    if not 0 < q_ppm <= 1_000_000:
        raise ValueError("quantile_ppm must be in (0, 1000000]")

    # NULL value/weight rows are ignored (SQL aggregate semantics; see
    # module contract) — otherwise the NULL band sorts first and its
    # weight shifts every real band's cumulative without ever being
    # selectable by the exact-pass equality join.
    df = df.filter(F.col(value_col).isNotNull() & F.col(weight_col).isNotNull())

    def _hit(cum: Column, tot: Column) -> Column:
        # 1e6*cum >= q_ppm*tot, both sides widened so decimal
        # multiplication cannot overflow-or-truncate at any real scale
        return (
            cum.cast("decimal(38,0)") * F.lit(1_000_000)
            >= tot.cast("decimal(38,0)") * F.lit(q_ppm)
        )

    wcum = (
        Window.partitionBy(*group_cols)
        .orderBy(_B)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wgrp = Window.partitionBy(*group_cols)

    state: DataFrame | None = None  # (group..., _B, _BEFORE, _TOT)
    for level, width in enumerate(band_widths):
        if state is None:
            banded = df.groupBy(
                *group_cols, _band(value_col, width).alias(_B)
            ).agg(F.sum(weight_col).alias(_WB))
            before0 = F.lit(0)
            tot0 = F.sum(_WB).over(wgrp)
        else:
            prev_w = band_widths[level - 1]
            st = state.select(
                *[F.col(g).alias(f"__wm_g_{g}") for g in group_cols],
                F.col(_B).alias("__wm_pb"),
                F.col(_BEFORE).alias("__wm_pbefore"),
                F.col(_TOT).alias("__wm_ptot"),
            )
            cond = _band(value_col, prev_w) == F.col("__wm_pb")
            for g in group_cols:
                # eqNullSafe: NULL group keys must match their own state
                # row, not silently vanish (r11 ADVICE; mirrors rank.py)
                cond = cond & F.col(g).eqNullSafe(F.col(f"__wm_g_{g}"))
            banded = (
                df.join(F.broadcast(st), cond)
                .groupBy(
                    *group_cols,
                    "__wm_pbefore",
                    "__wm_ptot",
                    _band(value_col, width).alias(_B),
                )
                .agg(F.sum(weight_col).alias(_WB))
            )
            before0 = F.col("__wm_pbefore")
            tot0 = F.col("__wm_ptot")
        cum = before0 + F.sum(_WB).over(wcum)
        scanned = banded.select(
            *group_cols,
            F.col(_B),
            (cum - F.col(_WB)).alias(_BEFORE),
            tot0.alias(_TOT),
            _hit(cum, tot0).alias("__wm_hit"),
        ).filter(F.col("__wm_hit") & (F.col(_TOT) > 0))
        state = scanned.groupBy(*group_cols).agg(
            F.min_by(F.struct(_B, _BEFORE), _B).alias("__wm_m"),
            F.max(_TOT).alias(_TOT),
        ).select(
            *group_cols,
            F.col(f"__wm_m.{_B}").alias(_B),
            F.col(f"__wm_m.{_BEFORE}").alias(_BEFORE),
            _TOT,
        )

    if state is None:
        # band_widths=() — value-grain single scan: ONE map-combinable
        # (group, value) aggregate over the whole domain; before = 0 and
        # tot rides a window over the value frame (the o8 pass-1
        # pattern). Scale-safe only for domain-bounded values — see the
        # docstring decision rule.
        cand = (
            df.groupBy(*group_cols, value_col)
            .agg(F.sum(weight_col).alias(_WB))
            .filter(F.col(_WB) > 0)
            .withColumn("__wm_pbefore", F.lit(0))
            .withColumn("__wm_ptot", F.sum(_WB).over(wgrp))
        )
    else:
        # exact resolution inside the last level's band only
        last_w = band_widths[-1]
        st = state.select(
            *[F.col(g).alias(f"__wm_g_{g}") for g in group_cols],
            F.col(_B).alias("__wm_pb"),
            F.col(_BEFORE).alias("__wm_pbefore"),
            F.col(_TOT).alias("__wm_ptot"),
        )
        cond = _band(value_col, last_w) == F.col("__wm_pb")
        for g in group_cols:
            # eqNullSafe: see the level-loop comment (r11 ADVICE)
            cond = cond & F.col(g).eqNullSafe(F.col(f"__wm_g_{g}"))
        cand = (
            df.join(F.broadcast(st), cond)
            .groupBy(*group_cols, value_col, "__wm_pbefore", "__wm_ptot")
            .agg(F.sum(weight_col).alias(_WB))
            .filter(F.col(_WB) > 0)
        )
    win = (
        Window.partitionBy(*group_cols)
        .orderBy(value_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        cand.withColumn(
            "__wm_cw", F.col("__wm_pbefore") + F.sum(_WB).over(win)
        )
        .filter(_hit(F.col("__wm_cw"), F.col("__wm_ptot")))
        .groupBy(*group_cols)
        .agg(
            F.min(value_col).alias(median_col),
            F.max("__wm_ptot").alias(total_col),
        )
    )
