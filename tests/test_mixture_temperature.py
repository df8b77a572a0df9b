"""Temperature (alpha) sampling pins (operators/mixing.py
mixture_temperature — r12): limiting behavior at alpha=1 (natural
proportions) and alpha=0 (uniform), tail upweighting in between, the
supply clamp, and the rounding-boundary margin sweep that makes the
cross-engine pow()/sum float discipline safe on the shipped
fixtures."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from rag_project_with_embeddings_and_vector_database_spark.operators import (
    mixing as MX,
)

SFS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]
TOTAL = 200


def _counts(df):
    return {
        r.lang: r.n
        for r in df.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()
    }


def _expected_targets(supply, alpha, total):
    n = float(sum(supply.values()))
    pw = {d: (c / n) ** alpha for d, c in sorted(supply.items())}
    z = 0.0
    for d in sorted(pw):
        z += pw[d]
    return {
        d: min(int(math.floor(pw[d] / z * total + 0.5)), supply[d])
        for d in sorted(pw)
    }


def test_alpha_one_is_natural_and_alpha_zero_is_uniform(spark):
    docs = spark.read.parquet(f"{SFS[0]}/documents.parquet").select(
        "lang", "doc_id"
    )
    supply = _counts(docs)
    nat = _counts(MX.mixture_temperature(docs, "lang", 1.0, TOTAL))
    for d, c in nat.items():
        assert c == _expected_targets(supply, 1.0, TOTAL)[d]
    uni = _counts(MX.mixture_temperature(docs, "lang", 0.0, TOTAL))
    k = len(supply)
    for d, c in uni.items():
        assert abs(c - TOTAL / k) <= 1 or c == supply[d]  # clamped tails


def test_alpha_half_upweights_tail_domains(spark):
    """Relative to natural proportions, alpha<1 must give tail
    domains a larger share and the head a smaller one."""
    docs = spark.read.parquet(f"{SFS[1]}/documents.parquet").select(
        "lang", "doc_id"
    )
    supply = _counts(docs)
    head = max(supply, key=supply.get)
    tail = min(supply, key=supply.get)
    nat = _expected_targets(supply, 1.0, TOTAL)
    half = _counts(MX.mixture_temperature(docs, "lang", 0.5, TOTAL))
    assert half[tail] >= nat[tail]
    assert half[head] <= nat[head]


@pytest.mark.parametrize("sf", SFS)
def test_rounding_boundary_margin_sweep(spark, sf):
    """The oracle's pow()/z replay may differ from Python by ulps; a
    target only flips if w*total lands ON the .5 boundary. Assert
    every fixture target value sits > 1e-6 away from the boundary
    under a ±16-ulp perturbation of the weight — the dsir-style
    margin sweep that converts a float hazard into a checked
    invariant."""
    docs = spark.read.parquet(f"{sf}/documents.parquet").select("lang", "doc_id")
    supply = _counts(docs)
    n = float(sum(supply.values()))
    pw = {d: (c / n) ** 0.5 for d, c in sorted(supply.items())}
    z = 0.0
    for d in sorted(pw):
        z += pw[d]
    for d in sorted(pw):
        x = pw[d] / z * TOTAL
        for bump in (-16, 16):
            xx = x * (1.0 + bump * math.ulp(1.0))
            assert math.floor(xx + 0.5) == math.floor(x + 0.5), (d, x)
        frac = abs((x + 0.5) - round(x + 0.5))
        assert frac > 1e-6, (d, x)


def test_supply_clamp(spark):
    """A domain whose alpha-share exceeds its supply yields exactly
    its supply — no silent redistribution."""
    rows = [(i, "tiny") for i in range(3)] + [(100 + i, "big") for i in range(400)]
    docs = spark.createDataFrame(rows, "doc_id long, lang string")
    out = _counts(MX.mixture_temperature(docs, "lang", 0.0, 200))
    assert out["tiny"] == 3  # clamped: uniform target 100 > supply 3
    assert out["big"] == 100
