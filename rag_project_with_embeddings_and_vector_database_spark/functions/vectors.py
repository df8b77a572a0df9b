"""Vector math as native Catalyst expressions over ``array<float|double>``.

No UDFs: ``zip_with`` + ``aggregate`` compile to codegen'd loops, so cosine
top-k over millions of vectors stays JVM-side (SURVEY.md §2.4 E5/E6).
All accumulation is in float64, left-to-right, which is bit-reproducible
across engines (verified against DuckDB's list_dot_product).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def dot(a: Column | str, b: Column | str) -> Column:
    """Float64 dot product of two array columns (any float width)."""
    prods = F.zip_with(_c(a), _c(b), lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0).cast("double"), lambda acc, x: acc + x)


def norm(a: Column | str) -> Column:
    """L2 norm."""
    sq = F.aggregate(
        _c(a), F.lit(0.0).cast("double"), lambda acc, x: acc + x.cast("double") * x.cast("double")
    )
    return F.sqrt(sq)


def l2_normalize(a: Column | str) -> Column:
    """Unit-normalize; zero vectors pass through unchanged.

    Reference: normalize_embeddings=True at encode time
    (/root/reference/src/embeddings.py:56).
    """
    n = norm(a)
    return F.when(n > 0, F.transform(_c(a), lambda x: x.cast("double") / n)).otherwise(
        F.transform(_c(a), lambda x: x.cast("double"))
    )


def cosine(a: Column | str, b: Column | str) -> Column:
    """Cosine similarity (full formula; use ``dot`` when inputs are
    pre-normalized — the reference's strength reduction,
    /root/reference/src/embeddings.py:149-155)."""
    na, nb = norm(a), norm(b)
    return F.when((na > 0) & (nb > 0), dot(a, b) / (na * nb)).otherwise(F.lit(0.0))
