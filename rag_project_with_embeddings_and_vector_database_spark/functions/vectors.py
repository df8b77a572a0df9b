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


def cosine_with_norms(
    a: Column | str, b: Column | str, na: Column | str, nb: Column | str
) -> Column:
    """``cosine(a, b)`` with the two L2 norms PRECOMPUTED by the caller
    (r14): inside an n^2 pair join the full formula re-evaluates both
    norm aggregate loops for every joined pair — attaching ``norm(v)``
    once per join-side row instead cuts the per-pair work to one dot
    plus one division. Bit-identical by construction: the caller
    computes the norms with ``norm`` on the same arrays, and this is
    the exact same when/otherwise expression over them."""
    na, nb = _c(na), _c(nb)
    return F.when((na > 0) & (nb > 0), dot(a, b) / (na * nb)).otherwise(F.lit(0.0))


def quantize_int8(a: Column | str) -> Column:
    """Symmetric int8 quantization: q_i = floor(v_i * 127 / max|v| + 0.5)
    (floor-based half-up — portable; engines disagree on round()'s
    half-tie rule, floor never does). A zero vector quantizes to zeros.
    At 100 TB this is the 4x storage/bandwidth reduction for the vector
    table; search rescores the top candidates at full precision."""
    v = _c(a)
    amax = F.aggregate(
        v, F.lit(0.0).cast("double"), lambda acc, x: F.greatest(acc, F.abs(x.cast("double")))
    )
    return F.when(
        amax > 0,
        F.transform(v, lambda x: F.floor(x.cast("double") * 127.0 / amax + 0.5).cast("int")),
    ).otherwise(F.transform(v, lambda x: F.lit(0)))


def dequantize_int8(q: Column | str, scale: Column) -> Column:
    """Inverse of ``quantize_int8`` given scale = max|v|: v_i ~ q_i *
    scale / 127."""
    return F.transform(_c(q), lambda x: x.cast("double") * scale / F.lit(127.0))
