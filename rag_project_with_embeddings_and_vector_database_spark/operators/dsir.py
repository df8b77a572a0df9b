"""DSIR-style importance resampling for training-data selection
(north-star extension; after Xie et al., "Data Selection for Language
Models via Importance Resampling", NeurIPS 2023).

Given a small curated TARGET corpus and a large RAW corpus, select the
raw documents whose hashed-n-gram distribution looks most like the
target: fit a smoothed bag-of-hashed-n-grams unigram model on each
corpus, score every raw document by its importance log-weight
``log p_target(doc) - log p_raw(doc)``, and sample k documents without
replacement with probability proportional to the weight via the Gumbel
top-k trick. This is the paper's exact recipe, which it runs over the
full Pile (~1.6 B documents) — the 100 TB data-selection shape.

Scale notes:
- Featurization is one linear explode pass (unigrams + bigrams hashed
  into ``num_buckets`` buckets with the portable salted-md5 family), so
  DuckDB oracles replay every hash exactly.
- Each model fit is a map-side-combinable groupBy on the bucket key
  whose output is at most ``num_buckets`` rows; the tiny count frame is
  persisted through the scoped operator cache because both the
  per-bucket log-probs and the normalizing total read it.
- Log-probabilities are fixed-point micro-units (floor(ln(p)*1e6 + 0.5)
  as BIGINT — the ``operators/lm.py`` micro-unit convention, but with
  exact-IEEE floor+add instead of engine-defined round(), plus a
  runtime tie-guard; see ``_quantize``): integer per-document sums are
  exact in any accumulation order, where double sums flip the last
  decimal between engines and between Spark task schedules.
- Scoring joins the (<= num_buckets)-row models and 1-row default
  frames as broadcasts — no shuffle beyond the per-document sum, which
  partitions on the document id.
- Selection is ``orderBy(key desc).limit(k)`` = TakeOrdered (per-
  partition heaps + driver merge of k), never a global sort shuffle.
- The Gumbel noise derives from the permanent per-row hash position
  (``sampling.hash_bucket``), so the "random" sample is reproducible
  across runs, engines, and repartitioning — same rationale as
  ``operators/sampling.py``.

The reference has no data-selection stage (its corpus is 3 curated
PDFs, `/root/reference/src/document_loader.py`); this module exists for
the raw-web-corpus regime the north-star targets.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text import md5_long, whitespace_tokens
from ._cache import swap_cache
from .sampling import _BUCKETS as _GUMBEL_BUCKETS
from .sampling import hash_bucket

# Fixed-point scale for log-probabilities (micro-units). Integer sums
# of micro-unit terms are exact in any order; see operators/lm.py.
MICRO = 1_000_000
# The Gumbel term quantizes at a deliberately COARSER grid (milli-units,
# then scaled back to micro so ``sel_key_micro`` stays in one unit): the
# u-grid is the fixed set {(i+0.5)/1e6}, and at unit 1e3 its smallest
# distance-to-rounding-boundary is 4.265e-07 (pinned by
# tests/test_dsir_margins.py over all 1e6 grid points) — five orders of
# magnitude above any cross-engine libm-ln divergence, so no engine pair
# can round a Gumbel variate differently at ANY corpus size. At unit 1e6
# the grid's worst margin is only 1.27e-07 with a 1000x larger error
# term.
GUMBEL_UNIT = 1_000
# Runtime tie-guard: quantization aborts loudly if any value lands
# within this distance of a rounding boundary (in grid units). The
# cross-engine error budget — a few ulps of libm ln on |x| <= ~20,
# scaled to the grid — is under 1e-8, so a trip means genuinely
# tie-fragile data (coarsen the unit), never ambient libm noise.
TIE_GUARD = 1e-7


def hashed_ngram_features(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_buckets: int = 8192,
    seed: int = 7,
) -> DataFrame:
    """One row per n-gram occurrence: ``(id_col, bucket)`` with the
    gram hashed into ``[0, num_buckets)``. Grams are lowercased
    whitespace unigrams plus adjacent bigrams (the paper's default
    feature space), hashed with the salted portable-md5 family so any
    engine recomputes the same bucket. Linear in tokens, no shuffle."""
    toks = F.transform(whitespace_tokens(F.col(text_col)), F.lower)
    d = df.select(id_col, toks.alias("_tk"))
    # slice lengths are clamped at 0 so empty/one-token docs yield no
    # bigrams instead of a negative-length slice error
    bigrams = F.expr(
        "zip_with(slice(_tk, 1, greatest(size(_tk) - 1, 0)),"
        "         slice(_tk, 2, greatest(size(_tk) - 1, 0)),"
        "         (a, b) -> concat(a, ' ', b))"
    )
    grams = d.select(
        id_col, F.explode(F.concat(F.col("_tk"), bigrams)).alias("gram")
    )
    return grams.select(
        id_col,
        (md5_long(F.col("gram"), F.lit(str(seed))) % num_buckets).alias("bucket"),
    )


def _quantize(x: Column, unit: int, label: str) -> Column:
    """``floor(x*unit + 0.5)`` as BIGINT — fixed-point quantization with
    a runtime tie-guard. ``floor`` plus an exact IEEE add replaces
    ``round(x, 0)`` because multiply/add/floor are correctly rounded
    and bit-identical in every engine, while round() semantics are
    engine- and version-defined (Spark routes doubles through
    BigDecimal.valueOf's shortest-decimal form; DuckDB through its own
    C++ path, which has changed across releases). The guard RAISES —
    a plain column expression, no extra job — when a value sits within
    ``TIE_GUARD`` of a boundary, where an ulp of libm ln could flip the
    integer between engines; tests/test_dsir_margins.py sweeps the
    bounded grids (all 1e6 Gumbel u-values; the observed lpm counts at
    sf0.001/sf0.01) to prove shipped data never trips it."""
    y = x * F.lit(float(unit)) + F.lit(0.5)
    frac = y - F.floor(y)
    margin = F.least(frac, F.lit(1.0) - frac)
    guarded = F.when(
        margin < F.lit(float(TIE_GUARD)),
        F.raise_error(
            F.format_string(
                f"dsir quantization tie ({label}, unit={unit}): value "
                "%.17g is within the tie guard of a rounding boundary "
                "- coarsen the unit",
                y,
            )
        ).cast("double"),
    ).otherwise(F.floor(y))
    return guarded.cast("bigint")


def _lpm(num: Column, den: Column) -> Column:
    """ln(num/den) in integer micro-units (tie-guarded)."""
    return _quantize(F.log(num / den), MICRO, "lpm")


def fit_hashed_lm(
    feat: DataFrame,
    num_buckets: int = 8192,
    alpha: float = 0.5,
    cache_key: str = "dsir_lm",
) -> tuple[DataFrame, DataFrame]:
    """Smoothed unigram model over hashed-n-gram buckets.

    Returns ``(model, default)``: ``model`` is ``(bucket, lpm)`` for
    every OBSERVED bucket, ``default`` a 1-row ``(lpm_def)`` frame for
    unseen buckets. Unlike the open-vocabulary LM in ``operators/
    lm.py``, hashing fixes the vocabulary at exactly ``num_buckets``
    slots, so the add-alpha mass spreads over ``num_buckets`` — the
    denominator is ``N + alpha * num_buckets`` with no +1 OOV slot.
    The count frame (<= num_buckets rows) is persisted via the scoped
    cache because both outputs read it."""
    cnts = swap_cache(
        cache_key,
        feat.groupBy("bucket").agg(F.count(F.lit(1)).alias("cnt")),
    )
    # coalesce the empty-corpus total to 0 so an empty fit degrades to
    # the exact uniform model (lpm_def = ln(1/num_buckets)) instead of
    # a NULL default that would poison every downstream weight
    tot = cnts.agg(
        F.coalesce(F.sum("cnt"), F.lit(0)).cast("double").alias("_n")
    )
    den = F.col("_n") + F.lit(alpha * num_buckets)
    model = cnts.crossJoin(F.broadcast(tot)).select(
        "bucket", _lpm(F.col("cnt") + F.lit(alpha), den).alias("lpm")
    )
    default = tot.select(_lpm(F.lit(alpha), den).alias("lpm_def"))
    return model, default


def dsir_logweights(
    feat: DataFrame,
    target_model: DataFrame,
    target_default: DataFrame,
    raw_model: DataFrame,
    raw_default: DataFrame,
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document importance log-weight in micro-units:
    ``sum over gram occurrences of (lpm_target - lpm_raw)``, with the
    1-row default frames filling unseen buckets. Both models and both
    defaults broadcast; the only shuffle is the per-document sum."""
    t = target_model.withColumnRenamed("lpm", "_lpm_t")
    r = raw_model.withColumnRenamed("lpm", "_lpm_r")
    td = target_default.withColumnRenamed("lpm_def", "_def_t")
    rd = raw_default.withColumnRenamed("lpm_def", "_def_r")
    j = (
        feat.join(F.broadcast(t), "bucket", "left")
        .join(F.broadcast(r), "bucket", "left")
        .crossJoin(F.broadcast(td))
        .crossJoin(F.broadcast(rd))
    )
    term = F.coalesce("_lpm_t", "_def_t") - F.coalesce("_lpm_r", "_def_r")
    return j.groupBy(id_col).agg(
        F.sum(term).alias("logw_micro"),
        F.count(F.lit(1)).alias("n_grams"),
    )


def gumbel_topk(
    scored: DataFrame,
    k: int,
    id_col: str = "doc_id",
    weight_col: str = "logw_micro",
    seed: int = 13,
) -> DataFrame:
    """Sample ``k`` rows without replacement with probability
    proportional to ``exp(weight)`` via the Gumbel top-k trick:
    ``key = log w + Gumbel(0,1)``, take the k largest. The Gumbel
    variate comes from the row's permanent hash position
    ``u = (hash_bucket + 0.5) / 1e6`` (never exactly 0 or 1),
    quantized on the coarse tie-guarded ``GUMBEL_UNIT`` grid (see the
    module constants) and scaled back to micro-units, so the per-row
    key is an exact BIGINT that every engine reproduces bit-for-bit.
    ``orderBy().limit(k)`` compiles to TakeOrdered — no global sort
    shuffle."""
    u = (hash_bucket(id_col, seed) + F.lit(0.5)) / F.lit(float(_GUMBEL_BUCKETS))
    g = _quantize(-F.log(-F.log(u)), GUMBEL_UNIT, "gumbel") * F.lit(
        MICRO // GUMBEL_UNIT
    )
    return (
        scored.withColumn("sel_key_micro", F.col(weight_col) + g)
        .orderBy(F.desc("sel_key_micro"), F.col(id_col))
        .limit(k)
    )


def dsir_select(
    raw_df: DataFrame,
    target_df: DataFrame,
    k: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_buckets: int = 8192,
    alpha: float = 0.5,
    seed: int = 7,
    gumbel_seed: int = 13,
) -> DataFrame:
    """End-to-end DSIR: featurize both corpora, fit target and raw
    hashed-n-gram models, score every raw document, Gumbel-top-k
    sample. Returns ``(id_col, logw_micro, n_grams, sel_key_micro)``
    for the k selected documents. Documents with no tokens have no
    feature rows and are never candidates (zero mass under both
    models)."""
    feat_t = hashed_ngram_features(
        target_df, text_col=text_col, id_col=id_col,
        num_buckets=num_buckets, seed=seed,
    )
    feat_r = hashed_ngram_features(
        raw_df, text_col=text_col, id_col=id_col,
        num_buckets=num_buckets, seed=seed,
    )
    tm, td = fit_hashed_lm(
        feat_t, num_buckets=num_buckets, alpha=alpha, cache_key="dsir_lm_target"
    )
    rm, rd = fit_hashed_lm(
        feat_r, num_buckets=num_buckets, alpha=alpha, cache_key="dsir_lm_raw"
    )
    scored = dsir_logweights(feat_r, tm, td, rm, rd, id_col=id_col)
    return gumbel_topk(scored, k, id_col=id_col, seed=gumbel_seed)
