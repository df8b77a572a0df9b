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
- The Gumbel noise derives from the permanent per-row hash position,
  looked up in the SINGLE-SOURCED ``gumbel_table()`` grid (computed
  once in Python, joined by every engine), so the "random" sample is
  reproducible across runs, engines, and repartitioning — same
  rationale as ``operators/sampling.py``, with the transcendental
  evaluated exactly once anywhere.

The reference has no data-selection stage (its corpus is 3 curated
PDFs, `/root/reference/src/document_loader.py`); this module exists for
the raw-web-corpus regime the north-star targets.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text import md5_long, whitespace_tokens
from ._cache import swap_cache

# Fixed-point scale for log-probabilities (micro-units). Integer sums
# of micro-unit terms are exact in any order; see operators/lm.py.
MICRO = 1_000_000
# Milli-unit grid for the Gumbel term (scaled back to micro so
# ``sel_key_micro`` stays in one unit). Since r11 the Gumbel values are
# SINGLE-SOURCED: ``gumbel_table()`` evaluates the double-ln ONCE in
# Python and both the Spark path and any SQL oracle join the same
# stored integers (see the r10 driver hash-mismatch history — a
# transcendental computed independently per engine is a standing
# divergence risk, however wide the rounding margin).
GUMBEL_UNIT = 1_000
# Number of permanent hash positions the Gumbel grid is defined over.
# 4096 keeps the full (pos, g_micro) table small enough to inline in an
# oracle SQL VALUES list and to broadcast as KB-scale planning
# metadata, while leaving the sample's proportional-to-weight property
# intact (the noise resolution only has to break ranking ties among
# near-equal weights, not be continuous).
GUMBEL_POSITIONS = 4_096
# Salt for the selection tie-break hash: sel_key_micro ties (shared
# grid position + equal weight) break by a salted hash of the id, not
# by raw id order, so near-equal-weight ties carry no low-id bias.
GUMBEL_TIE_SALT = 17
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


def gumbel_table() -> list[tuple[int, int]]:
    """The complete ``(pos, g_micro)`` Gumbel grid, computed ONCE in
    Python: ``g = -ln(-ln(u))`` at ``u = (pos + 0.5) /
    GUMBEL_POSITIONS`` (never exactly 0 or 1), quantized as
    ``floor(g * GUMBEL_UNIT + 0.5) * (MICRO / GUMBEL_UNIT)`` so the
    stored value is already in micro-units. Every engine — Spark via a
    broadcast join, a SQL oracle via an inline VALUES list — consumes
    these EXACT integers, so no transcendental is ever evaluated twice
    and the Gumbel stage cannot diverge between engines by
    construction."""
    import math

    scale = MICRO // GUMBEL_UNIT
    out = []
    for pos in range(GUMBEL_POSITIONS):
        u = (pos + 0.5) / GUMBEL_POSITIONS
        g = -math.log(-math.log(u))
        out.append((pos, int(math.floor(g * GUMBEL_UNIT + 0.5)) * scale))
    return out


def gumbel_position(id_col: Column | str, seed: int = 13) -> Column:
    """Permanent pseudo-random grid position in
    ``[0, GUMBEL_POSITIONS)`` for a row id: the salted portable-md5
    family modulo the grid size (uniform — the 60-bit hash space is an
    exact multiple of no small modulus, but 2^60 mod 4096 == 0, so
    every position is hit by exactly 2^48 hash values)."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    return md5_long(c.cast("string"), F.lit(str(seed))) % GUMBEL_POSITIONS


def gumbel_terms(
    df: DataFrame, id_col: str = "doc_id", seed: int = 13
) -> DataFrame:
    """Attach ``(pos, g_micro)`` to every row: derive the row's
    permanent grid position and broadcast-join the Python-computed
    ``gumbel_table()`` — a KB-scale lookup, never a shuffle."""
    spark = df.sparkSession
    table = spark.createDataFrame(
        gumbel_table(), "pos bigint, g_micro bigint"
    )
    return df.withColumn("pos", gumbel_position(id_col, seed)).join(
        F.broadcast(table), "pos"
    )


def gumbel_keys(
    scored: DataFrame,
    id_col: str = "doc_id",
    weight_col: str = "logw_micro",
    seed: int = 13,
) -> DataFrame:
    """Every row with its selection key ``sel_key_micro = weight +
    Gumbel term`` (exact BIGINT addition of single-sourced integers),
    no ranking applied — the bisectable pre-top-k stage."""
    return gumbel_terms(scored, id_col=id_col, seed=seed).withColumn(
        "sel_key_micro", F.col(weight_col) + F.col("g_micro")
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
    variate is looked up from the single-sourced ``gumbel_table()``
    grid by the row's permanent hash position, so the per-row key is
    an exact BIGINT that every engine reproduces bit-for-bit without
    evaluating any transcendental itself. ``orderBy().limit(k)``
    compiles to TakeOrdered — no global sort shuffle.

    Tie handling (r11 ADVICE): the 4096-position grid gives documents
    at the same position an identical noise term, so ``sel_key_micro``
    ties occur among near-equal weights; breaking them by raw id would
    systematically prefer LOW ids — a statistical bias the
    proportional-to-weight sample must not carry. Ties therefore break
    by a SECOND salted hash of the id (engine-portable md5, a
    different salt than the position hash), with the raw id only as
    the final total-order guarantee."""
    keyed = gumbel_keys(scored, id_col=id_col, weight_col=weight_col, seed=seed)
    c = F.col(id_col)
    return (
        keyed.drop("pos", "g_micro")
        .orderBy(
            F.desc("sel_key_micro"),
            md5_long(c.cast("string"), F.lit(str(GUMBEL_TIE_SALT))),
            c,
        )
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


def model_table(
    target_model: DataFrame,
    target_default: DataFrame,
    raw_model: DataFrame,
    raw_default: DataFrame,
) -> DataFrame:
    """Both fitted models + their unseen-bucket defaults as ONE
    long-form frame ``(model, bucket, lpm)`` with
    ``model in ('t','r','t_def','r_def')`` and ``bucket = -1`` marking
    the default rows — the registered ``dsir_models`` bisection shape
    and the storable state of a fitted DSIR selector (at most
    2*num_buckets + 2 integer rows)."""
    return (
        target_model.select(F.lit("t").alias("model"), "bucket", "lpm")
        .unionByName(
            raw_model.select(F.lit("r").alias("model"), "bucket", "lpm")
        )
        .unionByName(
            target_default.select(
                F.lit("t_def").alias("model"),
                F.lit(-1).cast("bigint").alias("bucket"),
                F.col("lpm_def").alias("lpm"),
            )
        )
        .unionByName(
            raw_default.select(
                F.lit("r_def").alias("model"),
                F.lit(-1).cast("bigint").alias("bucket"),
                F.col("lpm_def").alias("lpm"),
            )
        )
    )


def write_dsir_model(
    target_model: DataFrame,
    target_default: DataFrame,
    raw_model: DataFrame,
    raw_default: DataFrame,
    path: str,
    num_buckets: int = 8192,
    seed: int = 7,
) -> None:
    """Persist a fitted importance model (KB-scale integer rows) — the
    DAY-1 half of incremental DSIR: the paper fits its models once per
    (target, raw-snapshot) pair, and every later crawl batch is scored
    against the STORED quantized log-probabilities without touching
    either fitting corpus again. Because the stored lpm values are
    exact BIGINTs, any engine that joins this table reproduces scores
    bit-for-bit — the same single-source argument as
    ``gumbel_table()``.

    The fit's FEATURIZATION parameters (num_buckets, seed) ride along
    as metadata rows (r11 ADVICE): a stored model scored with a
    different hash space silently misaligns every bucket join and
    fills defaults, so day-2 scoring derives the parameters from the
    store instead of trusting caller defaults."""
    meta = target_model.sparkSession.createDataFrame(
        [("cfg_num_buckets", -1, num_buckets), ("cfg_seed", -1, seed)],
        "model string, bucket bigint, lpm bigint",
    )
    model_table(target_model, target_default, raw_model, raw_default).unionByName(
        meta
    ).write.mode("overwrite").parquet(path)


def read_dsir_model(
    spark, path: str
) -> tuple[DataFrame, DataFrame, DataFrame, DataFrame]:
    """Split a stored model back into the ``dsir_logweights`` operand
    frames ``(target_model, target_default, raw_model, raw_default)``
    (metadata rows excluded; read them with ``read_dsir_model_params``)."""
    t = spark.read.parquet(path)
    return (
        t.filter(F.col("model") == "t").select("bucket", "lpm"),
        t.filter(F.col("model") == "t_def").select(
            F.col("lpm").alias("lpm_def")
        ),
        t.filter(F.col("model") == "r").select("bucket", "lpm"),
        t.filter(F.col("model") == "r_def").select(
            F.col("lpm").alias("lpm_def")
        ),
    )


def read_dsir_model_params(spark, path: str) -> tuple[int, int]:
    """The stored fit's ``(num_buckets, seed)`` metadata. Models
    written before the metadata rows existed raise — re-write them
    with the current ``write_dsir_model`` rather than guessing a hash
    space that would silently misalign every bucket."""
    rows = {
        r["model"]: int(r["lpm"])
        for r in spark.read.parquet(path)
        .filter(F.col("model").isin("cfg_num_buckets", "cfg_seed"))
        .collect()
    }
    if "cfg_num_buckets" not in rows or "cfg_seed" not in rows:
        raise ValueError(
            f"dsir model at {path} records no featurization metadata "
            "(cfg_num_buckets/cfg_seed rows); re-write it with "
            "write_dsir_model before incremental scoring"
        )
    return rows["cfg_num_buckets"], rows["cfg_seed"]


def dsir_score_incremental(
    new_docs: DataFrame,
    spark,
    model_path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_buckets: int | None = None,
    seed: int | None = None,
) -> DataFrame:
    """DAY-2 DSIR: score a NEW batch of raw documents against the
    STORED model — one delta featurization pass + the broadcast model
    joins + the per-document integer sum; O(delta), the fitting
    corpora are never re-read. Scores are bit-identical to what the
    day-1 fit would assign (exact integer lpm through the parquet
    round-trip; pinned by tests/test_dsir.py), so selection thresholds
    learned on day 1 transfer unchanged.

    ``num_buckets``/``seed`` default to the STORE's recorded fit
    parameters; passing a value that contradicts the store raises
    instead of silently scoring in a misaligned hash space (r11
    ADVICE)."""
    stored_b, stored_s = read_dsir_model_params(spark, model_path)
    if num_buckets is not None and num_buckets != stored_b:
        raise ValueError(
            f"num_buckets={num_buckets} contradicts the stored fit's "
            f"{stored_b} at {model_path}"
        )
    if seed is not None and seed != stored_s:
        raise ValueError(
            f"seed={seed} contradicts the stored fit's {stored_s} at "
            f"{model_path}"
        )
    feat = hashed_ngram_features(
        new_docs, text_col=text_col, id_col=id_col,
        num_buckets=stored_b, seed=stored_s,
    )
    tm, td, rm, rd = read_dsir_model(spark, model_path)
    return dsir_logweights(feat, tm, td, rm, rd, id_col=id_col)
