"""Data mixing for training-set construction (north-star extension).

Builds on operators/sampling.py's permanent-hash discipline: mixture
targets are enforced with the same salted portable md5 bucket, so the
sampled membership is reproducible across engines, reruns, and
repartitionings, and DuckDB oracles replay it bit-for-bit.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .sampling import _BUCKETS, hash_bucket


def _round_half_up(x: float) -> int:
    """The module's ONE rounding rule for target arithmetic:
    half-away-from-zero (for the non-negative weights*total and
    threshold values used here, floor(x + 0.5)). Python's builtin
    ``round`` is banker's (half-to-even) while DuckDB's ``round`` is
    half-away-from-zero, so an oracle replaying ``round(wt * total)``
    diverges exactly when wt*total lands on .5 (0.1625 * 200 = 32.5 ->
    32 vs 33). Pinning the rule to floor(x + 0.5) keeps Python and the
    SQL oracles (which spell it the same way) bit-identical for every
    weight."""
    return int(math.floor(x + 0.5))


def mixture_sample(
    df: DataFrame,
    domain_col: str,
    weights: dict[str, float],
    total: int,
    id_col: str = "doc_id",
    seed: int = 42,
    method: str = "exact",
    salt_partitions: int = 32,
) -> DataFrame:
    """DATA MIXING: sample a corpus down to a target domain mixture —
    the step that turns "we crawled what we crawled" into "the
    training set is 50% en / 15% de / ..." (the mixture knob every
    LLM data pipeline exposes; cf. the hand-tuned mixtures in the
    GPT-3/Pile/LLaMA reports). Each domain d gets a target of
    round(weights[d] * total) rows, clamped to its supply —
    undersupplied domains yield what they have (deliberately no
    silent redistribution: at 100 TB you want the shortfall visible,
    not papered over; compose a second pass if backfill is wanted).
    Domains absent from ``weights`` are dropped. Target arithmetic is
    pinned half-away-from-zero (``_round_half_up``) so SQL oracles
    replay it bit-for-bit.

    ``method='exact'``: per-domain smallest-hash-bucket selection with
    an id tie-break (stratified_sample's machinery with per-domain n)
    — exactly the clamped target count per domain. Skew-proofed with a
    TWO-LEVEL salted rank: a naive single window on the domain key
    sends the entire hot domain (commonly 60%+ of a crawl) through one
    reducer; instead rows first rank inside ``salt_partitions``
    deterministic salt shards of each domain (pmod(hash(id), S), the
    salted-join pattern of operators/joins.py), keep the per-shard
    top-t, then re-rank the <= S*t survivors per domain. The global
    per-domain top-t is always a subset of the union of per-shard
    top-t sets, so the result is IDENTICAL to the single-rank form
    (pinned by a 90%-skew pytest) while the hot-domain reducer touches
    t*S rows instead of the whole domain. ``salt_partitions=1``
    collapses to the plain single-exchange rank for tiny inputs.
    ``method='threshold'``: scan-local Bernoulli via the same
    permanent hash (keep iff bucket < target/supply of the bucket
    space) — ZERO shuffle, binomially-approximate counts; the form a
    100 TB job prefers when a few-per-mille count wobble is
    acceptable. Both are reproducible across engines, reruns, and
    repartitionings (portable salted md5 — never ``rand()``); the
    per-domain supply counts are one tiny aggregate collected as
    planning metadata (like IVF centroids / bm25 query buckets)."""
    from pyspark.sql import Window

    if method not in ("exact", "threshold"):
        raise ValueError(f"method must be 'exact' or 'threshold', got {method!r}")
    supply = {
        r[0]: r[1]
        for r in df.groupBy(domain_col).agg(F.count(F.lit(1)).alias("n")).collect()
    }
    targets = {
        d: min(_round_half_up(w * total), supply.get(d, 0))
        for d, w in weights.items()
    }
    in_scope = df.filter(F.col(domain_col).isin(list(weights)))
    if method == "threshold":
        thr = F.create_map(
            *[
                x
                for d, t in sorted(targets.items())
                for x in (
                    F.lit(d),
                    F.lit(
                        _round_half_up(t / supply[d] * _BUCKETS)
                        if supply.get(d)
                        else 0
                    ),
                )
            ]
        )
        return in_scope.filter(
            hash_bucket(id_col, seed) < thr[F.col(domain_col)]
        )
    n_of = F.create_map(
        *[x for d, t in sorted(targets.items()) for x in (F.lit(d), F.lit(t))]
    )
    order = [hash_bucket(id_col, seed).asc(), F.col(id_col).asc()]
    ranked = in_scope
    if salt_partitions > 1:
        # level 1: rank inside deterministic salt shards of each domain
        # (spreads a hot domain over salt_partitions reducers), keep
        # only each shard's top-t — <= S*t survivors per domain
        w1 = Window.partitionBy(domain_col, "_salt").orderBy(*order)
        ranked = (
            in_scope.withColumn(
                "_salt", F.pmod(F.hash(F.col(id_col)), F.lit(salt_partitions))
            )
            .withColumn("_rn", F.row_number().over(w1))
            .filter(F.col("_rn") <= n_of[F.col(domain_col)])
            .drop("_salt", "_rn")
        )
    w2 = Window.partitionBy(domain_col).orderBy(*order)
    return (
        ranked.withColumn("_rn", F.row_number().over(w2))
        .filter(F.col("_rn") <= n_of[F.col(domain_col)])
        .drop("_rn")
    )


def mixture_sample_tokens(
    df: DataFrame,
    domain_col: str,
    weights: dict[str, float],
    total_tokens: int,
    token_col: str,
    id_col: str = "doc_id",
    seed: int = 42,
    plan_buckets: int = 4096,
) -> DataFrame:
    """TOKEN-budget mixture: published LLM mixtures are weighted by
    TOKENS, not documents (a domain of long documents at 10% of docs
    can be 40% of training tokens), so the mixing knob that matters is
    ``weights[d] * total_tokens`` per domain. Selection rule: per
    domain, docs in permanent-hash order (hash_bucket, id tie-break)
    are kept while the cumulative token count of PRECEDING kept docs
    is < the domain's budget — a greedy prefix that includes the doc
    crossing the boundary (overshoot < 1 document), deterministic
    across engines/reruns/repartitionings, and replayable in SQL as
    one window cumsum.

    Scale shape — the naive form is a per-domain window cumsum, i.e.
    the hot domain serializes through one reducer. Instead, TWO-PHASE
    BUCKET QUOTAS: (1) aggregate token sums per (domain, coarse plan
    bucket) — ``plan_buckets`` monotone slices of the hash space — and
    collect that bounded frame (domains x plan_buckets rows) as
    planning metadata, like IVF centroids; the driver walks each
    domain's buckets in hash order to find the BOUNDARY bucket and its
    residual budget. (2) buckets before the boundary are kept by a
    scan-local filter (zero shuffle); only the boundary bucket — ~1/
    plan_buckets of the domain — flows through the window cumsum. The
    two-phase selection is provably identical to the single-window
    prefix (same ordering, same prev<budget rule, equality cases
    resolved in the boundary window), which is exactly what the DuckDB
    oracle replays. Token counts must be precomputed in ``token_col``
    (one narrow projection; keeps this operator free of tokenizer
    choices)."""
    if total_tokens <= 0:
        raise ValueError(f"total_tokens must be positive, got {total_tokens}")
    width = -(-_BUCKETS // plan_buckets)  # ceil: pb = b // width is monotone in b
    bcol = hash_bucket(id_col, seed)
    pb = F.floor(bcol / F.lit(width)).cast("int")
    in_scope = df.filter(F.col(domain_col).isin(list(weights)))
    stats = (
        in_scope.groupBy(F.col(domain_col).alias("_d"), pb.alias("_pb"))
        .agg(F.sum(token_col).cast("bigint").alias("_s"))
        .collect()
    )
    per_domain: dict[str, list[tuple[int, int]]] = {}
    for r in stats:
        per_domain.setdefault(r["_d"], []).append((r["_pb"], r["_s"]))
    boundary: dict[str, int] = {}
    residual: dict[str, int] = {}
    for d, w in weights.items():
        budget = _round_half_up(w * total_tokens)
        cum = 0
        # sentinel: no boundary hit -> every bucket is fully included
        boundary[d], residual[d] = plan_buckets, 0
        for pbi, s in sorted(per_domain.get(d, [])):
            if cum + s >= budget:
                boundary[d], residual[d] = pbi, budget - cum
                break
            cum += s
    b_of = F.create_map(
        *[x for d in sorted(weights) for x in (F.lit(d), F.lit(boundary[d]))]
    )
    r_of = F.create_map(
        *[x for d in sorted(weights) for x in (F.lit(d), F.lit(residual[d]))]
    )
    from pyspark.sql import Window

    full = in_scope.filter(pb < b_of[F.col(domain_col)])
    edge = in_scope.filter(pb == b_of[F.col(domain_col)])
    w_edge = (
        Window.partitionBy(domain_col)
        .orderBy(bcol.asc(), F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    prev = F.sum(token_col).over(w_edge) - F.col(token_col)
    edge_kept = (
        edge.withColumn("_prev", prev)
        .filter(F.col("_prev") < r_of[F.col(domain_col)])
        .drop("_prev")
    )
    return full.unionByName(edge_kept)


def mixture_upsample(
    df: DataFrame,
    domain_col: str,
    weights: dict[str, float],
    total: int,
    id_col: str = "doc_id",
    seed: int = 42,
    max_epochs: int = 10,
) -> DataFrame:
    """The other half of the mixing knob: when a domain's target
    EXCEEDS its supply, repeat documents instead of clamping — the
    "epochs over the small domain" every published mixture runs
    (Wikipedia at 3.4 epochs in GPT-3's table, etc.). Each domain d
    with target t and supply n emits floor(t/n) full passes over every
    doc plus one extra copy of the (t mod n) smallest-hash docs, so
    the output hits t rows EXACTLY; oversupplied domains downsample
    exactly as ``mixture_sample``. Every emitted row carries an
    ``epoch`` column (0-based copy index) so downstream packing /
    shuffling can distinguish copies deterministically.

    Guardrail in the module's eager style: a domain needing more than
    ``max_epochs`` passes raises instead of silently exploding the
    corpus (a 100x repetition is almost always a weights typo, and at
    100 TB it is also a 100x bill). Cost shape: supply counts are one
    tiny collected aggregate; one exchange on the domain key for the
    per-domain hash rank; the repeat itself is a narrow
    explode(sequence(...)) — rows expand by exactly the mixture's
    epoch factor and nothing else."""
    from pyspark.sql import Window

    supply = {
        r[0]: r[1]
        for r in df.groupBy(domain_col).agg(F.count(F.lit(1)).alias("n")).collect()
    }
    plans = {}
    for d, wt in weights.items():
        n = supply.get(d, 0)
        if n == 0:
            continue
        t = _round_half_up(wt * total)
        full, rem = divmod(t, n) if t > n else (0, t)
        # total passes over the domain is ceil(t/n) = full + (rem>0):
        # guard on that, not on `full` alone, or a domain needing
        # exactly max_epochs+1 passes (rem > 0) slips through
        passes = full + (1 if rem else 0)
        if passes > max_epochs:
            raise ValueError(
                f"domain {d!r} needs {passes} epochs (target {t}, supply {n}) "
                f"> max_epochs={max_epochs}; raise max_epochs explicitly if "
                f"this repetition factor is intended"
            )
        plans[d] = (full, rem)
    full_of = F.create_map(
        *[x for d, (fl, _) in sorted(plans.items()) for x in (F.lit(d), F.lit(fl))]
    )
    rem_of = F.create_map(
        *[x for d, (_, rem) in sorted(plans.items()) for x in (F.lit(d), F.lit(rem))]
    )
    w = Window.partitionBy(domain_col).orderBy(
        hash_bucket(id_col, seed).asc(), F.col(id_col).asc()
    )
    repeats = full_of[F.col(domain_col)] + F.when(
        F.col("_rn") <= rem_of[F.col(domain_col)], 1
    ).otherwise(0)
    return (
        df.filter(F.col(domain_col).isin(list(plans)))
        .withColumn("_rn", F.row_number().over(w))
        .withColumn("_reps", repeats)
        .filter(F.col("_reps") > 0)
        .withColumn("epoch", F.explode(F.sequence(F.lit(0), F.col("_reps") - 1)))
        .drop("_rn", "_reps")
    )


def mixture_temperature(
    df: DataFrame,
    domain_col: str,
    alpha: float,
    total: int,
    id_col: str = "doc_id",
    seed: int = 42,
    method: str = "exact",
    salt_partitions: int = 32,
) -> DataFrame:
    """Temperature (alpha) sampling — mixture weights DERIVED from the
    corpus's own shares, p_d ∝ share_d^alpha (the multilingual
    recipe popularized by mBERT/XLM-R): alpha=1 reproduces natural
    proportions, alpha -> 0 flattens toward uniform — the
    tail-upweighting knob used when hand-tuning a weights table is
    impractical (hundreds of languages/domains). One O(domains)
    planning aggregate derives the weights, which then feed the
    identical exact/threshold machinery of ``mixture_sample`` —
    determinism, hot-domain salting, supply clamping and oracle
    replay carry over unchanged.

    Cross-engine float discipline: the share power and normalizer are
    evaluated in SORTED-domain order on both engines (left-fold sum),
    the target arithmetic keeps mixture_sample's pinned
    floor(x + 0.5), and the shipped fixtures' targets are pytest-swept
    to sit away from the .5 boundary under ulp-scale perturbation —
    so a last-ulp libm pow() difference cannot flip a target."""
    if alpha < 0:
        raise ValueError(f"alpha must be >= 0, got {alpha}")
    supply = {
        r[0]: r[1]
        for r in df.groupBy(domain_col).agg(F.count(F.lit(1)).alias("n")).collect()
    }
    n = float(sum(supply.values()))
    if n == 0:
        # mirror the alpha guard: an empty corpus has no shares to
        # derive weights from — fail loudly, not with ZeroDivisionError
        raise ValueError("mixture_temperature: empty corpus (no rows to derive shares from)")
    pw = {d: (c / n) ** alpha for d, c in sorted(supply.items())}
    z = 0.0
    for d in sorted(pw):
        z += pw[d]
    weights = {d: pw[d] / z for d in sorted(pw)}
    return mixture_sample(
        df, domain_col, weights, total, id_col, seed, method, salt_partitions
    )
