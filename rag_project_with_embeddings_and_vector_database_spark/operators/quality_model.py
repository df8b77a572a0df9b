"""Model-based quality filtering (north-star extension).

The heuristic quality signals (functions/text.py quality_features,
repetition_stats) are the first filter pass every LLM-data pipeline
runs; the second pass in the published pipelines is a TRAINED
classifier — GPT-3/PaLM filtered CommonCrawl with a logistic-regression
quality model over hashed bag-of-words features, scored against a
high-quality reference corpus. This module is that component,
Spark-first: feature hashing is a scan-local projection (pyspark.ml
HashingTF over the shared whitespace tokenizer), logistic regression
trains with L-BFGS treeAggregate passes (linear scans, no shuffle
beyond the gradient aggregation), and scoring is one embarrassingly
parallel transform — every stage rides executor count at 100 TB.

Model internals (L-BFGS trajectories) are not SQL-expressible, so the
harness row is rows-only and SELF-VALIDATING: held-out accuracy below
the asserted floor raises instead of returning plausible garbage (the
ANN recall-floor pattern).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

def train_quality_classifier(
    labeled: DataFrame,
    text_col: str = "text",
    label_col: str = "label",
    num_features: int = 4096,
    reg_param: float = 0.01,
    max_iter: int = 50,
):
    """Fit the GPT-3-style quality model: lowercased whitespace tokens
    -> feature-hashed term counts (2^k buckets, no vocabulary build —
    the only vocab-free featurization that works at corpus scale) ->
    binomial logistic regression. ``labeled`` needs ``text_col`` and a
    0/1 ``label_col`` (1 = quality reference, e.g. curated corpus;
    0 = raw crawl). Returns a fitted pyspark.ml PipelineModel whose
    transform adds ``probability``/``prediction``."""
    from pyspark.ml import Pipeline
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import HashingTF, SQLTransformer

    toks = SQLTransformer(
        statement=(
            f"SELECT *, transform(filter(split({text_col}, '\\\\s+'), x -> x != ''),"
            " t -> lower(t)) AS _toks FROM __THIS__"
        )
    )
    tf = HashingTF(inputCol="_toks", outputCol="_features", numFeatures=num_features)
    lr = LogisticRegression(
        featuresCol="_features",
        labelCol=label_col,
        regParam=reg_param,
        maxIter=max_iter,
    )
    return Pipeline(stages=[toks, tf, lr]).fit(labeled)


def score_quality(
    docs: DataFrame,
    model,
    id_col: str = "doc_id",
    keep_threshold: float | None = None,
) -> DataFrame:
    """Score documents with a fitted quality model: returns
    (id, quality_prob, keep?) — ``quality_prob`` is P(label=1). With
    ``keep_threshold`` set, adds the boolean ``keep`` filter column the
    pipeline actually gates on (GPT-3 used a Pareto-noised threshold;
    deterministic thresholding keeps the oracle story honest). One
    scan-local transform — no shuffle anywhere."""
    from pyspark.ml.functions import vector_to_array

    scored = model.transform(docs).select(
        id_col,
        F.round(vector_to_array("probability")[1], 6).alias("quality_prob"),
    )
    if keep_threshold is not None:
        scored = scored.withColumn(
            "keep", F.col("quality_prob") >= F.lit(keep_threshold)
        )
    return scored


def quality_classifier_eval(
    labeled: DataFrame,
    text_col: str = "text",
    label_col: str = "label",
    id_col: str = "doc_id",
    train_frac: float = 0.7,
    accuracy_floor: float = 0.9,
    seed: int = 42,
    num_features: int = 4096,
    max_iter: int = 50,
) -> DataFrame:
    """Train/eval harness for the quality model: deterministic
    hash-split (never rand() — operators/sampling.py discipline),
    fit on train, score held-out, RAISE if held-out accuracy < the
    floor. Returns one row of summary stats (n_train, n_test,
    n_correct, accuracy) — self-validating evidence in the
    recall-floor style."""
    from .sampling import hash_bucket, _BUCKETS

    thr = int(round(train_frac * _BUCKETS))
    is_train = hash_bucket(id_col, seed) < F.lit(thr)
    # the labeled set is curated and bounded (MBs, not the corpus), so
    # collapse it to a few partitions before the iterative fit: every
    # L-BFGS iteration is a treeAggregate job, and its latency is task
    # count, not data volume, at this size
    train = labeled.filter(is_train).coalesce(8)
    test = labeled.filter(~is_train)
    model = train_quality_classifier(
        train,
        text_col=text_col,
        label_col=label_col,
        num_features=num_features,
        max_iter=max_iter,
    )
    pred = model.transform(test).select(
        id_col, label_col, F.col("prediction").cast("int").alias("pred")
    )
    agg = pred.agg(
        F.count(F.lit(1)).alias("n_test"),
        F.sum((F.col(label_col) == F.col("pred")).cast("long")).alias("n_correct"),
    ).first()
    n_train = train.count()
    n_test, n_correct = agg["n_test"], agg["n_correct"]
    accuracy = n_correct / max(n_test, 1)
    if accuracy < accuracy_floor:
        raise AssertionError(
            f"quality classifier held-out accuracy {accuracy:.3f} < floor "
            f"{accuracy_floor} (n_train={n_train}, n_test={n_test})"
        )
    spark = labeled.sparkSession
    return spark.createDataFrame(
        [(n_train, n_test, n_correct, round(accuracy, 6), True)],
        "n_train long, n_test long, n_correct long, accuracy double, floor_met boolean",
    )
