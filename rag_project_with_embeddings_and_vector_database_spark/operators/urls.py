"""URL normalization, registered-domain extraction, and per-domain
caps — the URL-filtering stage every web-crawl corpus pipeline runs
BEFORE content dedup (CCNet / RefinedWeb shape): crawl frontiers emit
the same page under syntactic URL variants (case, default ports, www,
tracking parameters, fragments, parameter order), and a handful of
hosts dominate raw crawls until a per-domain quota rebalances them.

The reference repo has no web-scale ingestion at all (3 curated local
PDFs, /root/reference/src/document_loader.py); this is north-star
surface alongside gopher.py / repetition.py / boilerplate.py.

All pure native expressions — regexp chains plus one split/sort/join
for the query string — so normalization is scan-local and codegen'd;
the only exchange in ``domain_cap`` is the per-domain window rank
(reusing ``sampling.stratified_sample``'s permanent-hash convention).

Normalization steps (documented contract, replayed by the DuckDB
oracle):
  1. trim; lowercase the scheme and host (path/query case preserved)
  2. strip the fragment (``#...``)
  3. drop default ports (``:80`` for http, ``:443`` for https)
  4. drop a leading ``www.`` host label
  5. drop tracking query parameters (``utm_*``, ``gclid``, ``fbclid``,
     ``ref``), SORT the survivors byte-wise, and rebuild the query —
     parameter order never distinguishes two URLs again; an emptied
     query drops its ``?``
  6. drop one trailing slash from a non-root path

``registered_domain`` takes the host's last two labels, or three when
the two-label suffix is in ``MULTI_PART_SUFFIXES`` — a representative
subset of the Public Suffix List (the full PSL is a deployment data
file swapped in at runtime, exactly like vendor model weights for the
embedding backend; the ALGORITHM is what this module pins).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .sampling import hash_bucket

# Representative multi-part public suffixes (subset of the PSL — see
# module docstring). Sorted, deduplicated; harness oracles replay the
# SAME tuple so both engines agree by construction.
MULTI_PART_SUFFIXES = (
    "ac.uk", "co.jp", "co.in", "co.kr", "co.nz", "co.uk", "co.za",
    "com.au", "com.br", "com.cn", "com.mx", "com.sg", "com.tr",
    "gov.uk", "ne.jp", "net.au", "or.jp", "org.uk",
)

# Tracking query parameters dropped by step 5.
TRACKING_PARAM_RE = r"^(utm_[A-Za-z0-9_]*|gclid|fbclid|ref)="


def _host_of(url_norm: Column) -> Column:
    """Host of a NORMALIZED url (default port already stripped;
    explicit non-default ports excluded here)."""
    return F.regexp_extract(url_norm, r"^[a-z][a-z0-9+.-]*://([^/:?]+)", 1)


def url_normalize_table(
    df: DataFrame, url_col: str = "url", id_col: str = "doc_id"
) -> DataFrame:
    """(id, url, url_norm, registered_domain) — the normalization
    steps run as SUCCESSIVE NARROW PROJECTIONS (still one scan-local
    codegen stage: Catalyst collapses adjacent projects, but each
    step's re-references resolve to named attributes instead of
    duplicating the upstream expression tree — a single-Column chain
    re-expands every reuse and the generated code grows multiplicatively,
    measured as multi-MiB task binaries that OOM a default-1g driver).
    NULL url stays NULL throughout."""
    keep = [F.col(id_col), F.col(url_col).alias("url")]
    # 2. trim + fragment first, so later steps never see it
    d = df.select(*keep, F.regexp_replace(F.trim(F.col(url_col)), r"#.*$", "").alias("_u"))
    keep = [id_col, "url"]
    # 1. lowercase scheme + authority only (everything before the
    # first '/'-after-authority or '?')
    d = d.select(
        *keep, "_u",
        F.regexp_extract("_u", r"^([A-Za-z][A-Za-z0-9+.-]*://[^/?]*)", 1).alias("_h"),
    )
    d = d.select(
        *keep,
        F.concat(
            F.lower("_h"),
            F.substring(F.col("_u"), F.length("_h") + F.lit(1), F.lit(1 << 30)),
        ).alias("_u"),
    )
    # 3. default ports (lookahead-free so the oracle's RE2 replays it)
    # 4. a leading www. host label
    d = d.select(
        *keep,
        F.regexp_replace(
            F.regexp_replace(
                F.regexp_replace(
                    F.col("_u"), r"^(http://[^/?:]*):80($|[/?].*)", r"$1$2"
                ),
                r"^(https://[^/?:]*):443($|[/?].*)", r"$1$2",
            ),
            # (?:www\.)+ consumes EVERY consecutive leading www label:
            # stripping only one broke idempotence on www.www.host —
            # normalize(normalize(x)) must equal normalize(x)
            # (property-swept in tests/test_urls.py)
            r"^([a-z][a-z0-9+.-]*://)(?:www\.)+", r"$1",
        ).alias("_u"),
    )
    # 5. query params: split, drop tracking, sort, rebuild; 6. trailing
    # slash on a non-root PATH (applied to the query-less base so
    # ".../x/?a=1" and ".../x?a=1" canonicalize together)
    d = d.select(*keep, "_u", F.instr("_u", "?").alias("_q"))
    d = d.select(
        *keep,
        F.regexp_replace(
            F.when(F.col("_q") > 0, F.substring(F.col("_u"), F.lit(1), F.col("_q") - 1))
            .otherwise(F.col("_u")),
            r"^([a-z][a-z0-9+.-]*://[^/]+/.+?)/$", r"$1",
        ).alias("_b"),
        F.array_sort(
            F.filter(
                F.split(
                    F.when(
                        F.col("_q") > 0,
                        F.substring(F.col("_u"), F.col("_q") + 1, F.lit(1 << 30)),
                    ).otherwise(F.lit("")),
                    "&",
                ),
                lambda p: (p != F.lit("")) & ~p.rlike(TRACKING_PARAM_RE),
            )
        ).alias("_k"),
    )
    d = d.select(
        *keep,
        F.when(
            F.size("_k") > 0,
            F.concat(F.col("_b"), F.lit("?"), F.array_join("_k", "&")),
        )
        .otherwise(F.col("_b"))
        .alias("url_norm"),
    )
    # registered domain: last two host labels, or three when the
    # two-label tail is a known multi-part public suffix. Labels are
    # indexed from the END with CONSTANT negative positions — NULL-safe
    # (try_element_at past either end is NULL, and concat_ws skips
    # NULLs) and never index 0: the old ``_n - 1`` form evaluated
    # index 0 whenever the host split to a single label — a
    # single-label host (http://localhost/x) or ANY scheme-less/
    # malformed/empty url (empty host -> one empty label) — and one
    # such poison row aborted the whole job with INVALID_INDEX_OF_ZERO
    # (ADVICE r10). Those rows now degrade to the lone label (or '').
    d = d.select(
        *keep, "url_norm",
        F.split(_host_of(F.col("url_norm")), r"\.").alias("_labels"),
    )
    d = d.select(
        *keep, "url_norm", "_labels", F.size("_labels").alias("_n")
    )
    last2 = F.concat_ws(
        ".",
        F.try_element_at("_labels", F.lit(-2)),
        F.try_element_at("_labels", F.lit(-1)),
    )
    d = d.select(*keep, "url_norm", "_labels", "_n", last2.alias("_l2"))
    last3 = F.concat_ws(
        ".",
        F.try_element_at("_labels", F.lit(-3)),
        F.col("_l2"),
    )
    is_multi = F.col("_l2").isin(*MULTI_PART_SUFFIXES)
    # the NULL guard keeps the documented "NULL url stays NULL"
    # contract: concat_ws SKIPS nulls, so without it a NULL url's
    # registered_domain would collapse to '' instead of NULL
    return d.select(
        *keep, "url_norm",
        F.when(
            F.col("url_norm").isNotNull(),
            F.when(F.col("_n") <= 2, F.col("_l2"))
            .when(is_multi & (F.col("_n") >= 3), last3)
            .otherwise(F.col("_l2")),
        ).alias("registered_domain"),
    )


def domain_cap(
    normed: DataFrame,
    max_per_domain: int,
    id_col: str = "doc_id",
    seed: int = 42,
) -> DataFrame:
    """Per-registered-domain quota: ``kept`` is true for at most
    ``max_per_domain`` rows per domain, chosen by the permanent salted
    hash with id tie-break (the ``stratified_sample`` convention —
    reproducible across reruns, repartitionings, and engines). Also
    marks ``url_dup`` = a smaller-id row shares this row's normalized
    URL (the syntactic-duplicate census normalization exists for).
    Two window exchanges (domain key, url_norm key) — both uniform
    hash keys; at 100 TB each is one sort-shuffle of (id, domain,
    url_norm) triples, never of document payloads."""
    from pyspark.sql import Window

    wd = Window.partitionBy("registered_domain").orderBy(
        hash_bucket(id_col, seed).asc(), F.col(id_col).asc()
    )
    wu = Window.partitionBy("url_norm").orderBy(F.col(id_col).asc())
    return (
        normed.withColumn("_rn", F.row_number().over(wd))
        .withColumn("kept", F.col("_rn") <= max_per_domain)
        .drop("_rn")
        .withColumn("url_dup", F.row_number().over(wu) > 1)
    )
