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


def normalize_url(url: Column | str) -> Column:
    """Steps 1-6 of the module contract as one codegen'd expression
    chain. NULL stays NULL (no URL is not the same as an empty one)."""
    u = F.col(url) if isinstance(url, str) else url
    u = F.trim(u)
    # 2. fragment first, so later steps never see it
    u = F.regexp_replace(u, r"#.*$", "")
    # 1. lowercase scheme + authority only: scheme://host[:port] is
    # everything before the first single '/'-after-authority
    head = F.regexp_extract(u, r"^([A-Za-z][A-Za-z0-9+.-]*://[^/?]*)", 1)
    tail = F.substring(u, F.length(head) + F.lit(1), F.lit(1 << 30))
    u = F.concat(F.lower(head), tail)
    # 3. default ports (lookahead-free so the oracle's RE2 replays it)
    u = F.regexp_replace(u, r"^(http://[^/?:]*):80($|[/?].*)", r"$1$2")
    u = F.regexp_replace(u, r"^(https://[^/?:]*):443($|[/?].*)", r"$1$2")
    # 4. www.
    u = F.regexp_replace(u, r"^([a-z][a-z0-9+.-]*://)www\.", r"$1")
    # 5. query params: split, drop tracking, sort, rebuild
    qpos = F.instr(u, "?")
    base = F.when(qpos > 0, F.substring(u, F.lit(1), qpos - 1)).otherwise(u)
    query = F.when(
        qpos > 0, F.substring(u, qpos + 1, F.lit(1 << 30))
    ).otherwise(F.lit(""))
    kept = F.array_sort(
        F.filter(
            F.split(query, "&"),
            lambda p: (p != F.lit("")) & ~p.rlike(TRACKING_PARAM_RE),
        )
    )
    # 6. trailing slash on a non-root PATH — applied to the query-less
    # base so ".../x/?a=1" and ".../x?a=1" canonicalize together
    base = F.regexp_replace(base, r"^([a-z][a-z0-9+.-]*://[^/]+/.+?)/$", r"$1")
    return F.when(
        F.size(kept) > 0, F.concat(base, F.lit("?"), F.array_join(kept, "&"))
    ).otherwise(base)


def host_of(url_norm: Column | str) -> Column:
    """Host of a NORMALIZED url (port already stripped by step 3 when
    default; explicit non-default ports excluded here)."""
    u = F.col(url_norm) if isinstance(url_norm, str) else url_norm
    return F.regexp_extract(u, r"^[a-z][a-z0-9+.-]*://([^/:?]+)", 1)


def registered_domain(url_norm: Column | str) -> Column:
    """Last two host labels, or three when the two-label tail is a
    known multi-part public suffix (MULTI_PART_SUFFIXES)."""
    labels = F.split(host_of(url_norm), r"\.")
    n = F.size(labels)
    last2 = F.concat_ws(
        ".",
        F.try_element_at(labels, (n - 1).cast("int")),
        F.try_element_at(labels, n.cast("int")),
    )
    last3 = F.concat_ws(
        ".",
        F.try_element_at(labels, (n - 2).cast("int")),
        F.try_element_at(labels, (n - 1).cast("int")),
        F.try_element_at(labels, n.cast("int")),
    )
    is_multi = F.lit(False)
    for suf in MULTI_PART_SUFFIXES:
        is_multi = is_multi | (last2 == F.lit(suf))
    return F.when(n <= 2, last2).when(is_multi & (n >= 3), last3).otherwise(last2)


def url_normalize_table(
    df: DataFrame, url_col: str = "url", id_col: str = "doc_id"
) -> DataFrame:
    """(id, url, url_norm, registered_domain) — one scan-local
    projection; the dedup/cap stages key on its outputs."""
    norm = normalize_url(url_col)
    return df.select(
        F.col(id_col),
        F.col(url_col).alias("url"),
        norm.alias("url_norm"),
        registered_domain(norm).alias("registered_domain"),
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
