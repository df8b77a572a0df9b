"""Generate QUERIES.md: every registered harness query, its check class
(DuckDB-oracle hash vs rows-only), and its one-line description."""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

from rag_project_with_embeddings_and_vector_database_spark import harness


def main() -> None:
    qs = harness.queries()
    oracles = harness.oracle_sql()
    lines = [
        "# QUERIES — harness registry",
        "",
        f"{len(qs)} registered queries; {len(oracles)} oracle-checked "
        "(row-count + schema + order-insensitive value hash vs DuckDB), "
        "the rest rows-checked (UDF folds, seeded ANN, streaming-stateful).",
        "",
        "| query | check | what it demonstrates |",
        "|---|---|---|",
    ]
    for name in sorted(qs):
        doc = (qs[name].__doc__ or "").strip().split("\n")[0].rstrip(".")
        check = "oracle" if name in oracles else "rows"
        lines.append(f"| `{name}` | {check} | {doc} |")
    with open("QUERIES.md", "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote QUERIES.md: {len(qs)} queries, {len(oracles)} oracled")


if __name__ == "__main__":
    main()
