"""Generate the README operational-walkthrough inputs under /tmp/kgdemo:
a tiny OBO terminology (v1, and v2 = one concept added + one synonym
changed) derived from the builtin fixture vocabulary, and two corpus
snapshots derived from /root/testdata/sf0.001 (v2 = 3 docs changed,
2 added, 2 deleted). Everything is deterministic — no external data.

    python tools/make_kgdemo.py [out_dir]   # default /tmp/kgdemo
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nobletools_spark.sources.fixtures import (  # noqa: E402
    BUILTIN_CONCEPTS,
    BUILTIN_ISA_EDGES,
)

# local names for the ancestor-only CUIs that BUILTIN_ISA_EDGES
# references but BUILTIN_CONCEPTS (leaf vocabulary) does not define
ANCESTORS = {"C100": "Join Operator", "C110": "Scan Operator",
             "C120": "Relational Operator", "C130": "Entity Concept",
             "C000": "Root"}


def write_obo(path: str, concepts, edges, extra=()) -> None:
    parents: dict[str, list[str]] = {}
    for c, p in edges:
        parents.setdefault(c, []).append(p)
    with open(path, "w") as f:
        f.write("format-version: 1.2\nontology: kgdemo\n")
        for cui, name in ANCESTORS.items():
            f.write(f"\n[Term]\nid: {cui}\nname: {name}\n")
            for p in parents.get(cui, []):
                f.write(f"is_a: {p}\n")
        for c in list(concepts) + list(extra):
            f.write(f"\n[Term]\nid: {c['cui']}\nname: {c['name']}\n")
            for s in c["synonyms"]:
                if s != c["name"]:
                    f.write(f'synonym: "{s}" EXACT []\n')
            for p in parents.get(c["cui"], []):
                f.write(f"is_a: {p}\n")


def main() -> None:
    out = (sys.argv[1] if len(sys.argv) > 1 else "/tmp/kgdemo").rstrip("/")
    os.makedirs(out, exist_ok=True)

    write_obo(f"{out}/term_v1.obo", BUILTIN_CONCEPTS, BUILTIN_ISA_EDGES)
    v2 = []
    for c in BUILTIN_CONCEPTS:
        c = dict(c)
        if c["cui"] == "C104":  # release edit: new synonym on Hash Join
            c["synonyms"] = tuple(c["synonyms"]) + ("hashed join",)
        v2.append(c)
    extra = [{"cui": "C109", "name": "Filter Predicate",
              "synonyms": ("Filter Predicate", "filter")}]
    write_obo(f"{out}/term_v2.obo", v2,
              BUILTIN_ISA_EDGES + (("C109", "C120"),), extra)

    import duckdb

    con = duckdb.connect()
    src = "/root/testdata/sf0.001/documents.parquet"
    con.execute(f"""
        COPY (SELECT doc_id, text FROM '{src}')
        TO '{out}/docs_v1.parquet' (FORMAT PARQUET)""")
    con.execute(f"""
        COPY (
          SELECT doc_id,
                 CASE WHEN doc_id % 100 = 7
                      THEN text || ' hash join customer'
                      ELSE text END AS text
          FROM '{src}' WHERE doc_id % 250 <> 3
          UNION ALL
          SELECT 900000 + r AS doc_id, 'spark vector table scan' AS text
          FROM (SELECT unnest(range(2)) AS r)
        ) TO '{out}/docs_v2.parquet' (FORMAT PARQUET)""")
    n1 = con.execute(f"SELECT count(*) FROM '{out}/docs_v1.parquet'")\
        .fetchone()[0]
    n2 = con.execute(f"SELECT count(*) FROM '{out}/docs_v2.parquet'")\
        .fetchone()[0]
    print(f"wrote {out}: term_v1/term_v2.obo, "
          f"docs_v1.parquet ({n1}), docs_v2.parquet ({n2})")


if __name__ == "__main__":
    main()
