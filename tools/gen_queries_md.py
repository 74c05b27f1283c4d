"""Regenerate QUERIES.md from the query registry's docstrings.

Usage: python tools/gen_queries_md.py  (writes QUERIES.md in repo root).
Ray is auto-initialised by Ray Data if any import needs it; this script
only reads function metadata, so no Ray session is started.
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

HEADER = """# QUERIES — index of `queries()` entries

Auto-generated from the query docstrings (`python tools/gen_queries_md.py`).
Every entry takes `sf_dir` and returns a Dataset / Arrow table; *oracle* =
compared cell-by-cell against the DuckDB SQL in `oracle_sql()` by the
driver (sf0.01) and by `tests/test_queries_oracle.py` (sf0.001); most were
additionally verified at sf0.1 (32 cpus).  *rows-only* = no exact SQL
equivalent (approximate sketches, LSH, k-means, multimodal stubs) —
smoke-checked.

| # | query | check | what it does |
|---|---|---|---|
"""


def one_line(doc: str | None, limit: int = 220) -> str:
    if not doc:
        return ""
    text = re.sub(r"\s+", " ", doc.strip())
    text = text.replace("|", "\\|")
    if len(text) > limit:
        text = text[: limit - 1].rstrip() + "…"
    return text


def main() -> None:
    from pyjelly_ray.pipelines.relational import ORACLE_SQL, QUERIES

    rows = []
    for i, name in enumerate(sorted(QUERIES), start=1):
        check = "oracle" if name in ORACLE_SQL else "rows-only"
        rows.append(
            f"| {i} | `{name}` | {check} | {one_line(QUERIES[name].__doc__)} |"
        )
    out = HEADER + "\n".join(rows) + "\n"
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(root, "QUERIES.md"), "w") as f:
        f.write(out)
    print(f"QUERIES.md: {len(rows)} entries "
          f"({sum(1 for n in QUERIES if n in ORACLE_SQL)} oracle)")


if __name__ == "__main__":
    main()
