"""Driver contract for the graft builder (Ray Data target).

- ``entry()``: flagship KG-construction pipeline on a deterministic
  synthesized corpus (the north-rule input shape) at smoke scale.
- ``queries()``: one callable per implemented operator/pipeline
  (SURVEY.md §2 + training-data operators), each over ``sf_dir`` tables.
- ``oracle_sql()``: DuckDB equivalents with matching column names.

Ray is initialised by the driver BEFORE this module is imported: nothing
here calls ``ray.init`` / ``ray.shutdown``.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable
from typing import Any

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry() -> Any:
    """Flagship: corpus → extract → link → dedup; returns the triple Dataset."""
    from pyjelly_ray.pipelines.corpus import write_corpus_parquet
    from pyjelly_ray.pipelines.kg import extract_triples, link_triples, read_corpus
    from pyjelly_ray.stages.dedup import dedup_exact

    corpus_path = "/tmp/pyjelly_ray_entry_corpus.parquet"
    if not os.path.exists(corpus_path):
        write_corpus_parquet(corpus_path, seed=7, n_files=300)
    corpus = read_corpus(corpus_path)
    triples = extract_triples(corpus)
    linked = link_triples(triples)
    return dedup_exact(linked)


def queries() -> dict[str, Callable[[str], Any]]:
    from pyjelly_ray.pipelines.relational import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from pyjelly_ray.pipelines.relational import ORACLE_SQL

    return dict(ORACLE_SQL)
