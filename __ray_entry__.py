"""Driver contract for the graft builder (Ray Data target).

The driver calls ``ray.init`` itself before importing this module:
nothing here (or in versa_ray) calls ray.init/ray.shutdown.

``entry()`` runs the flagship KG pipeline (synthetic RDFa page corpus
-> extraction -> doc-local transform -> entity scoring -> dedup
shuffle). ``queries()`` exposes every implemented operator from
SURVEY.md §2 plus the training-data ops; ``oracle_sql()`` gives the
DuckDB-equivalent for each SQL-expressible one.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship pipeline at smoke scale; returns the deduped linkset."""
    from versa_ray.model.linkset import distinct_links
    from versa_ray.web.kgpipeline import extract_links, score_entities
    from versa_ray.web.synth import author_name, pages_dataset

    n = 120
    pages = pages_dataset(n)
    links = extract_links(pages, check_text=True)
    alias = {author_name(42, 0): "https://authority.example.org/person/0"}
    links = score_entities(links, alias)
    return distinct_links(links)


def queries() -> dict[str, Callable[[str], Any]]:
    from versa_ray.queries import build_queries

    return build_queries()


def oracle_sql() -> dict[str, str]:
    from versa_ray.queries import build_oracles

    return build_oracles()
