"""Driver contract for the graft builder (Ray Data target).

The driver calls ``ray.init`` itself before importing this module:
nothing here (or in the library) calls ``ray.init``/``ray.shutdown``.

- ``entry()`` — flagship crawl pipeline at sf0.001 (seeds → frontier →
  URL-dedup → fetch → parse → interleaved span docs).
- ``queries()`` — one callable per implemented operator/pipeline
  (SURVEY.md §2), each taking ``sf_dir``.
- ``oracle_sql()`` — matching DuckDB SQL; the synthetic crawl content
  is a pure md5 function of the driver tables, so even fetch/parse are
  SQL-checkable (see ``__spider_ray/pipelines/oracle_sqlgen.py``).
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

from __spider_ray.pipelines import crawl
from __spider_ray.pipelines.queries import registry


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001; returns the span
    documents Dataset (driver checks rows >= 0, stable schema)."""
    return crawl.documents("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    return {name: fn for name, (fn, _sql) in registry().items()}


def oracle_sql() -> dict[str, str]:
    return {name: sql for name, (_fn, sql) in registry().items() if sql is not None}
