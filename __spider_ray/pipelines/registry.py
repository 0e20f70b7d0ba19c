"""§2.10 — the user-extension surface: a pipeline-stage registry.

The reference's plugin points are Scrapy middlewares/pipelines wired by
priority in ``settings.py:63-86`` plus spider-per-site subclassing.
The Ray-native equivalent: a crawl pipeline is a LIST of named stages,
each a callable (stateless tasks) or a callable class (actor pool) with
its map_batches kwargs; ``apply`` folds them over a Dataset in priority
order.  Site-specific behavior = a different stage list, not a
subclass; fetch middleware = stages before/after the fetch stage.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Callable

import ray.data


@dataclass(order=True)
class Stage:
    priority: int
    name: str = field(compare=False)
    fn: Callable | type = field(compare=False)
    kwargs: dict[str, Any] = field(default_factory=dict, compare=False)


class StagePipeline:
    """Ordered, named map_batches stages (lower priority runs first —
    Scrapy middleware convention, settings.py:63-68)."""

    def __init__(self):
        self._stages: list[Stage] = []

    def register(self, name: str, fn: Callable | type, priority: int = 100,
                 **map_batches_kwargs: Any) -> "StagePipeline":
        if any(s.name == name for s in self._stages):
            raise ValueError(f"stage {name!r} already registered")
        kwargs = dict(map_batches_kwargs)
        kwargs.setdefault("batch_format", "pyarrow")
        self._stages.append(Stage(priority, name, fn, kwargs))
        return self

    def remove(self, name: str) -> "StagePipeline":
        self._stages = [s for s in self._stages if s.name != name]
        return self

    def names(self) -> list[str]:
        return [s.name for s in sorted(self._stages)]

    def apply(self, ds: ray.data.Dataset) -> ray.data.Dataset:
        for s in sorted(self._stages):
            ds = ds.map_batches(s.fn, **s.kwargs)
        return ds
