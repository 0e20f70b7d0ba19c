"""__spider_ray — a Ray-Data-native crawl frontier + fetch/parse engine.

A from-scratch re-implementation of the capabilities of the reference
crawl project (``Cjingger/__spider``, a Scrapy flight-fare spider —
see SURVEY.md), re-expressed Ray-Data-first:

- the crawl frontier is a ``ray.data.Dataset`` of URL rows, expanded /
  prioritised with ``flat_map`` / ``groupby(host)`` / ``sort`` shuffles;
- fetch and parse are ``map_batches`` stages over zero-copy Arrow
  batches (actor pools for stateful stages);
- the URL-seen set is a sharded bloom+cuckoo filter held in Ray actors;
- politeness (per-host token bucket + robots cache) is a Ray actor pool;
- output documents are interleaved text+media span docs written to a
  Lance table when ``lance`` is importable, else partitioned Parquet
  with an equivalent manifest (``sources.doc_store``).

No code is copied from the reference; file:line citations in docstrings
point at the behaviour being re-implemented.
"""

__version__ = "0.1.0"
