"""S3 — the fetch stage: an actor-pool ``map_batches`` over frontier rows.

The reference fetches through Twisted with a cipher-shuffling download
handler (``HttpDownloadHandler.py:11-23``), 4-6 concurrent requests and
a 2-4 s per-host delay (``settings.py:32-38``).  Here:

- ``FetchWorker`` is a callable CLASS → Ray actor pool; per-actor
  session state (UA table, politeness client handle) is built once in
  ``__init__`` and reused per batch;
- the network is replaced by the deterministic synthetic web
  (``synth.page_body``: body = f(md5(url))), so fetch cost is the md5 +
  JSON encode per page — the same *shape* of work (per-page, not
  per-column) a real fetch would do;
- politeness is enforced by batched token grants from the
  ``HostPolicyActor`` pool (state/politeness.py): ONE actor call per
  (host, count) per batch, never per URL;
- transport failures become an explicit ``error`` column (the
  reference's ``url == "**"`` sentinel, ``YlSpiderMiddleware.py:186-194``).

``fetch_batch`` is the pure, politeness-free transform used by the
SQL-checked correctness queries; ``FetchWorker`` wraps it with state.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .. import synth
from ..functions.hashing import uniform01

FETCH_COLS = ("status", "error", "fetch_ts", "elapsed_ms", "body")


def fetch_batch(batch: pa.Table, status_fn=None, body_fn=None) -> pa.Table:
    """frontier batch → batch + (status, error, fetch_ts, elapsed_ms, body).

    Passes every frontier column through so parse can use meta without a
    join.  elapsed_ms is a deterministic per-URL jitter (replaces the
    reference's randomized DOWNLOAD_DELAY, settings.py:37).
    ``status_fn``/``body_fn`` select the synthetic API variant (default
    v1 ``fltitem``; v2 ``listCards`` passes ``synth.page_status_v2`` /
    ``synth.page_body_v2``).
    """
    urls = batch["url"].to_pylist()
    if status_fn is None and body_fn is None:
        # default v1 API: the vectorized synthetic-web path (one md5
        # pass per url/flight, numpy field math — bit-identical to the
        # scalar page_status/page_body, pinned by test_stages_unit)
        statuses, errors, bodies = synth.page_responses_v1(urls)
    else:
        status_fn = status_fn or synth.page_status
        body_fn = body_fn or synth.page_body
        statuses = np.empty(len(urls), dtype=np.int32)
        errors = [None] * len(urls)
        bodies = [b""] * len(urls)
        for i, u in enumerate(urls):
            st, err, _n = status_fn(u)
            statuses[i] = st
            errors[i] = err
            bodies[i] = body_fn(u)
    elapsed = (uniform01(batch["url"].combine_chunks(), salt="elapsed") * 2000 + 50).astype(np.int32)
    fetch_ts = pa.array(
        np.full(len(urls), np.datetime64(synth.CREATE_TIME_STR.replace(" ", "T"), "us")))
    out = batch
    for name, col in (
        ("status", pa.array(statuses)),
        ("error", pa.array(errors, type=pa.string())),
        ("fetch_ts", fetch_ts),
        ("elapsed_ms", pa.array(elapsed)),
        ("body", pa.array(bodies, type=pa.binary())),
    ):
        out = out.append_column(name, col)
    return out


def fetch_with_policy(batch: pa.Table, politeness=None,
                      status_fn=None, body_fn=None) -> pa.Table:
    """Task-flavor fetch: same semantics as FetchWorker but runs as
    stateless tasks (elastic, no pool startup cost) — the right shape
    when the only 'state' is the politeness client handle.

    Pacing is per-host sub-batch: each host's URLs are issued after
    THAT host's token wait, in ascending-wait order, instead of the
    whole batch sleeping the max wait — the budget is exact per host
    (a batch spanning a slow host no longer delays the fast ones).
    Zero-wait batches (the unlimited-rate default) skip straight
    through with no reordering."""
    return paced_fetch(batch, politeness,
                       lambda t: fetch_batch(t, status_fn=status_fn,
                                             body_fn=body_fn))


def _pacing_plan(batch: pa.Table, waits: dict[str, float]):
    """Shared pacing geometry: sort rows by their host's grant wait and
    cut the sorted batch at wait boundaries.  Returns ``None`` when no
    row needs to wait, else ``(sorted_batch, sorted_waits, bounds)``."""
    if max(waits.values(), default=0.0) <= 0.0:
        return None
    hosts = np.asarray(batch["host"].to_pylist(), dtype=object)
    # null hosts get zero wait: acquire_waits drops None keys from the
    # grant dict, and under the epoch pass's max_retries=0 a KeyError
    # here would fail the whole chunk — fetch_with_policy/FetchWorker
    # are public entry points without the robots-mask null guarantee
    row_wait = np.array([waits.get(str(h), 0.0) if h is not None else 0.0
                         for h in hosts])
    order = np.argsort(row_wait, kind="stable")
    sorted_batch = batch.take(pa.array(order))
    sw = row_wait[order]
    bounds = np.concatenate([[0], np.nonzero(np.diff(sw) > 0)[0] + 1, [len(sw)]])
    return sorted_batch, sw, bounds


def paced_fetch(batch: pa.Table, politeness, fetch_fn) -> pa.Table:
    """Per-host sub-batch pacing core, shared by the list and detail
    fetch stages.  Sleeps to each host's deadline in ascending order, so
    one batch's total wait is the MAX host wait, never the sum."""
    if batch.num_rows == 0 or politeness is None:
        return fetch_fn(batch)
    plan = _pacing_plan(batch, politeness.acquire_waits(batch["host"]))
    if plan is None:
        return fetch_fn(batch)
    import time as _time
    sorted_batch, sw, bounds = plan
    t0 = _time.monotonic()
    parts = []
    for i in range(len(bounds) - 1):
        lo, hi = int(bounds[i]), int(bounds[i + 1])
        dt = sw[lo] - (_time.monotonic() - t0)
        if dt > 0:
            _time.sleep(dt)
        parts.append(fetch_fn(sorted_batch.slice(lo, hi - lo)))
    return pa.concat_tables(parts)


ORIGIN_CIPHERS = ("TLS13-AES-256-GCM-SHA384:TLS13-CHACHA20-POLY1305-SHA256:"
                  "TLS13-AES-128-GCM-SHA256:ECDH+AESGCM:ECDH+CHACHA20:DH+AESGCM:"
                  "DH+CHACHA20:ECDH+AES256:DH+AES256:ECDH+AES128:DH+AES:"
                  "RSA+AESGCM:RSA+AES")      # cipher pool (HttpDownloadHandler.py:9)


def shuffled_ciphers(key: str) -> str:
    """Deterministic per-session cipher order — the reference shuffles
    the TLS cipher list per request (``HttpDownloadHandler.py:11-23``,
    ``shuffle_ciphers``); here the permutation is a pure function of the
    session key so replays are stable."""
    import hashlib
    ciphers = ORIGIN_CIPHERS.split(":")
    seed = int.from_bytes(hashlib.md5(key.encode()).digest()[:8], "little")
    rng = np.random.RandomState(seed % (2**32))
    rng.shuffle(ciphers)
    return ":".join(ciphers) + ":!aNULL:!MD5:!DSS"


class RealTransport:
    """Import-gated live-HTTP plug point (mirrors the reference's
    ``MyHttpDownloadHandler``): an httpx client per actor with a
    per-session shuffled TLS cipher suite.  The sandbox has no network
    and no ``httpx``, so construction raises unless the package is
    present — ``FetchWorker(transport="real")`` is how a real
    deployment swaps the synthetic web for live fetches, the same shape
    as the render/media plug points (stages/render.py, stages/media.py).
    """

    def __init__(self, session_key: str, timeout_s: float = 3.0):
        try:
            import httpx
        except ImportError as e:              # pragma: no cover - sandbox
            raise NotImplementedError(
                "RealTransport needs the httpx package (absent in this "
                "sandbox); use the synthetic transport instead") from e
        import ssl
        ctx = ssl.create_default_context()
        ctx.set_ciphers(shuffled_ciphers(session_key))
        # DOWNLOAD_TIMEOUT = 3 (settings.py:38)
        self.client = httpx.Client(verify=ctx, timeout=timeout_s)

    def fetch(self, url: str, headers: dict | None = None) -> tuple[int, bytes]:
        r = self.client.post(url, headers=headers or {})
        return r.status_code, r.content


class FetchWorker:
    """Stateful fetch actor for ``map_batches(FetchWorker, concurrency=N)``.

    __init__ runs once per actor (session/UA state, politeness handle —
    the fix for the reference's model-reload-per-request anti-pattern,
    ``detect_server.py:65-345``); __call__ runs per batch.

    S12 — proxy rotation: the reference loads 80 proxies/hour into
    Redis and random-picks per request (``http_proxy.py:12-36``;
    ``CtripSpiderMiddleware.py:434-444``).  Here the pool is per-actor
    state rotated round-robin per batch — deterministic, no external
    store.  T3/T4 — bounded challenge retries replace the reference's
    unbounded recursive captcha loops
    (``CtripSpiderMiddleware.py:254-280``).
    """

    def __init__(self, politeness=None, max_retries: int = 2,
                 proxies: list[str] | None = None, credentials=None,
                 proxy_pool=None, transport: str = "synthetic"):
        self.politeness = politeness          # HostPolicyClient or None
        self.credentials = credentials        # CredentialClient or None
        self.proxy_pool = proxy_pool          # ProxyPoolClient or None —
        # the TTL-rotating pool (http_proxy.py:12-36 semantics: hourly
        # batches, 61-min expiry); a static ``proxies`` list remains the
        # zero-dependency default
        self.max_retries = max_retries
        self.proxies = proxies or [f"proxy-{i}.pool.test:8080" for i in range(8)]
        self._proxy_i = 0
        self.session_id = "session"
        # per-actor TLS session with shuffled ciphers (import-gated;
        # synthetic transport in the sandbox)
        self.transport = RealTransport(self.session_id) \
            if transport == "real" else None

    def next_proxy(self, key: str | None = None) -> str:
        if self.proxy_pool is not None:
            return self.proxy_pool.pick(key or str(self._proxy_i))
        p = self.proxies[self._proxy_i % len(self.proxies)]
        self._proxy_i += 1
        return p

    def _fetch_live(self, batch: pa.Table) -> pa.Table:
        """Live-HTTP flavor (transport='real'): per-URL POST through the
        cipher-shuffled httpx session with rotating proxy headers and
        bounded retries — the path a real deployment runs; unreachable
        in this sandbox (no httpx/network), but it IS the code the
        synthetic fetch stands in for."""
        urls = batch["url"].to_pylist()
        statuses = np.empty(len(urls), dtype=np.int32)
        errors: list[str | None] = [None] * len(urls)
        bodies: list[bytes] = [b""] * len(urls)
        token = self.credentials.token("ctrip") if self.credentials else None
        for i, u in enumerate(urls):
            last_err = None
            for _attempt in range(self.max_retries + 1):   # bounded (vs the
                try:                                       # reference's unbounded
                    headers = {"X-Proxy": self.next_proxy(u)}  # recursion, T4)
                    if token:
                        headers["Cookie"] = token
                    st, body = self.transport.fetch(u, headers=headers)
                    statuses[i], bodies[i] = st, body
                    last_err = None
                    break
                except Exception as e:                     # noqa: BLE001
                    last_err = str(e)
            if last_err is not None:
                statuses[i], errors[i] = 0, last_err       # dead-letter row
        out = batch
        fetch_ts = pa.array(np.full(
            len(urls), np.datetime64(synth.CREATE_TIME_STR.replace(" ", "T"), "us")))
        elapsed = (uniform01(batch["url"].combine_chunks(), salt="elapsed")
                   * 2000 + 50).astype(np.int32)
        for name, col in (("status", pa.array(statuses)),
                          ("error", pa.array(errors, type=pa.string())),
                          ("fetch_ts", fetch_ts),
                          ("elapsed_ms", pa.array(elapsed)),
                          ("body", pa.array(bodies, type=pa.binary()))):
            out = out.append_column(name, col)
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        fetch_fn = self._fetch_live if self.transport is not None else fetch_batch
        return paced_fetch(batch, self.politeness, fetch_fn)


class AsyncFetchWorker:
    """Async-actor fetch flavor (round-4 verdict item #7): politeness
    waits are ``await``-ed on the actor's event loop instead of sleeping
    in the task thread, so a multi-second per-host delay (the
    reference's 2-4 s ``DOWNLOAD_DELAY`` budget, ``settings.py:32-38``)
    never pins a CPU slot — Ray Data runs up to 4 batches of each task
    concurrently through an async UDF (``plan_udf_map_op.py``'s
    ``DEFAULT_ASYNC_BATCH_UDF_MAX_CONCURRENCY``), so k hosts' batches
    on one actor finish in ≈ max(host wait), not Σ.  Pass a
    ``batch_size`` that splits a block into several single-host batches
    (the frontier is host-sorted after the priority shuffle, so
    positional slices ARE host runs).  The synchronous ``FetchWorker``
    remains the right flavor at rate=unlimited (the bench path) where
    there is nothing to overlap.

    Use: ``ds.map_batches(AsyncFetchWorker, fn_constructor_kwargs=
    {"politeness": client}, concurrency=N, batch_size=B,
    batch_format="pyarrow")``.
    CPU work (the fetch itself) runs serially per actor on the loop
    thread — the politeness regime is wait-dominated by construction,
    so overlap of waits, not of CPU, is what buys the wall time back.
    """

    def __init__(self, politeness=None, status_fn=None, body_fn=None):
        self.politeness = politeness
        self.status_fn = status_fn
        self.body_fn = body_fn

    async def __call__(self, batch: pa.Table) -> pa.Table:
        import asyncio

        def do_fetch(t: pa.Table) -> pa.Table:
            return fetch_batch(t, status_fn=self.status_fn,
                               body_fn=self.body_fn)

        if batch.num_rows == 0 or self.politeness is None:
            return do_fetch(batch)
        waits = await self.politeness.acquire_waits_async(batch["host"])
        plan = _pacing_plan(batch, waits)
        if plan is None:
            return do_fetch(batch)
        import time as _time
        sorted_batch, sw, bounds = plan
        t0 = _time.monotonic()
        parts = []
        for i in range(len(bounds) - 1):
            lo, hi = int(bounds[i]), int(bounds[i + 1])
            dt = sw[lo] - (_time.monotonic() - t0)
            if dt > 0:
                await asyncio.sleep(dt)     # yields the loop: other
                # in-flight batches fetch/wait during this host's delay
            parts.append(do_fetch(sorted_batch.slice(lo, hi - lo)))
        return pa.concat_tables(parts)


class DetailFetchWorker:
    """Depth-1 fetch actor (detail API, ylSpider06.py:508-514) — same
    politeness budget, same host buckets as the list-page fetch."""

    def __init__(self, politeness=None):
        self.politeness = politeness

    def __call__(self, batch: pa.Table) -> pa.Table:
        from . import detail
        if batch.num_rows and self.politeness is not None:
            self.politeness.acquire_for_batch(batch["host"])
        return detail.fetch_detail_batch(batch)
