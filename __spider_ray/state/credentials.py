"""S11/J3 — credential (cookie/token) refresher actor.

The reference harvests cookies out-of-band with mitmproxy into Redis
with a 1 h TTL (``get_ctrip_cookie.py:40-67``) and HARD-EXITS the whole
shard when the cookie is missing (``spiders/ctripSpider.py:226-228``).
Here credentials live in a singleton Ray actor: fetch workers request a
token per (platform, batch); an expired token is refreshed in place
(synthetically — a deterministic function of the refresh epoch) and the
job never dies.  At cluster scale this is the single out-of-band
coordination point for session state, exactly like the reference's
Redis hash, minus the external store.
"""

from __future__ import annotations

import time

import ray

from ..functions.hashing import md5_u64


@ray.remote(num_cpus=0.1)
class CredentialActor:
    def __init__(self, ttl_s: float = 3600.0):
        self.ttl_s = ttl_s
        self.tokens: dict[str, tuple[str, float]] = {}   # platform → (token, born)
        self.refreshes: dict[str, int] = {}              # platform → ordinal

    def _mint(self, platform: str) -> str:
        # deterministic "harvest": f(platform, PER-PLATFORM refresh
        # ordinal) — the stand-in for the mitmproxy capture
        # (get_ctrip_cookie.py:40-67).  A shared counter would make the
        # token depend on cross-platform call interleaving, breaking
        # replay determinism.
        n = self.refreshes.get(platform, 0) + 1
        self.refreshes[platform] = n
        return f"{platform}-token-{md5_u64(f'{platform}:{n}', 0, 1 << 30):08x}"

    def get_token(self, platform: str) -> str:
        now = time.monotonic()
        cur = self.tokens.get(platform)
        if cur is None or now - cur[1] > self.ttl_s:
            cur = (self._mint(platform), now)
            self.tokens[platform] = cur
        return cur[0]

    def invalidate(self, platform: str) -> None:
        """Called by a fetch worker on an auth failure — next get_token
        refreshes (the reference instead sys.exit()s the shard)."""
        self.tokens.pop(platform, None)

    def stats(self) -> dict:
        return {"platforms": len(self.tokens),
                "refreshes": sum(self.refreshes.values())}


class CredentialClient:
    """Serializable handle; one call per (platform, batch)."""

    def __init__(self, ttl_s: float = 3600.0):
        self.actor = CredentialActor.remote(ttl_s)

    def token(self, platform: str) -> str:
        return ray.get(self.actor.get_token.remote(platform))

    def invalidate(self, platform: str) -> None:
        ray.get(self.actor.invalidate.remote(platform))
