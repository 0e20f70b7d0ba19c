"""Perceptual-hash stage: DCT correctness against a naive O(n⁴)
reference, hash stability/sensitivity bounds, and end-to-end recovery
of injected near-dup twins through the shared sig64 banding shuffle."""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

from __spider_ray.functions.hashing import hash64
from __spider_ray.pipelines.queries import (
    PHASH_DUP_DELTA,
    PHASH_DUP_MOD,
    _media_phash,
    _media_refs,
)
from __spider_ray.stages import media

SF = "/root/testdata/sf0.001"


def _naive_dct2(x: np.ndarray) -> np.ndarray:
    n = x.shape[0]
    out = np.zeros((n, n))
    for k in range(n):
        for l in range(n):
            s = 0.0
            for i in range(n):
                for j in range(n):
                    s += (x[i, j]
                          * np.cos(np.pi * (2 * i + 1) * k / (2 * n))
                          * np.cos(np.pi * (2 * j + 1) * l / (2 * n)))
            ck = np.sqrt(1 / n) if k == 0 else np.sqrt(2 / n)
            cl = np.sqrt(1 / n) if l == 0 else np.sqrt(2 / n)
            out[k, l] = ck * cl * s
    return out


def test_dct_basis_is_orthonormal_and_matches_naive():
    d = media._dct_basis(8)
    assert np.allclose(d @ d.T, np.eye(8), atol=1e-12)
    x = np.random.RandomState(0).rand(8, 8)
    assert np.allclose(d @ x @ d.T, _naive_dct2(x), atol=1e-10)


def _ham(a: int, b: int) -> int:
    return bin(a ^ b).count("1")


def test_phash_stable_and_brightness_tolerant():
    for ref in [f"pic-{i}.bmp" for i in range(20)]:
        img = media.decode_bmp(media.synth_bmp(ref))
        h0 = media.phash64(img)
        assert media.phash64(img) == h0                       # deterministic
        twin = np.clip(img.astype(np.int64) + PHASH_DUP_DELTA,
                       0, 255).astype(np.uint8)
        assert _ham(h0, media.phash64(twin)) <= 3             # banding bound


def test_phash_separates_distinct_images():
    hs = [media.phash64(media.decode_bmp(media.synth_bmp(f"p{i}.bmp")))
          for i in range(12)]
    dists = [_ham(a, b) for i, a in enumerate(hs) for b in hs[i + 1:]]
    assert np.median(dists) > 10      # random images land far apart


def test_phash_pipeline_recovers_injected_twins(ray_session):
    refs = set()
    for b in _media_refs(SF).iter_batches(batch_format="pyarrow"):
        refs.update(b["media_ref"].to_pylist())
    selected = [r for r in sorted(refs)
                if int(hashlib.md5(r.encode()).hexdigest()[:8], 16)
                % PHASH_DUP_MOD == 0]
    assert selected, "fixture regression: no twins injected at sf0.001"
    ids = hash64(pa.array(sorted(refs) + [r + "~twin" for r in selected],
                          pa.string())).astype(np.int64)
    id_of = dict(zip(sorted(refs) + [r + "~twin" for r in selected], ids))

    got = _media_phash(SF).to_pandas()
    found = {(int(a), int(b)) for a, b in zip(got["a"], got["b"])}
    assert (got["hamming"] <= 3).all()
    missing = []
    for r in selected:
        a, b = sorted((id_of[r], id_of[r + "~twin"]))
        if (a, b) not in found:
            missing.append(r)
    assert not missing, f"twin pairs not recovered: {missing[:5]}"
