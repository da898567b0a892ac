"""Adversarial grouping must trigger the repair-overflow fallback and the
gallery-level recompute must restore exactness."""

import jax.numpy as jnp
import numpy as np

from hashgan_tpu.index import build_gallery
from hashgan_tpu.ops import hamming_distance_np, pack_codes_np
from hashgan_tpu.ops.groupmin import groupmin_topk
from hashgan_tpu.ops.hamming import hamming_scan_topk


def test_repair_overflow_flags_and_fallback_merge_is_exact():
    rng = np.random.default_rng(0)
    n, bits = 4096, 32
    codes = rng.standard_normal((n, bits)).astype(np.float32)
    q = np.zeros((3, bits), dtype=np.float32)
    # Plant 40 duplicate pairs in the same grouped-layout columns
    # (indices j and j+256 share a column at L=128, cm=256).
    for j in range(40):
        codes[j] = 0.1
        codes[256 + j] = codes[j]
    labels = np.eye(2, dtype=np.float32)[np.zeros(n, int)]
    gal = build_gallery(jnp.asarray(codes), labels, bits, use_pallas=False)

    pq = jnp.asarray(pack_codes_np(q))
    d, i, fb = groupmin_topk(
        pq, gal.gallery_grouped, gal.packed_canonical,
        valid_n=gal.n, k=60, repair=4, interpret=True,
    )
    fb_host = np.asarray(fb)
    assert fb_host.all()  # 40 suspicious groups >> repair capacity 4

    # The gallery-level fallback recompute (sort engine + boolean .at merge)
    d_fix, i_fix = hamming_scan_topk(
        pq[jnp.asarray(fb_host)], gal.gallery_t, k=60, slab=512,
        valid_n=gal.n, use_pallas=False,
    )
    d2 = jnp.asarray(np.asarray(d)).at[jnp.asarray(fb_host)].set(d_fix)
    i2 = jnp.asarray(np.asarray(i)).at[jnp.asarray(fb_host)].set(i_fix)
    dfull = hamming_distance_np(pack_codes_np(q), pack_codes_np(codes))
    for qi in range(3):
        order = np.argsort(dfull[qi], kind="stable")[:60]
        np.testing.assert_array_equal(np.asarray(i2)[qi], order)
