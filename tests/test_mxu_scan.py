"""MXU matmul-distance engine: oracle-bit-identical ranking, padding
sentinels, adversarial ties, unpack round-trip (ops/mxu_scan.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hashgan_tpu.ops import hamming_distance_np, pack_codes_np
from hashgan_tpu.ops.groupmin import to_grouped_layout
from hashgan_tpu.ops.mxu_scan import (
    mxu_topk,
    to_group_major,
    unpack_to_pm1,
)


def _build(codes_pm1, groups=8, col_multiple=16):
    packed = pack_codes_np(codes_pm1)
    gg = to_grouped_layout(packed, groups=groups, col_multiple=col_multiple)
    bg = to_group_major(packed, groups=groups, col_multiple=col_multiple)
    c, L, w = bg.shape
    return packed, jnp.asarray(gg), jnp.asarray(bg.reshape(c, L * w))


def test_unpack_round_trips_pack():
    rng = np.random.default_rng(0)
    codes = np.where(rng.uniform(size=(13, 64)) < 0.5, -1.0, 1.0).astype(np.float32)
    packed = jnp.asarray(pack_codes_np(codes))
    pm1 = np.asarray(unpack_to_pm1(packed), dtype=np.float32)
    np.testing.assert_array_equal(pm1, codes)


def test_group_major_layout_matches_grouped():
    rng = np.random.default_rng(1)
    packed = rng.integers(0, 2**32, (100, 2), dtype=np.uint32)
    gg = to_grouped_layout(packed, groups=8, col_multiple=16)   # (W, L, C)
    bg = to_group_major(packed, groups=8, col_multiple=16)      # (C, L, W)
    np.testing.assert_array_equal(gg.transpose(2, 1, 0), bg)


@pytest.mark.parametrize("bits,n,q,k", [(32, 700, 9, 20), (64, 1200, 5, 64)])
def test_mxu_topk_matches_oracle(bits, n, q, k):
    rng = np.random.default_rng(bits + n)
    codes = np.where(rng.uniform(size=(n, bits)) < 0.5, -1.0, 1.0).astype(np.float32)
    queries = np.where(rng.uniform(size=(q, bits)) < 0.5, -1.0, 1.0).astype(np.float32)
    packed, gg, bgf = _build(codes)
    pq = jnp.asarray(pack_codes_np(queries))
    d, i = mxu_topk(pq, gg, bgf, valid_n=n, k=k,
                    query_tile=16, col_block=16, interpret=True)
    d, i = np.asarray(d), np.asarray(i)
    d_full = hamming_distance_np(pack_codes_np(queries), packed)
    for qi in range(q):
        order = np.argsort(d_full[qi], kind="stable")[:k]
        np.testing.assert_array_equal(i[qi], order)
        np.testing.assert_array_equal(d[qi], d_full[qi][order])


def test_mxu_topk_adversarial_ties_exact():
    """Everything nearly tied — the regime that cliffed the min2 engine."""
    rng = np.random.default_rng(7)
    n, bits, k = 2048, 32, 100
    codes = np.where(rng.uniform(size=(n, bits)) < 0.03, -1.0, 1.0).astype(np.float32)
    packed, gg, bgf = _build(codes, groups=16, col_multiple=16)
    pq = jnp.asarray(pack_codes_np(np.ones((4, bits), dtype=np.float32)))
    d, i = mxu_topk(pq, gg, bgf, valid_n=n, k=k,
                    query_tile=8, col_block=16, interpret=True)
    d_full = hamming_distance_np(np.asarray(pq), packed)
    for qi in range(4):
        order = np.argsort(d_full[qi], kind="stable")[:k]
        np.testing.assert_array_equal(np.asarray(i)[qi], order)


def test_mxu_topk_padding_sentinels():
    rng = np.random.default_rng(3)
    n, bits, k = 37, 32, 64  # far fewer valid items than k
    codes = np.where(rng.uniform(size=(n, bits)) < 0.5, -1.0, 1.0).astype(np.float32)
    packed, gg, bgf = _build(codes)
    pq = jnp.asarray(pack_codes_np(
        np.where(rng.uniform(size=(3, bits)) < 0.5, -1.0, 1.0).astype(np.float32)))
    d, i = mxu_topk(pq, gg, bgf, valid_n=n, k=k,
                    query_tile=8, col_block=16, interpret=True)
    d, i = np.asarray(d), np.asarray(i)
    real = i < n
    assert (d[real] <= bits).all()
    assert (d[~real] > bits).all()
    for qi in range(3):
        ids = i[qi][real[qi]]
        assert len(ids) == n and len(set(ids.tolist())) == n
    # and the real prefix is oracle-exact
    d_full = hamming_distance_np(np.asarray(pq), packed)
    for qi in range(3):
        order = np.argsort(d_full[qi], kind="stable")
        np.testing.assert_array_equal(i[qi][:n], order)


import pytest as _pytest


@_pytest.mark.parametrize("n_dev", [1, 2, 8])
def test_sharded_mxu_matches_single_chip(n_dev):
    from hashgan_tpu.parallel import make_mesh
    from hashgan_tpu.parallel.sharded_scan import (
        shard_grouped_gallery, sharded_mxu_topk,
    )

    mesh = make_mesh(n_dev)
    rng = np.random.default_rng(n_dev + 40)
    n, bits, k = 700, 32, 60
    codes = np.where(rng.uniform(size=(n, bits)) < 0.3, -1.0, 1.0).astype(np.float32)
    packed = pack_codes_np(codes)
    pq = jnp.asarray(pack_codes_np(
        np.where(rng.uniform(size=(7, bits)) < 0.5, -1.0, 1.0).astype(np.float32)))
    grouped, canon, valids, canon_bg, _ = shard_grouped_gallery(
        mesh, packed, groups=8, col_multiple=16
    )
    d, i = sharded_mxu_topk(
        mesh, pq, grouped, canon_bg, valids, n=n, k=k,
        query_tile=8, col_block=16, interpret=True,
    )
    d, i = np.asarray(d), np.asarray(i)
    d_full = hamming_distance_np(np.asarray(pq), packed)
    for qi in range(7):
        order = np.argsort(d_full[qi], kind="stable")[:k]
        np.testing.assert_array_equal(i[qi], order)
        np.testing.assert_array_equal(d[qi], d_full[qi][order])


def test_mxu_approx_mode_recall():
    """Approx mode (group minima + ApproxTopK, no rescan) keeps high recall
    of the true top-k and honors the padding contract."""
    rng = np.random.default_rng(11)
    n, bits, k = 4096, 64, 50
    codes = np.where(rng.uniform(size=(n, bits)) < 0.5, -1.0, 1.0).astype(np.float32)
    # groups=8 -> C=512 columns: expected group collisions ~ k^2/(2C) ~ 2.4
    # of 50, so mean recall should sit near 0.95 (production L=128/C=8192
    # collides ~15x less)
    packed, gg, bgf = _build(codes, groups=8, col_multiple=32)
    pq = jnp.asarray(pack_codes_np(
        np.where(rng.uniform(size=(8, bits)) < 0.5, -1.0, 1.0).astype(np.float32)))
    d, i = mxu_topk(pq, gg, bgf, valid_n=n, k=k, mode="approx",
                    query_tile=8, col_block=32, interpret=True,
                    recall_target=0.99)
    d, i = np.asarray(d), np.asarray(i)
    d_full = hamming_distance_np(np.asarray(pq), packed)
    recalls = []
    for qi in range(8):
        true = set(np.argsort(d_full[qi], kind="stable")[:k].tolist())
        got = set(i[qi][i[qi] < n].tolist())
        # distances of returned ids must be correct
        for pos, idx in enumerate(i[qi]):
            if idx < n:
                assert d[qi][pos] == d_full[qi][idx]
        recalls.append(len(true & got) / k)
    assert np.mean(recalls) > 0.9, recalls


@_pytest.mark.parametrize("seed,tie_p", [(0, 0.5), (1, 0.05)])
def test_mxu_topk_two_level_selection_path(seed, tie_p):
    """Galleries with >= 1024 columns route the prelim through the two-level
    winner selection (_select_winner_columns); must stay oracle-exact,
    including under heavy ties (tie_p=0.05 makes most codes collide)."""
    rng = np.random.default_rng(seed)
    n, bits, k = 8192, 32, 100  # groups=8, cm=128 -> C=1024 columns
    codes = np.where(rng.uniform(size=(n, bits)) < tie_p, -1.0, 1.0).astype(np.float32)
    packed, gg, bgf = _build(codes, groups=8, col_multiple=128)
    assert gg.shape[2] >= 1024
    pq = jnp.asarray(pack_codes_np(
        np.where(rng.uniform(size=(4, bits)) < 0.5, -1.0, 1.0).astype(np.float32)))
    d, i = mxu_topk(pq, gg, bgf, valid_n=n, k=k,
                    query_tile=8, col_block=128, interpret=True)
    d, i = np.asarray(d), np.asarray(i)
    d_full = hamming_distance_np(np.asarray(pq), packed)
    for qi in range(4):
        order = np.argsort(d_full[qi], kind="stable")[:k]
        np.testing.assert_array_equal(i[qi], order)
        np.testing.assert_array_equal(d[qi], d_full[qi][order])


def test_twolevel_topk_min_matches_direct_topk():
    """The two-level min selection must equal direct top_k on DISTINCT keys
    (its contract), for widths on and off the fallback path."""
    from hashgan_tpu.ops.mxu_scan import _twolevel_topk_min

    rng = np.random.default_rng(3)
    for m in (256, 2048, 12800):
        perm = np.stack([rng.permutation(10 * m)[:m] for _ in range(6)])
        keys = jnp.asarray(perm.astype(np.int32))
        vals, pos = _twolevel_topk_min(keys, 100)
        negv, ref_pos = jax.lax.top_k(-keys, 100)
        np.testing.assert_array_equal(np.asarray(vals), np.asarray(-negv))
        np.testing.assert_array_equal(np.asarray(pos), np.asarray(ref_pos))


def test_full_column_keys_reconstruction():
    """Full composite column keys must equal the true min item key per
    column: d*stride + global index, with padding columns -> INT32_MAX."""
    from hashgan_tpu.ops.groupmin import INT32_MAX
    from hashgan_tpu.ops.mxu_scan import (
        PAD_PENALTY, _full_column_keys, build_key_base,
    )

    L, c, bits = 8, 16, 32
    rng = np.random.default_rng(5)
    valid_n = 100  # indices 100..127 are padding
    d = rng.integers(0, bits + 1, (L, c)).astype(np.float32)
    # emulate the kernel: key = base + d*L where base folds s + pad penalty
    base = np.asarray(build_key_base(L, c, bits, valid_n))
    # kernel key = base - dot*L/2 = (bits*L/2 + s [+pen]) - (bits/2 - d)*L
    keys = base + (d - bits / 2.0) * L
    min1 = jnp.asarray(keys.min(axis=0)[None, :])
    stride = L * c + 1
    full = np.asarray(_full_column_keys(min1, L, c, stride))[0]
    idx = np.arange(L)[:, None] * c + np.arange(c)[None, :]
    item_keys = np.where(idx < valid_n,
                         d.astype(np.int64) * stride + idx, INT32_MAX)
    expect = item_keys.min(axis=0)
    # a column whose min1 carries the pad penalty is all-padding
    pad_col = keys.min(axis=0) >= PAD_PENALTY
    expect = np.where(pad_col, INT32_MAX, expect)
    np.testing.assert_array_equal(full, expect.astype(np.int32))


def test_grouped_to_pm8_matches_unpack():
    from hashgan_tpu.ops.mxu_scan import grouped_to_pm8

    rng = np.random.default_rng(7)
    packed = rng.integers(0, 2**32, (100, 2), dtype=np.uint32)
    gg = to_grouped_layout(packed, groups=8, col_multiple=16)  # (W, L, C)
    pm8 = np.asarray(grouped_to_pm8(jnp.asarray(gg), col_block=16))
    w, L, c = gg.shape
    # reference unpack: bit b of item at [s, col] = ((gg[b//32,s,col] >> (b%32)) & 1)
    bits = np.zeros((32 * w, L, c), np.int8)
    for b in range(32 * w):
        bits[b] = ((gg[b // 32] >> (b % 32)) & 1).astype(np.int8)
    ref = (bits * 2 - 1).reshape(32 * w, L, c // 16, 16).transpose(0, 2, 1, 3)
    np.testing.assert_array_equal(pm8, ref)


@pytest.mark.parametrize("bits,n,q,k", [(32, 700, 9, 20), (64, 1200, 5, 64)])
def test_mxu8_topk_matches_oracle(bits, n, q, k):
    """int8 precomputed-gallery scan: same oracle-bit-identical contract."""
    from hashgan_tpu.ops.mxu_scan import grouped_to_pm8

    rng = np.random.default_rng(bits * 3 + n)
    codes = np.where(rng.uniform(size=(n, bits)) < 0.5, -1.0, 1.0).astype(np.float32)
    queries = np.where(rng.uniform(size=(q, bits)) < 0.5, -1.0, 1.0).astype(np.float32)
    packed, gg, bgf = _build(codes)
    pm8 = grouped_to_pm8(gg, col_block=16)
    pq = jnp.asarray(pack_codes_np(queries))
    d, i = mxu_topk(pq, gg, bgf, valid_n=n, k=k,
                    query_tile=16, interpret=True, gallery_pm8=pm8)
    d, i = np.asarray(d), np.asarray(i)
    d_full = hamming_distance_np(pack_codes_np(queries), packed)
    for qi in range(q):
        order = np.argsort(d_full[qi], kind="stable")[:k]
        np.testing.assert_array_equal(i[qi], order)
        np.testing.assert_array_equal(d[qi], d_full[qi][order])


def test_mxu8_topk_ties_and_approx():
    from hashgan_tpu.ops.mxu_scan import grouped_to_pm8

    rng = np.random.default_rng(9)
    n, bits, k = 600, 32, 50
    codes = np.where(rng.uniform(size=(n, bits)) < 0.05, -1.0, 1.0).astype(np.float32)
    packed, gg, bgf = _build(codes)
    pm8 = grouped_to_pm8(gg, col_block=16)
    pq = jnp.asarray(pack_codes_np(
        np.where(rng.uniform(size=(4, bits)) < 0.5, -1.0, 1.0).astype(np.float32)))
    d, i = mxu_topk(pq, gg, bgf, valid_n=n, k=k, query_tile=16,
                    interpret=True, gallery_pm8=pm8)
    d_full = hamming_distance_np(np.asarray(pq), packed)
    for qi in range(4):
        order = np.argsort(d_full[qi], kind="stable")[:k]
        np.testing.assert_array_equal(np.asarray(i)[qi], order)
    # approx mode runs off the int32 scan too (f32 cast is exact)
    da, ia = mxu_topk(pq, gg, bgf, valid_n=n, k=k, query_tile=16,
                      interpret=True, mode="approx", gallery_pm8=pm8)
    assert da.shape == (4, k) and ia.shape == (4, k)


@_pytest.mark.parametrize("n_dev", [2, 8])
def test_sharded_mxu_int8_matches_single_chip(n_dev):
    from hashgan_tpu.parallel import make_mesh
    from hashgan_tpu.parallel.sharded_scan import (
        shard_grouped_gallery, shard_pm8_gallery, sharded_mxu_topk,
    )

    mesh = make_mesh(n_dev)
    rng = np.random.default_rng(n_dev + 77)
    n, bits, k = 700, 32, 60
    codes = np.where(rng.uniform(size=(n, bits)) < 0.3, -1.0, 1.0).astype(np.float32)
    packed = pack_codes_np(codes)
    pq = jnp.asarray(pack_codes_np(
        np.where(rng.uniform(size=(5, bits)) < 0.5, -1.0, 1.0).astype(np.float32)))
    grouped, canon, valids, canon_bg, _ = shard_grouped_gallery(
        mesh, packed, groups=8, col_multiple=16
    )
    pm8 = shard_pm8_gallery(mesh, grouped, col_block=16)
    d, i = sharded_mxu_topk(
        mesh, pq, grouped, canon_bg, valids, n=n, k=k,
        query_tile=8, interpret=True, gallery_pm8=pm8,
    )
    d, i = np.asarray(d), np.asarray(i)
    d_full = hamming_distance_np(np.asarray(pq), packed)
    for qi in range(5):
        order = np.argsort(d_full[qi], kind="stable")[:k]
        np.testing.assert_array_equal(i[qi], order)
        np.testing.assert_array_equal(d[qi], d_full[qi][order])


@_pytest.mark.parametrize("m,kk", [(96, 100), (256, 256), (1600, 7),
                                   (4096, 100), (520, 33)])
def test_twolevel_topk_min_property(m, kk):
    """Widths on/off the g-divisibility and fallback boundaries, kk near,
    equal to, and above the subgroup count — always equals direct top_k on
    distinct keys."""
    from hashgan_tpu.ops.mxu_scan import _twolevel_topk_min

    rng = np.random.default_rng(m * 7 + kk)
    kk_eff = min(kk, m)
    keys = jnp.asarray(np.stack(
        [rng.permutation(3 * m)[:m] for _ in range(4)]).astype(np.int32))
    vals, pos = _twolevel_topk_min(keys, kk_eff)
    negv, ref_pos = jax.lax.top_k(-keys, kk_eff)
    np.testing.assert_array_equal(np.asarray(vals), np.asarray(-negv))
    np.testing.assert_array_equal(np.asarray(pos), np.asarray(ref_pos))


def test_twolevel_topk_min_with_sentinel_dups():
    """INT32_MAX padding duplicates may tie arbitrarily among themselves,
    but every finite key in the true top-k must be selected, in order."""
    from hashgan_tpu.ops.groupmin import INT32_MAX
    from hashgan_tpu.ops.mxu_scan import _twolevel_topk_min

    rng = np.random.default_rng(3)
    m, kk, n_valid = 1024, 64, 40  # fewer valid than kk
    keys = np.full((2, m), INT32_MAX, np.int32)
    for r in range(2):
        pos = rng.choice(m, n_valid, replace=False)
        keys[r, pos] = rng.permutation(10_000)[:n_valid]
    vals, _ = _twolevel_topk_min(jnp.asarray(keys), kk)
    vals = np.asarray(vals)
    for r in range(2):
        finite = np.sort(keys[r][keys[r] != INT32_MAX])
        np.testing.assert_array_equal(vals[r][:n_valid], finite)
        assert (vals[r][n_valid:] == INT32_MAX).all()


def test_fullkey_scan_matches_groupmin_scan_plus_decode():
    """Round-4 kernel epilogue (mxu_fullkey_scan): the in-kernel int32 full
    composite keys and subgroup minima must equal the legacy two-step
    construction (mxu_groupmin_scan -> _full_column_keys) bit-for-bit."""
    from hashgan_tpu.ops.mxu_scan import (
        _full_column_keys,
        build_key_base,
        mxu_fullkey_scan,
        mxu_groupmin_scan,
        unpack_to_pm1,
    )

    rng = np.random.default_rng(11)
    bits, n, q = 64, 700, 12
    codes = np.where(rng.uniform(size=(n, bits)) < 0.5, -1, 1).astype(np.float32)
    packed = pack_codes_np(codes)
    grouped = to_grouped_layout(packed, groups=8, col_multiple=16)
    w, L, c = grouped.shape
    stride = L * c + 1
    pq = jnp.asarray(pack_codes_np(
        np.where(rng.uniform(size=(q, bits)) < 0.5, -1, 1).astype(np.float32)))
    q_pm1 = unpack_to_pm1(pq)
    kb = build_key_base(L, c, bits, n)
    for valid_n in (n, L * c):  # with and without padding columns
        kbv = build_key_base(L, c, bits, valid_n)
        min1 = mxu_groupmin_scan(q_pm1, jnp.asarray(grouped), kbv,
                                 query_tile=8, col_block=16, interpret=True)
        want_full = np.asarray(_full_column_keys(min1, L, c, stride))
        full, sub = mxu_fullkey_scan(
            q_pm1, jnp.asarray(grouped), kbv, stride=stride, c_total=c,
            query_tile=8, col_block=16, sub_g=4, interpret=True)
        np.testing.assert_array_equal(np.asarray(full), want_full)
        np.testing.assert_array_equal(
            np.asarray(sub),
            want_full.reshape(q, c // 4, 4).min(axis=2))


@pytest.mark.parametrize("bits,n,q,k", [(32, 700, 9, 20), (64, 1200, 5, 64)])
def test_mxu_topk_lane_layout_matches_oracle(bits, n, q, k):
    """layout="lane" (group axis minor, round 4): bit-identical to the
    oracle and therefore to the default sublane layout."""
    rng = np.random.default_rng(bits * 3 + n)
    codes = np.where(rng.uniform(size=(n, bits)) < 0.5, -1.0, 1.0).astype(
        np.float32)
    queries = np.where(rng.uniform(size=(q, bits)) < 0.5, -1.0, 1.0).astype(
        np.float32)
    packed, gg, bgf = _build(codes)
    pq = jnp.asarray(pack_codes_np(queries))
    d, i = mxu_topk(pq, gg, bgf, valid_n=n, k=k,
                    query_tile=16, col_block=16, interpret=True,
                    scan_layout="lane")
    d, i = np.asarray(d), np.asarray(i)
    d_full = hamming_distance_np(pack_codes_np(queries), packed)
    for qi in range(q):
        order = np.argsort(d_full[qi], kind="stable")[:k]
        np.testing.assert_array_equal(i[qi], order)
        np.testing.assert_array_equal(d[qi], d_full[qi][order])


def test_fullkey_scan_lane_layout_ties_and_padding():
    """Lane layout under adversarial ties + layout padding: identical full
    keys and subgroup minima to the sublane layout."""
    from hashgan_tpu.ops.mxu_scan import (
        build_key_base, build_key_base_t, mxu_fullkey_scan)

    rng = np.random.default_rng(7)
    n, bits, q = 500, 32, 6                    # padding: 500 < 8*16*4 slots
    base = np.where(rng.uniform(size=bits) < 0.5, -1.0, 1.0)
    codes = np.tile(base, (n, 1)).astype(np.float32)
    flip = rng.integers(0, bits, size=n)
    codes[np.arange(n), flip] *= -1            # near-total ties
    queries = np.tile(base, (q, 1)).astype(np.float32)
    packed, gg, _ = _build(codes)
    pq = jnp.asarray(pack_codes_np(queries))
    w, L, c = gg.shape
    stride = L * c + 1
    full_a, sub_a = mxu_fullkey_scan(
        unpack_to_pm1(pq), gg, build_key_base(L, c, bits, n),
        stride=stride, c_total=c, query_tile=8, col_block=16, sub_g=8,
        interpret=True)
    full_b, sub_b = mxu_fullkey_scan(
        unpack_to_pm1(pq), gg, build_key_base_t(L, c, bits, n),
        stride=stride, c_total=c, query_tile=8, col_block=16, sub_g=8,
        interpret=True, layout="lane")
    np.testing.assert_array_equal(np.asarray(full_a), np.asarray(full_b))
    np.testing.assert_array_equal(np.asarray(sub_a), np.asarray(sub_b))
