import jax.numpy as jnp
import numpy as np
import pytest

from hashgan_tpu.index import PackedGallery, build_gallery
from hashgan_tpu.ops import hamming_distance_np, pack_codes_np
from hashgan_tpu.parallel import make_mesh


def _case(seed, n=100, q=7, bits=64):
    rng = np.random.default_rng(seed)
    codes_g = rng.standard_normal((n, bits)).astype(np.float32)
    codes_q = rng.standard_normal((q, bits)).astype(np.float32)
    labels = np.eye(5, dtype=np.float32)[rng.integers(0, 5, n)]
    return codes_q, codes_g, labels


def test_gallery_build_and_topk_masks_padding():
    """n=100 pads to 104+ internally; padding must never appear in top-k."""
    codes_q, codes_g, labels = _case(0)
    gal = build_gallery(jnp.asarray(codes_g), labels, 64, use_pallas=False)
    assert gal.n == 100
    pq = jnp.asarray(pack_codes_np(codes_q))
    d, i = gal.topk(pq, k=100, slab=32, use_pallas=False)
    d, i = np.asarray(d), np.asarray(i)
    assert (i < 100).all()
    d_full = hamming_distance_np(pack_codes_np(codes_q), pack_codes_np(codes_g))
    for qi in range(codes_q.shape[0]):
        order = np.argsort(d_full[qi], kind="stable")
        np.testing.assert_array_equal(i[qi], order[:100])


@pytest.mark.parametrize("n_dev", [2, 8])
def test_gallery_sharded_topk_with_padding(n_dev):
    """Odd N on a mesh: padding lands in the last shard and must be masked
    before local selection (regression: padding zero-words could win)."""
    codes_q, codes_g, labels = _case(1, n=101)
    # plant a zero-code query: distance to zero-padding words would be 0
    codes_q[0] = -1.0
    mesh = make_mesh(n_dev)
    gal = build_gallery(jnp.asarray(codes_g), labels, 64, mesh=mesh,
                        use_pallas=False)
    pq = jnp.asarray(pack_codes_np(codes_q))
    d, i = gal.topk(pq, k=50, slab=16, use_pallas=False)
    i = np.asarray(i)
    assert (i < 101).all()
    d_full = hamming_distance_np(pack_codes_np(codes_q), pack_codes_np(codes_g))
    for qi in range(codes_q.shape[0]):
        order = np.argsort(d_full[qi], kind="stable")[:50]
        np.testing.assert_array_equal(i[qi], order)


def test_gallery_save_load_roundtrip(tmp_path):
    codes_q, codes_g, labels = _case(2, n=33)
    gal = build_gallery(jnp.asarray(codes_g), labels, 64, use_pallas=False)
    p = str(tmp_path / "gallery.npz")
    gal.save(p)
    gal2 = PackedGallery.load(p)
    assert gal2.n == 33 and gal2.bits == 64
    np.testing.assert_array_equal(
        np.asarray(gal2.gallery_t), np.asarray(gal.gallery_t)
    )
    np.testing.assert_array_equal(gal2.labels, labels)


def test_gallery_extend_and_remove_stay_exact():
    """Incremental index maintenance: extend appends with stable existing
    ids; remove reassigns contiguous ids and returns the id map — both
    rebuild layouts so rankings stay oracle-exact."""
    import jax.numpy as jnp
    import numpy as np

    from hashgan_tpu.index import build_gallery
    from hashgan_tpu.ops import hamming_distance_np, pack_codes_np

    rng = np.random.default_rng(0)
    bits, k = 32, 20
    c1 = rng.standard_normal((300, bits)).astype(np.float32)
    c2 = rng.standard_normal((150, bits)).astype(np.float32)
    lab = lambda n: np.eye(2, dtype=np.float32)[np.zeros(n, int)]  # noqa: E731
    gal = build_gallery(jnp.asarray(c1), lab(300), bits, use_pallas=False)
    gal2 = gal.extend(jnp.asarray(c2), lab(150), use_pallas=False)
    assert gal2.n == 450

    q = rng.standard_normal((5, bits)).astype(np.float32)
    pq = jnp.asarray(pack_codes_np(q))
    d, i = gal2.topk(pq, k=k, use_pallas=False)
    all_packed = np.concatenate([pack_codes_np(c1), pack_codes_np(c2)])
    d_full = hamming_distance_np(np.asarray(pq), all_packed)
    for qi in range(5):
        order = np.argsort(d_full[qi], kind="stable")[:k]
        np.testing.assert_array_equal(np.asarray(i)[qi], order)

    gal3, keep = gal2.remove(np.arange(0, 450, 3))  # drop every 3rd
    assert gal3.n == 300 and keep.shape == (300,)
    d, i = gal3.topk(pq, k=k, use_pallas=False)
    d_kept = d_full[:, keep]
    for qi in range(5):
        order = np.argsort(d_kept[qi], kind="stable")[:k]
        np.testing.assert_array_equal(np.asarray(i)[qi], order)
        # id map translates back to original ids
        assert set(keep[np.asarray(i)[qi]]) <= set(keep.tolist())


def test_gallery_topk_large_k_routes_to_sort_engine():
    """k > 256 without Pallas stays exact on the streaming sort engine
    (the TPU route is the subgroup-min engine — see test_mxu_large_k.py's
    gallery routing tests)."""
    import jax.numpy as jnp
    import numpy as np

    from hashgan_tpu.index import build_gallery
    from hashgan_tpu.ops import hamming_distance_np, pack_codes_np

    rng = np.random.default_rng(4)
    n, bits, k = 2000, 32, 400
    codes = rng.standard_normal((n, bits)).astype(np.float32)
    labels = np.eye(2, dtype=np.float32)[np.zeros(n, int)]
    gal = build_gallery(jnp.asarray(codes), labels, bits, use_pallas=False)
    pq = jnp.asarray(pack_codes_np(rng.standard_normal((3, bits)).astype(np.float32)))
    # use_pallas=True + interpret-free: the sort engine path uses the
    # pallas-or-jnp scan; on CPU force jnp by use_pallas=False for speed,
    # and separately check the pallas route would not pick mxu via shapes
    d, i = gal.topk(pq, k=k, use_pallas=False)
    assert i.shape == (3, k)
    d_full = hamming_distance_np(np.asarray(pq), pack_codes_np(codes))
    for qi in range(3):
        order = np.argsort(d_full[qi], kind="stable")[:k]
        np.testing.assert_array_equal(np.asarray(i)[qi], order)


def test_gallery_topk_large_k_sharded_stays_exact():
    """k > 256 on a mesh gallery without Pallas routes to the sharded sort
    merge; ranking must stay bit-identical to the oracle across mesh
    sizes (the TPU route is the sharded subgroup-min engine)."""
    import jax.numpy as jnp
    import numpy as np

    from hashgan_tpu.index import build_gallery
    from hashgan_tpu.ops import hamming_distance_np, pack_codes_np
    from hashgan_tpu.parallel import make_mesh

    rng = np.random.default_rng(11)
    n, bits, k = 3000, 32, 320
    codes = rng.standard_normal((n, bits)).astype(np.float32)
    labels = np.eye(2, dtype=np.float32)[np.zeros(n, int)]
    pq_np = pack_codes_np(rng.standard_normal((4, bits)).astype(np.float32))
    d_full = hamming_distance_np(pq_np, pack_codes_np(codes))
    for n_dev in (2, 8):
        mesh = make_mesh(n_dev)
        gal = build_gallery(jnp.asarray(codes), labels, bits, mesh=mesh,
                            use_pallas=False)
        d, i = gal.topk(jnp.asarray(pq_np), k=k, use_pallas=False)
        for qi in range(4):
            order = np.argsort(d_full[qi], kind="stable")[:k]
            np.testing.assert_array_equal(np.asarray(i)[qi], order)
