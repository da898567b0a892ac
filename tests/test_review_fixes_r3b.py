"""Round-3 self-review fix coverage: slab capacity vs the large-k key
bound, sharded-scan cache keying/bounding, serving-surface input
validation, deep-k routing, and pair-sampling edge cases."""

import json
import threading
import urllib.error
import urllib.request

import jax.numpy as jnp
import numpy as np
import pytest

from hashgan_tpu.ops import hamming_distance_np


# ----------------------------------------------------------------------------
# Default slab capacity must satisfy BOTH slab engines' key bounds —
# mxu_topk's (bits+1)*(n+1)+n and mxu_topk_large's (bits+2)*(n+1)+n —
# since mxu_topk_slabbed routes k>256 / approx slabs to the large engine.
# ----------------------------------------------------------------------------

@pytest.mark.parametrize("words", [1, 2, 4])
def test_default_slab_capacity_fits_large_k_key_bound(words):
    from hashgan_tpu.ops.slab_scan import mxu_slab_capacity

    cap = mxu_slab_capacity(words)
    bits = 32 * words
    stride = cap + 1
    assert (bits + 1) * stride + cap < 2**31  # mxu_topk's bound
    assert (bits + 2) * stride + cap < 2**31  # mxu_topk_large's bound
    assert cap % (128 * 256) == 0


def test_slabbed_large_k_exact_vs_oracle():
    """k>256 through the slabbed route (small slabs): the per-slab large-k
    engine + top_k merge must stay oracle-bit-exact."""
    from hashgan_tpu.ops.slab_scan import build_slabbed_layout, mxu_topk_slabbed

    rng = np.random.default_rng(7)
    n, w, k = 5000, 1, 300
    packed = rng.integers(0, 2**32, size=(n, w), dtype=np.uint32)
    q = rng.integers(0, 2**32, size=(4, w), dtype=np.uint32)
    gs, bgs, valids, slab_items = build_slabbed_layout(
        packed, groups=8, col_multiple=16, slab_items=2048
    )
    d, i = mxu_topk_slabbed(
        jnp.asarray(q), gs, bgs, valids, n=n, slab_items=slab_items, k=k,
        interpret=True,
    )
    d, i = np.asarray(d), np.asarray(i)
    d_full = hamming_distance_np(q, packed)
    for qi in range(q.shape[0]):
        order = np.argsort(d_full[qi], kind="stable")[:k]
        np.testing.assert_array_equal(i[qi], order)
        np.testing.assert_array_equal(d[qi], d_full[qi][order])


# ----------------------------------------------------------------------------
# Sharded sort-merge cache key must include the query word width: a 128-bit
# entry reused for a 48-bit gallery would mis-handle sentinels via its
# stale max_d closure.
# ----------------------------------------------------------------------------

def test_sharded_hamming_cache_keyed_by_width():
    from hashgan_tpu.parallel import make_mesh, sharded_hamming_topk

    mesh = make_mesh(2)
    rng = np.random.default_rng(3)
    n, k = 64, 60
    for w, valid in ((4, 40), (1, 40)):  # wide first: stale max_d=128 trap
        g = rng.integers(0, 2**32, size=(n, w), dtype=np.uint32)
        q = rng.integers(0, 2**32, size=(3, w), dtype=np.uint32)
        d, i = sharded_hamming_topk(
            mesh, jnp.asarray(q), jnp.asarray(g.T), k=k, slab=32,
            use_pallas=False, valid_n=valid,
        )
        d, i = np.asarray(d), np.asarray(i)
        bits = 32 * w
        d_full = hamming_distance_np(q, g[:valid])
        for qi in range(q.shape[0]):
            order = np.argsort(d_full[qi], kind="stable")[:valid]
            np.testing.assert_array_equal(i[qi, :valid], order)
            # padding slots obey the sentinel contract for THIS width
            assert (i[qi, valid:] == n).all()
            assert (d[qi, valid:] == bits + 1).all()


def test_shard_fn_cache_is_lru_bounded():
    from hashgan_tpu.parallel import make_mesh, sharded_hamming_topk
    from hashgan_tpu.parallel import sharded_scan as ss

    mesh = make_mesh(1)
    rng = np.random.default_rng(0)
    g = rng.integers(0, 2**32, size=(32, 1), dtype=np.uint32)
    q = rng.integers(0, 2**32, size=(2, 1), dtype=np.uint32)
    old_max = ss._SHARD_FN_CACHE_MAX
    ss._SHARD_FN_CACHE.clear()
    try:
        ss._SHARD_FN_CACHE_MAX = 2
        for k in (3, 4, 5, 6):
            sharded_hamming_topk(
                mesh, jnp.asarray(q), jnp.asarray(g.T), k=k, slab=16,
                use_pallas=False,
            )
        assert len(ss._SHARD_FN_CACHE) == 2
        kept = [key[4] for key in ss._SHARD_FN_CACHE]  # k slot of the key
        assert kept == [5, 6]  # oldest entries evicted
    finally:
        ss._SHARD_FN_CACHE_MAX = old_max


# ----------------------------------------------------------------------------
# Deep-k routing: k past large_k_max must stream through the sort engine
# (no winner-rescan materialization) and stay exact.
# ----------------------------------------------------------------------------

def test_topk_deeper_than_large_k_max_stays_exact():
    from hashgan_tpu.index import build_gallery

    rng = np.random.default_rng(11)
    n, bits, k = 600, 32, 512
    codes = np.where(
        rng.uniform(size=(n, bits)) < 0.5, -1.0, 1.0
    ).astype(np.float32)
    labels = np.zeros((n, 4), dtype=np.float32)
    gal = build_gallery(jnp.asarray(codes), labels, bits, use_pallas=False)
    q = gal.canonical_packed()[:3]
    d, i = gal.topk(jnp.asarray(q), k=k, use_pallas=False, large_k_max=256)
    d, i = np.asarray(d), np.asarray(i)
    d_full = hamming_distance_np(q, gal.canonical_packed())
    for qi in range(3):
        order = np.argsort(d_full[qi], kind="stable")[:k]
        valid = min(k, n)
        np.testing.assert_array_equal(i[qi, :valid], order[:valid])
        np.testing.assert_array_equal(d[qi, :valid], d_full[qi][order[:valid]])


def test_topk_routing_caps_large_k_engine(monkeypatch):
    """k past large_k_max must route to the streaming sort engine, not the
    winner-rescan large-k engine (whose gather is O(Q*k) device memory)."""
    import hashgan_tpu.ops.mxu_large_k as mlk
    from hashgan_tpu.index import build_gallery
    from hashgan_tpu.index import gallery as gal_mod

    rng = np.random.default_rng(12)
    codes = np.where(
        rng.uniform(size=(600, 32)) < 0.5, -1.0, 1.0
    ).astype(np.float32)
    gal = build_gallery(
        jnp.asarray(codes), np.zeros((600, 4), np.float32), 32,
        use_pallas=False,
    )
    assert gal.gallery_grouped is not None  # grouped layouts exist
    q = jnp.asarray(gal.canonical_packed()[:3])
    calls = []

    def fake_large(pq, *a, k=100, **kw):
        calls.append("large")
        return (jnp.zeros((pq.shape[0], k), jnp.int32),
                jnp.zeros((pq.shape[0], k), jnp.int32))

    def fake_sort(pq, gt, *a, k=100, **kw):
        calls.append("sort")
        return (jnp.zeros((pq.shape[0], k), jnp.int32),
                jnp.zeros((pq.shape[0], k), jnp.int32))

    monkeypatch.setattr(mlk, "mxu_topk_large", fake_large)
    monkeypatch.setattr(gal_mod, "hamming_scan_topk", fake_sort)
    gal.topk(q, k=512, use_pallas=True, large_k_max=256)
    assert calls == ["sort"]
    calls.clear()
    gal.topk(q, k=512, use_pallas=True, large_k_max=1024)
    assert calls == ["large"]


# ----------------------------------------------------------------------------
# Serving-surface validation
# ----------------------------------------------------------------------------

@pytest.fixture()
def server():
    from hashgan_tpu.index import build_gallery
    from hashgan_tpu.index.engine import QueryEngine
    from hashgan_tpu.index.server import make_server

    rng = np.random.default_rng(0)
    codes = np.where(
        rng.uniform(size=(64, 32)) < 0.5, -1.0, 1.0
    ).astype(np.float32)
    labels = np.eye(4, dtype=np.float32)[rng.integers(0, 4, 64)]
    gal = build_gallery(jnp.asarray(codes), labels, 32, use_pallas=False)
    srv = make_server(QueryEngine(None, None, gal))
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield srv
    srv.shutdown()


def _post(srv, path, obj):
    port = srv.server_address[1]
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}{path}", data=json.dumps(obj).encode(),
        headers={"Content-Type": "application/json"},
    )
    return json.loads(urllib.request.urlopen(req).read())


def _post_expect_400(srv, path, obj):
    with pytest.raises(urllib.error.HTTPError) as exc:
        _post(srv, path, obj)
    assert exc.value.code == 400
    return json.loads(exc.value.read())


def test_remove_rejects_out_of_range_and_negative_ids(server):
    err = _post_expect_400(server, "/remove", {"ids": [999]})
    assert "ids must be in" in err["error"]
    # negative ids must NOT wrap onto real items
    _post_expect_400(server, "/remove", {"ids": [-1]})
    assert server.service.engine.gallery.n == 64  # nothing deleted


def test_non_dict_json_body_is_a_400(server):
    err = _post_expect_400(server, "/query", [1, 2, 3])
    assert "JSON object" in err["error"]


# ----------------------------------------------------------------------------
# Pair-balanced sampling over a fully unlabeled dataset must self-partner,
# not crash on the empty class pool.
# ----------------------------------------------------------------------------

def test_pair_balanced_all_zero_labels_self_partners():
    from hashgan_tpu.data.pipeline import BatchIterator
    from hashgan_tpu.data.synthetic import SyntheticImageDataset

    rng = np.random.default_rng(0)
    ds = SyntheticImageDataset(
        images=rng.integers(0, 255, (32, 8, 8, 3)).astype(np.uint8),
        labels=np.zeros((32, 4), dtype=np.float32),
    )
    it = BatchIterator(ds, batch_size=8, pair_balanced=True)
    imgs, labels = it.batch(0)
    assert imgs.shape[0] == 8 and (labels == 0).all()


# ----------------------------------------------------------------------------
# ServingPipeline must refuse an encoder-less engine with a clear error.
# ----------------------------------------------------------------------------

def test_serving_pipeline_rejects_encoderless_engine():
    from hashgan_tpu.index import build_gallery
    from hashgan_tpu.index.engine import QueryEngine, ServingPipeline

    rng = np.random.default_rng(0)
    codes = np.where(
        rng.uniform(size=(512, 32)) < 0.5, -1.0, 1.0
    ).astype(np.float32)
    gal = build_gallery(
        jnp.asarray(codes), np.zeros((512, 4), np.float32), 32,
        use_pallas=False,
    )
    with pytest.raises(ValueError, match="encoder"):
        ServingPipeline(QueryEngine(None, None, gal))
