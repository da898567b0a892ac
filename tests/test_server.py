"""HTTP retrieval service (index/server.py): endpoints, exactness vs the
engine, incremental maintenance, and error surfaces — against a live
threaded server on an ephemeral port."""

import json
import threading
import urllib.error
import urllib.request

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hashgan_tpu.index import PackedGallery, QueryEngine, build_gallery
from hashgan_tpu.index.server import make_server
from hashgan_tpu.models.encoders import build_encoder


def _req(base, path, payload=None):
    if payload is None:
        r = urllib.request.urlopen(base + path, timeout=30)
    else:
        data = json.dumps(payload).encode()
        req = urllib.request.Request(
            base + path, data=data,
            headers={"Content-Type": "application/json"},
        )
        r = urllib.request.urlopen(req, timeout=30)
    return json.loads(r.read())


@pytest.fixture(scope="module")
def live():
    rng = np.random.default_rng(0)
    n, bits = 700, 32
    codes = np.where(
        rng.uniform(size=(n, bits)) < 0.5, -1.0, 1.0
    ).astype(np.float32)
    labels = np.eye(4, dtype=np.float32)[rng.integers(0, 4, n)]
    gal = build_gallery(jnp.asarray(codes), labels, bits, use_pallas=False)
    enc = build_encoder("small_cnn", bits)
    params = enc.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)},
        jnp.zeros((2, 16, 16, 3), jnp.float32), train=False,
    )["params"]
    engine = QueryEngine(enc, params, gal)
    server = make_server(engine, port=0)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{server.server_address[1]}"
    yield base, engine, codes, labels
    server.shutdown()


def test_healthz_and_code_query_matches_engine(live):
    base, engine, codes, labels = live
    h = _req(base, "/healthz")
    assert h["status"] == "ok" and h["n"] == 700 and h["bits"] == 32
    assert h["has_encoder"] is True

    q = codes[:5] + np.random.default_rng(1).normal(0, 0.1, codes[:5].shape)
    out = _req(base, "/query", {"codes": q.tolist(), "k": 10})
    ref = engine.query_codes(jnp.asarray(q, jnp.float32), k=10)
    np.testing.assert_array_equal(np.asarray(out["indices"]), ref.indices)
    np.testing.assert_array_equal(np.asarray(out["distances"]), ref.distances)
    # self-queries: nearest neighbor of a near-copy is the item itself
    assert [r[0] for r in out["indices"]] == [0, 1, 2, 3, 4]


def test_query_with_labels_and_modes(live):
    base, engine, codes, labels = live
    out = _req(base, "/query",
               {"codes": codes[:3].tolist(), "k": 4, "with_labels": True})
    lab = np.asarray(out["labels"])
    assert lab.shape == (3, 4, 4)
    np.testing.assert_array_equal(
        lab[0, 0], labels[out["indices"][0][0]]
    )
    approx = _req(base, "/query",
                  {"codes": codes[:3].tolist(), "k": 4, "mode": "approx"})
    assert np.asarray(approx["indices"]).shape == (3, 4)


def test_image_query(live):
    base, engine, *_ = live
    imgs = np.random.default_rng(2).integers(
        0, 255, (2, 16, 16, 3)
    ).astype(np.uint8)
    out = _req(base, "/query", {"images": imgs.tolist(), "k": 3})
    ref = engine.query_images(imgs, k=3)
    np.testing.assert_array_equal(np.asarray(out["indices"]), ref.indices)


def test_extend_remove_roundtrip(live):
    base, engine, codes, labels = live
    n0 = engine.gallery.n
    new_codes = np.where(
        np.random.default_rng(3).uniform(size=(5, 32)) < 0.5, -1.0, 1.0
    ).astype(np.float32)
    new_labels = np.zeros((5, 4), np.float32)
    out = _req(base, "/extend",
               {"codes": new_codes.tolist(), "labels": new_labels.tolist()})
    assert out["n"] == n0 + 5
    # the new items are their own nearest neighbors at distance 0
    q = _req(base, "/query", {"codes": new_codes.tolist(), "k": 1})
    assert [r[0] for r in q["indices"]] == list(range(n0, n0 + 5))
    assert all(r[0] == 0 for r in q["distances"])

    out = _req(base, "/remove", {"ids": [n0, n0 + 1]})
    assert out["n"] == n0 + 3
    assert len(out["id_map"]) == n0 + 3

    stats = _req(base, "/stats")
    assert stats["requests"]["/query"] >= 2
    assert stats["latency_ms"]["p50"] is not None


def test_error_surfaces(live):
    base, *_ = live
    for payload, frag in (
        ({"codes": [[1.0, 2.0]]}, "codes must be"),
        ({"k": 5}, "needs 'codes' or 'images'"),
        ({"codes": [[0.0] * 32], "mode": "nope"}, "unknown mode"),
    ):
        with pytest.raises(urllib.error.HTTPError) as e:
            _req(base, "/query", payload)
        assert e.value.code == 400
        assert frag in json.loads(e.value.read())["error"]
    with pytest.raises(urllib.error.HTTPError) as e:
        _req(base, "/nope", {})
    assert e.value.code == 404


def test_code_only_engine_rejects_images():
    rng = np.random.default_rng(5)
    codes = np.where(
        rng.uniform(size=(64, 16)) < 0.5, -1.0, 1.0
    ).astype(np.float32)
    gal = build_gallery(
        jnp.asarray(codes), np.zeros((64, 1), np.float32), 16,
        use_pallas=False,
    )
    engine = QueryEngine(None, None, gal)
    res = engine.query_codes(jnp.asarray(codes[:2]), k=3)
    assert res.indices.shape == (2, 3)
    with pytest.raises(ValueError, match="without an encoder"):
        engine.query_images(np.zeros((1, 8, 8, 3), np.uint8), k=1)
