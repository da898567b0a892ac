import numpy as np

from hashgan_tpu.data.pipeline import prefetch_to_device


def test_prefetch_preserves_order_and_content():
    batches = [(np.full((2, 2), i), np.full((2,), i)) for i in range(7)]
    out = list(prefetch_to_device(iter(batches), size=3))
    assert len(out) == 7
    for i, (a, b) in enumerate(out):
        np.testing.assert_array_equal(np.asarray(a), batches[i][0])
        np.testing.assert_array_equal(np.asarray(b), batches[i][1])


def test_prefetch_with_sharding():
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from hashgan_tpu.parallel import make_mesh

    mesh = make_mesh(8)
    sh = NamedSharding(mesh, P("data"))
    batches = [np.arange(16, dtype=np.float32) + i for i in range(3)]
    out = list(prefetch_to_device(iter(batches), size=2, sharding=sh))
    assert out[0].sharding.spec == P("data")
    np.testing.assert_array_equal(np.asarray(out[2]), batches[2])


def test_alexnet_input_resize():
    import jax
    import jax.numpy as jnp

    from hashgan_tpu.models import AlexNetEncoder

    enc = AlexNetEncoder(bits=16, input_resize=227)
    x = jax.random.normal(jax.random.key(0), (1, 64, 64, 3)) * 50
    vars_ = enc.init({"params": jax.random.key(1), "dropout": jax.random.key(2)},
                     x, train=False)
    # fc6 kernel must match the bvlc 9216x4096 shape at 227 input
    assert vars_["params"]["fc6"]["kernel"].shape == (9216, 4096)
    codes = enc.apply(vars_, x, train=False)
    assert codes.shape == (1, 16)
