import jax
import jax.numpy as jnp
import numpy as np

from hashgan_tpu.eval.sample_quality import (
    conditional_accuracy,
    inception_score_from_logits,
    sample_quality_report,
)


def test_is_uniform_confident_classifier_is_k():
    """Perfectly confident + perfectly diverse -> IS == n_classes."""
    k, n = 5, 100
    logits = np.full((n, k), -50.0)
    for i in range(n):
        logits[i, i % k] = 50.0
    score = inception_score_from_logits(jnp.asarray(logits))
    assert abs(score - k) < 1e-3


def test_is_collapsed_generator_is_one():
    """All samples one class -> IS == 1 (the collapse detector)."""
    logits = np.full((64, 8), -50.0)
    logits[:, 3] = 50.0
    score = inception_score_from_logits(jnp.asarray(logits))
    assert abs(score - 1.0) < 1e-3


def test_conditional_accuracy():
    logits = np.array([[5.0, 0.0], [0.0, 5.0], [5.0, 0.0]])
    labels = np.eye(2)[[0, 1, 1]]
    assert abs(conditional_accuracy(logits, labels) - 2 / 3) < 1e-9


def test_conditional_accuracy_multilabel_topm_iou():
    # Row 0: targets {0, 2}, top-2 scores at {0, 2} -> IoU 1.
    # Row 1: targets {1}, top-1 score at class 3 -> IoU 0.
    # Row 2: targets {0, 1, 3}, top-3 at {0, 1, 2} -> IoU 2/4.
    logits = np.array([
        [9.0, 1.0, 8.0, 0.0],
        [2.0, 1.0, 0.0, 5.0],
        [7.0, 6.0, 5.0, 4.0],
    ])
    labels = np.array([
        [1.0, 0.0, 1.0, 0.0],
        [0.0, 1.0, 0.0, 0.0],
        [1.0, 1.0, 0.0, 1.0],
    ])
    got = conditional_accuracy(logits, labels, multi_label=True)
    assert abs(got - (1.0 + 0.0 + 0.5) / 3) < 1e-9
    # Threshold-free: a negative-distance score scale (template classifier)
    # must behave identically to its shifted copy.
    assert abs(
        conditional_accuracy(logits - 100.0, labels, multi_label=True) - got
    ) < 1e-9


def test_report_with_real_models():
    from hashgan_tpu.models import Discriminator, Generator

    gen = Generator(image_size=32, n_labels=4, dim=8)
    disc = Discriminator(image_size=32, n_labels=4, dim=8)
    rng = jax.random.key(0)
    z = jnp.zeros((2, 16)); y = jnp.zeros((2, 4))
    gv = gen.init(rng, z, y, train=False)
    dv = disc.init(rng, jnp.zeros((2, 32, 32, 3)))
    report = sample_quality_report(
        lambda z, l: gen.apply(gv, z, l, train=False),
        lambda x: disc.apply(dv, x)[1],
        rng, n_labels=4, z_dim=16, n_samples=64, batch=32,
    )
    assert 1.0 <= report["inception_score"] <= 4.0
    assert 0.0 <= report["conditional_accuracy"] <= 1.0
    assert 0.0 <= report["marginal_label_entropy_bits"] <= 2.0 + 1e-6


def test_template_classifier_is_independent_and_accurate():
    """Frozen nearest-template classifier: classifies noisy class images
    correctly without reference to any trained network (ADVICE r1: the
    aux-head IS trends with the generator being measured)."""
    import jax.numpy as jnp
    import numpy as np

    from hashgan_tpu.data.synthetic import make_synthetic
    from hashgan_tpu.eval import make_template_classifier

    ds, templates = make_synthetic(64, 5, size=16, noise_scale=30.0, seed=3)
    assert ds.templates is not None
    cls = make_template_classifier(templates)
    imgs = jnp.asarray(ds.images, jnp.float32) / 127.5 - 1.0  # GAN range
    logits = np.asarray(cls(imgs))
    pred = logits.argmax(axis=1)
    truth = ds.labels.argmax(axis=1)
    assert (pred == truth).mean() > 0.95


def test_experiment_sample_quality_has_template_metrics(tmp_path):
    import dataclasses as dc

    from hashgan_tpu.configs import (
        Config, DataConfig, EncoderConfig, GanConfig, TrainConfig,
    )
    from hashgan_tpu.train.loop import Experiment

    cfg = Config(
        data=DataConfig(n_train=32, n_query=8, n_database=32, n_classes=4),
        gan=GanConfig(dim=16, z_dim=16, n_critic=2, iters=10),
        encoder=EncoderConfig(arch="small_cnn", bits=16),
        train=TrainConfig(batch_size=8),
        use_gan=True,
    )
    exp = Experiment(cfg, workdir=str(tmp_path), use_mesh=False)
    report = exp.sample_quality()
    for key in ("inception_score_aux", "inception_score_tmpl",
                "conditional_accuracy_tmpl"):
        assert key in report, report.keys()
