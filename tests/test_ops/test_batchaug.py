"""MoA batch augmentation tests: shape preservation, actual mixing, value ranges."""

import jax
import numpy as np
import pytest

from trainner_redux_tpu.ops.batchaug import AUG_FNS, BatchAugment

SCALE = 2
GT_SHAPE = (4, 32, 32, 3)
LQ_SHAPE = (4, 16, 16, 3)


@pytest.mark.parametrize("aug", sorted(AUG_FNS))
def test_aug_shapes_and_range(aug):
    gt = jax.random.uniform(jax.random.key(0), GT_SHAPE)
    lq = jax.random.uniform(jax.random.key(1), LQ_SHAPE)
    gt2, lq2 = AUG_FNS[aug](gt, lq, SCALE, jax.random.key(2))
    assert gt2.shape == GT_SHAPE
    assert lq2.shape == LQ_SHAPE
    assert np.isfinite(np.asarray(gt2)).all()
    assert np.isfinite(np.asarray(lq2)).all()
    assert float(np.asarray(lq2).min()) >= -1e-4
    assert float(np.asarray(lq2).max()) <= 1.0 + 1e-4


def test_mixup_actually_mixes():
    gt = jax.random.uniform(jax.random.key(0), GT_SHAPE)
    lq = jax.random.uniform(jax.random.key(1), LQ_SHAPE)
    gt2, _lq2 = AUG_FNS["mixup"](gt, lq, SCALE, jax.random.key(2))
    assert not np.allclose(np.asarray(gt2), np.asarray(gt))


def test_batch_augment_dispatch():
    ba = BatchAugment(SCALE, ["none", "mixup", "cutmix"], [0.0, 0.5, 0.5], seed=0)
    gt = jax.random.uniform(jax.random.key(0), GT_SHAPE)
    lq = jax.random.uniform(jax.random.key(1), LQ_SHAPE)
    changed = 0
    for _ in range(5):
        gt2, lq2 = ba(gt, lq)
        assert gt2.shape == GT_SHAPE
        if not np.allclose(np.asarray(gt2), np.asarray(gt)):
            changed += 1
    assert changed >= 1  # with p(none)=0 something must change
