"""On-device image frontend tests (ops/image.py)."""

import jax.numpy as jnp
import numpy as np

from omr_a2s_multimodal_transformer_tpu.ops.image import preprocess_image_batch


def test_normalize_uint8_and_pad_white():
    raw = np.full((2, 16, 24), 128, np.uint8)
    hw = jnp.asarray([[16, 24], [8, 12]], jnp.int32)
    x, hw2 = preprocess_image_batch(jnp.asarray(raw), hw)
    x = np.asarray(x)
    assert x.shape == (2, 16, 24, 1)
    np.testing.assert_allclose(x[0, :, :, 0], 128 / 255.0, atol=1e-6)
    # padding region of sample 1 forced to white
    assert np.all(x[1, 8:, :, 0] == 1.0) and np.all(x[1, :, 12:, 0] == 1.0)
    np.testing.assert_array_equal(np.asarray(hw2), np.asarray(hw))


def test_resize_to_height_rescales_hw():
    rng = np.random.default_rng(0)
    raw = rng.integers(0, 255, (2, 32, 64), np.uint8)
    hw = jnp.asarray([[32, 64], [32, 40]], jnp.int32)
    x, hw2 = preprocess_image_batch(jnp.asarray(raw), hw, target_height=16)
    assert np.asarray(x).shape == (2, 16, 32, 1)
    np.testing.assert_array_equal(np.asarray(hw2)[0], [16, 32])
    np.testing.assert_array_equal(np.asarray(hw2)[1], [16, 20])  # aspect-scaled valid width
