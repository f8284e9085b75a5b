"""Native C++ decode/resize parity vs jax.image.resize (antialias)."""

import numpy as np
import pytest

from adnm_tpu.data.native import decode_resize_clip, get_lib


@pytest.mark.skipif(get_lib() is None, reason="native lib unavailable (no g++?)")
class TestNativeDecode:
    def test_matches_jax_image_resize(self):
        import jax
        import jax.numpy as jnp

        rng = np.random.default_rng(0)
        clip = rng.integers(0, 71, (3, 113, 157)).astype(np.uint8)
        ours = decode_resize_clip(clip, 64)
        assert ours.shape == (3, 64, 64)
        ref = np.asarray(
            jax.image.resize(
                jnp.asarray(clip.astype(np.float32) / 255.0), (3, 64, 64),
                method="bilinear", antialias=True,
            )
        )
        np.testing.assert_allclose(ours, ref, atol=2e-3)

    def test_upscale_identityish(self):
        # upscale path (no antialias widening): values stay in range
        rng = np.random.default_rng(1)
        clip = rng.integers(0, 71, (2, 16, 16)).astype(np.uint8)
        out = decode_resize_clip(clip, 32)
        assert out.shape == (2, 32, 32)
        assert out.min() >= 0.0 and out.max() <= 71 / 255 + 1e-6

    def test_constant_preserved(self):
        clip = np.full((1, 50, 70), 128, np.uint8)
        out = decode_resize_clip(clip, 33)
        np.testing.assert_allclose(out, 128 / 255.0, atol=1e-5)
