"""VAE tests: shapes, frame-wise video wrapper, latent size."""

import numpy as np
import jax
import jax.numpy as jnp

from viditq_tpu.models.vae import AutoencoderKL, VideoAutoencoderKL
import pytest

pytestmark = pytest.mark.heavy


def test_autoencoder_roundtrip_shapes():
    vae = AutoencoderKL()
    x = jnp.asarray(np.random.default_rng(0).standard_normal((1, 3, 32, 32)),
                    jnp.float32)
    variables = vae.init(jax.random.PRNGKey(0), x)
    z = vae.apply(variables, x, method=vae.encode)
    assert z.shape == (1, 4, 4, 4)
    out = vae.apply(variables, z, method=vae.decode)
    assert out.shape == (1, 3, 32, 32)
    assert np.isfinite(np.asarray(out)).all()


def test_video_vae_framewise():
    vvae = VideoAutoencoderKL(micro_batch_size=2)
    x = jnp.asarray(np.random.default_rng(1).standard_normal((1, 3, 4, 16, 16)),
                    jnp.float32)
    variables = vvae.init(jax.random.PRNGKey(0), x)
    z = vvae.apply(variables, x, method=vvae.encode)
    assert z.shape == (1, 4, 4, 2, 2)
    out = vvae.apply(variables, z, method=vvae.decode)
    assert out.shape == (1, 3, 4, 16, 16)
    assert vvae.get_latent_size((16, 512, 512)) == [16, 64, 64]
