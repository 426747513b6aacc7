"""uint8 image path: device-side normalize == host-side normalize."""
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from multimodal_gar_tpu.data.jrdb import _NORM_BIAS, _NORM_SCALE
from multimodal_gar_tpu.models import MGAR
from multimodal_gar_tpu.utils.testing import synthetic_batch, tiny_config


def test_uint8_images_match_float_path():
    cfg = tiny_config()
    batch = synthetic_batch(cfg, batch_size=1)
    rng = np.random.default_rng(0)
    u8 = rng.integers(0, 256, batch.images.shape).astype(np.uint8)
    fl = u8.astype(np.float32) * _NORM_SCALE + _NORM_BIAS

    model = MGAR(cfg)
    bf = batch.replace(images=jnp.asarray(fl))
    bu = batch.replace(images=jnp.asarray(u8))
    variables = jax.jit(partial(model.init, train=False))(
        jax.random.PRNGKey(0), bf)
    of = jax.jit(partial(model.apply, train=False))(variables, bf)
    ou = jax.jit(partial(model.apply, train=False))(variables, bu)
    np.testing.assert_allclose(np.asarray(of.a_theta), np.asarray(ou.a_theta),
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(of.card), np.asarray(ou.card),
                               atol=1e-4, rtol=1e-4)
