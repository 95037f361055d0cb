import jax.numpy as jnp
import numpy as np

from rvpt_tpu.ops import film as F


def test_ema_sequence():
    film = F.Film.create(2, 2)
    s1 = jnp.full((3, 2, 2), 1.0)
    s2 = jnp.full((3, 2, 2), 3.0)
    film = F.accumulate(film, s1, dirty=False)
    assert np.allclose(film.accum, 1.0)
    assert film.frame == 1
    film = F.accumulate(film, s2, dirty=False)
    # (1*1 + 3)/2 = 2
    assert np.allclose(film.accum, 2.0)
    assert film.frame == 2


def test_dirty_reset():
    film = F.Film.create(2, 2)
    film = F.accumulate(film, jnp.full((3, 2, 2), 1.0), dirty=False)
    film = F.accumulate(film, jnp.full((3, 2, 2), 5.0), dirty=True)
    assert np.allclose(film.accum, 5.0)
    assert film.frame == 1


def test_to_srgb_u8():
    img = jnp.array([[[-0.5, 0.0, 0.5], [1.0, 2.0, 0.25]]])
    u8 = np.asarray(F.to_srgb_u8(img))
    assert u8.tolist() == [[[0, 0, 128], [255, 255, 64]]]


def test_chw_hwc_roundtrip():
    import jax.numpy as jnp

    x = jnp.arange(24, dtype=jnp.float32).reshape(3, 2, 4)
    assert F.chw_to_hwc(x).shape == (2, 4, 3)
    assert np.array_equal(F.hwc_to_chw(F.chw_to_hwc(x)), x)
