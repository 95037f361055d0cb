import time

import jax.numpy as jnp
import numpy as np

from rvpt_tpu.utils.checkpoint import load, save
from rvpt_tpu.utils.timer import FrameTimer


def test_timer_rolling_window():
    t = FrameTimer()
    for _ in range(3):
        t.frame_start()
        time.sleep(0.002)
        t.frame_stop()
    s = t.stats(rays_per_frame=1000)
    assert s["frames"] == 3
    assert s["avg_ms"] >= 2.0
    assert s["fps"] > 0
    assert s["fastest_ms"] <= s["slowest_ms"]
    assert s["mrays_per_s"] > 0
    assert t.since_last_frame() >= 0.0


def test_checkpoint_pytree_roundtrip(tmp_path):
    tree = {
        "a": jnp.arange(6, dtype=jnp.float32).reshape(2, 3),
        "nested": {"b": jnp.asarray([1, 2, 3], jnp.int32)},
    }
    p = str(tmp_path / "t.npz")
    save(p, tree, meta={"note": "hi"})
    like = {
        "a": jnp.zeros((2, 3), jnp.float32),
        "nested": {"b": jnp.zeros((3,), jnp.int32)},
    }
    out, meta = load(p, like)
    assert meta["note"] == "hi"
    assert np.array_equal(out["a"], tree["a"])
    assert np.array_equal(out["nested"]["b"], tree["nested"]["b"])
    assert out["nested"]["b"].dtype == jnp.int32


def test_checkpoint_missing_leaf(tmp_path):
    p = str(tmp_path / "t.npz")
    save(p, {"a": jnp.zeros(2)})
    try:
        load(p, {"a": jnp.zeros(2), "b": jnp.zeros(3)})
        assert False, "expected KeyError"
    except KeyError:
        pass


def test_hot_reload_watcher(tmp_path):
    """SourceWatcher notices a touched module file and reloads it."""
    import rvpt_tpu.config as cfg_mod
    from rvpt_tpu.utils.hot_reload import SourceWatcher

    w = SourceWatcher()
    assert w.dirty_modules() == []
    # touch a module file into the future
    import os

    path = cfg_mod.__file__
    t = time.time() + 5
    os.utime(path, (t, t))
    dirty = w.dirty_modules()
    assert "rvpt_tpu.config" in dirty
    reloaded = w.reload_if_changed(clear_caches=False)
    assert "rvpt_tpu.config" in reloaded
    assert w.dirty_modules() == []
    os.utime(path)  # restore sane mtime


def test_block_order_is_permutation():
    from rvpt_tpu.render import _block_order

    import numpy as np

    for w, h in ((192, 128), (24, 16), (1920, 1088)):
        order, inv = _block_order(w, h)
        x = np.arange(w * h)
        assert (x[order][inv] == x).all()
        # first tile = first 128x64 screen block (when film is big enough)
        if w >= 128 and h >= 64:
            ys, xs = order[: 128 * 64] // w, order[: 128 * 64] % w
            assert xs.max() < 128 and ys.max() < 64


def test_profiling_helpers():
    from rvpt_tpu.utils.profiling import StepProfile, mrays_per_second

    assert abs(mrays_per_second(1920, 1088, 8, 1, 0.1) - 167.1) < 0.1

    prof = StepProfile(window=3)
    for _ in range(5):
        with prof.phase("render"):
            pass
        with prof.phase("accumulate"):
            pass
    s = prof.summary()
    assert s["render"]["count"] == 3  # window keeps the last 3
    assert s["accumulate"]["count"] == 3
    assert s["render"]["min_s"] <= s["render"]["mean_s"] <= s["render"]["max_s"]
