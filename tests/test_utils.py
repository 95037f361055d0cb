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
