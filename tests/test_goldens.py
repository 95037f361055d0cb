"""Golden-image regression tests.

The reference has no tests; its implicit oracle is visual inspection of the
integrator ladder (SURVEY.md §4).  Here each integrator renders a fixed tiny
config with a fixed RNG seed and must match a committed golden PNG within
rgba8 quantization tolerance.  Regenerate with
``python tests/make_goldens.py`` after an *intentional* change of rendering
semantics.
"""

import os

import numpy as np
import pytest

from rvpt_tpu.utils.image import read_png

import make_goldens  # lives in tests/, importable because pytest adds rootdir

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "goldens")


@pytest.mark.parametrize("name", list(make_goldens.CASES))
def test_golden(name):
    path = os.path.join(GOLDEN_DIR, f"{name}.png")
    if not os.path.exists(path):
        pytest.skip(f"golden {name} not generated yet")
    got = make_goldens.render_case(name)
    want = read_png(path)
    assert got.shape == want.shape
    diff = np.abs(got.astype(np.int32) - want.astype(np.int32))
    # allow +-2 u8 steps for cross-platform fp wiggle; fail on structural change
    frac_off = (diff > 2).mean()
    assert frac_off < 0.002, (
        f"golden {name}: {frac_off:.4%} of subpixels differ by >2 "
        f"(max diff {diff.max()})"
    )
