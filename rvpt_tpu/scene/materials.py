"""Materials as a differentiable structure-of-arrays pytree.

The reference stores materials as three vec4s per material — albedo (w=ior),
emission, data (x=type) — in an SSBO re-uploaded each frame
(src/rvpt/material.h:9-26, src/rvpt/rvpt.cpp:126).  Here they are SoA pytree
leaves: ``albedo``/``emission``/``ior`` are differentiable (the primary inverse
-rendering targets), ``kind`` is a discrete i32 code.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..pytree import pytree_dataclass

LAMBERT = 0
MIRROR = 1
DIELECTRIC = 2

MATERIAL_NAMES = {"lambert": LAMBERT, "mirror": MIRROR, "dielectric": DIELECTRIC}


@pytree_dataclass
class Materials:
    albedo: jnp.ndarray  # f32[M,3]
    emission: jnp.ndarray  # f32[M,3]
    ior: jnp.ndarray  # f32[M]
    kind: jnp.ndarray  # i32[M]

    @property
    def count(self) -> int:
        return self.albedo.shape[0]

    @staticmethod
    def empty() -> "Materials":
        return Materials(
            albedo=jnp.zeros((0, 3), jnp.float32),
            emission=jnp.zeros((0, 3), jnp.float32),
            ior=jnp.zeros((0,), jnp.float32),
            kind=jnp.zeros((0,), jnp.int32),
        )

    @staticmethod
    def from_list(mats: list[dict]) -> "Materials":
        """Build from dicts with keys albedo, emission, kind, and optional ior."""
        if not mats:
            return Materials.empty()
        return Materials(
            albedo=jnp.asarray([m["albedo"] for m in mats], jnp.float32),
            emission=jnp.asarray([m["emission"] for m in mats], jnp.float32),
            ior=jnp.asarray([m.get("ior", 1.5) for m in mats], jnp.float32),
            kind=jnp.asarray([m["kind"] for m in mats], jnp.int32),
        )


def gather(mats: Materials, idx: jnp.ndarray) -> Materials:
    """Gather per-hit material rows; out-of-range idx (misses) clamps to row 0,
    callers must mask by hit validity.  A material-less scene (every ray
    misses) yields zeroed rows instead of an out-of-range gather."""
    if mats.count == 0:
        n = idx.shape
        return Materials(
            albedo=jnp.zeros((*n, 3), jnp.float32),
            emission=jnp.zeros((*n, 3), jnp.float32),
            ior=jnp.ones(n, jnp.float32),
            kind=jnp.zeros(n, jnp.int32),
        )
    safe = jnp.clip(idx, 0, mats.count - 1)
    return Materials(
        albedo=mats.albedo[safe],
        emission=mats.emission[safe],
        ior=mats.ior[safe],
        kind=mats.kind[safe],
    )
