"""BVH: flat node arrays + host-side binned-SAH builder.

Same algorithm and data layout as the reference's CPU builder
(src/rvpt/bvh_builder.cpp:11-199, src/rvpt/bvh.h:12-86): 16 SAH bins, leaves
of 2-8 primitives, nodes as (first_child_or_primitive, primitive_count,
bounds); sibling children are allocated contiguously so an interior node
stores only its left child index; triangles are permuted into leaf order so a
leaf references a contiguous range (bvh.h:72-79).

Two reference defects are FIXED here (SURVEY.md §2 "known defects"):
  * the partition-phase bin index squared the center offset
    (bvh_builder.cpp:44-46) — we bin identically in search and partition;
  * the median fallback computed ``(begin+count)>>1`` instead of
    ``begin + count/2`` (bvh_builder.cpp:167).

The builder is host-side NumPy (scene build time, like the reference building
on the CPU at init — rvpt.cpp:84); a native C++ implementation
(rvpt_tpu.native) is the fast path for large meshes.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np

from ..pytree import pytree_dataclass, static_field

BIN_COUNT = 16  # bvh_builder.h:49-50
MIN_PRIMS_PER_LEAF = 2  # bvh_builder.h:45
MAX_PRIMS_PER_LEAF = 8  # bvh_builder.h:46


@pytree_dataclass
class Bvh:
    """Device-side flat BVH (the SSBO layout of bvh.h:12-58 as SoA arrays)."""

    first: jnp.ndarray  # u32[M]: first child (interior) or first primitive (leaf)
    count: jnp.ndarray  # u32[M]: 0 for interior nodes, else leaf primitive count
    bmin: jnp.ndarray  # f32[M,3]
    bmax: jnp.ndarray  # f32[M,3]
    max_leaf: int = static_field(default=MAX_PRIMS_PER_LEAF)

    @property
    def num_nodes(self) -> int:
        return self.first.shape[0]


@dataclasses.dataclass
class BvhHost:
    """Host-side build result (before device upload)."""

    first: np.ndarray
    count: np.ndarray
    bmin: np.ndarray
    bmax: np.ndarray
    prim_indices: np.ndarray  # permutation: leaf-order -> original ids

    def to_device(self) -> Bvh:
        return Bvh(
            first=jnp.asarray(self.first, jnp.uint32),
            count=jnp.asarray(self.count, jnp.uint32),
            bmin=jnp.asarray(self.bmin, jnp.float32),
            bmax=jnp.asarray(self.bmax, jnp.float32),
            max_leaf=int(self.count.max()) if len(self.count) else MAX_PRIMS_PER_LEAF,
        )

    def max_depth(self) -> int:
        depth = {0: 0}
        worst = 0
        for i in range(len(self.first)):
            d = depth[i]
            worst = max(worst, d)
            if self.count[i] == 0:
                c = int(self.first[i])
                depth[c] = depth[c + 1] = d + 1
        return worst

    def collect_aabbs_by_depth(self) -> list[np.ndarray]:
        """Per-depth list of [K,6] (min,max) boxes — the BVH wireframe debug
        view's data source (reference: bvh.cpp:7-26)."""
        depth = {0: 0}
        out: dict[int, list] = {}
        for i in range(len(self.first)):
            d = depth[i]
            out.setdefault(d, []).append(np.concatenate([self.bmin[i], self.bmax[i]]))
            if self.count[i] == 0:
                c = int(self.first[i])
                depth[c] = depth[c + 1] = d + 1
        return [np.asarray(out[d]) for d in sorted(out)]


def _half_area(bmin, bmax):
    """AABB half surface area (reference: geometry.h:38-41); degenerate boxes
    clamp their diagonal at zero."""
    d = np.maximum(bmax - bmin, 0.0)
    return d[..., 0] * (d[..., 1] + d[..., 2]) + d[..., 1] * d[..., 2]


def build_bvh(centers: np.ndarray, bmin: np.ndarray, bmax: np.ndarray) -> BvhHost:
    """Binned-SAH build over primitive AABBs (vectorized inner sweeps, explicit
    work stack instead of recursion)."""
    n = len(centers)
    assert n > 0, "cannot build a BVH over zero primitives"
    centers = np.asarray(centers, np.float64)
    bmin = np.asarray(bmin, np.float64)
    bmax = np.asarray(bmax, np.float64)

    prim_idx = np.arange(n, dtype=np.uint32)
    firsts = [0]
    counts = [n]
    node_bmin = [np.zeros(3)]
    node_bmax = [np.zeros(3)]

    # Work stack of node ids whose [first, first+count) span needs processing.
    stack = [0]
    while stack:
        node = stack.pop()
        begin = firsts[node]
        count = counts[node]
        ids = prim_idx[begin : begin + count]
        nb_min = bmin[ids].min(axis=0)
        nb_max = bmax[ids].max(axis=0)
        node_bmin[node] = nb_min
        node_bmax[node] = nb_max
        if count < MIN_PRIMS_PER_LEAF:
            continue

        # --- find_best_split (bvh_builder.cpp:56-127), vectorized per axis.
        diag = np.maximum(nb_max - nb_min, 1e-30)
        min_cost = np.inf
        min_axis, min_bin = -1, 0
        cen = centers[ids]
        for axis in range(3):
            scale = BIN_COUNT / diag[axis]
            b = ((cen[:, axis] - nb_min[axis]) * scale).astype(np.int64)
            b = np.clip(b, 0, BIN_COUNT - 1)
            bin_counts = np.bincount(b, minlength=BIN_COUNT)
            bin_bmin = np.full((BIN_COUNT, 3), np.inf)
            bin_bmax = np.full((BIN_COUNT, 3), -np.inf)
            for k in range(3):
                np.minimum.at(bin_bmin[:, k], b, bmin[ids][:, k])
                np.maximum.at(bin_bmax[:, k], b, bmax[ids][:, k])
            # prefix (left) sweep
            left_min = np.minimum.accumulate(bin_bmin, axis=0)
            left_max = np.maximum.accumulate(bin_bmax, axis=0)
            left_cnt = np.cumsum(bin_counts)
            left_cost = _half_area(left_min, left_max) * left_cnt
            # suffix (right) sweep
            right_min = np.minimum.accumulate(bin_bmin[::-1], axis=0)[::-1]
            right_max = np.maximum.accumulate(bin_bmax[::-1], axis=0)[::-1]
            right_cnt = np.cumsum(bin_counts[::-1])[::-1]
            # split at bin i means right = bins[i:], left = bins[:i]
            cost = (
                _half_area(right_min[1:], right_max[1:]) * right_cnt[1:]
                + left_cost[:-1]
            )
            cost = np.where(np.isfinite(cost), cost, np.inf)
            i = int(np.argmin(cost))
            if cost[i] < min_cost:
                min_cost = cost[i]
                min_axis = axis
                min_bin = i + 1

        no_split_cost = _half_area(nb_min, nb_max) * count
        if min_cost >= no_split_cost or min_axis < 0:
            if count <= MAX_PRIMS_PER_LEAF:
                continue
            # median fallback (bvh_builder.cpp:162-167, precedence bug fixed)
            axis = max(min_axis, 0)
            order = np.argsort(centers[ids][:, axis], kind="stable")
            prim_idx[begin : begin + count] = ids[order]
            mid = begin + (count >> 1)
        else:
            scale = BIN_COUNT / diag[min_axis]
            b = ((cen[:, min_axis] - nb_min[min_axis]) * scale).astype(np.int64)
            b = np.clip(b, 0, BIN_COUNT - 1)
            go_left = b < min_bin
            # stable partition preserves relative order like std::partition
            prim_idx[begin : begin + count] = np.concatenate(
                [ids[go_left], ids[~go_left]]
            )
            mid = begin + int(go_left.sum())
            if mid == begin or mid == begin + count:
                # numerically degenerate split: fall back to median
                order = np.argsort(centers[ids][:, min_axis], kind="stable")
                prim_idx[begin : begin + count] = ids[order]
                mid = begin + (count >> 1)

        left = len(firsts)
        firsts += [begin, mid]
        counts += [mid - begin, begin + count - mid]
        node_bmin += [np.zeros(3), np.zeros(3)]
        node_bmax += [np.zeros(3), np.zeros(3)]
        firsts[node] = left
        counts[node] = 0
        stack.append(left)
        stack.append(left + 1)

    return BvhHost(
        first=np.asarray(firsts, np.uint32),
        count=np.asarray(counts, np.uint32),
        bmin=np.asarray(node_bmin, np.float32),
        bmax=np.asarray(node_bmax, np.float32),
        prim_indices=prim_idx,
    )


def triangle_bounds(v0, v1, v2):
    """Per-triangle center + AABB, the builder's input (bvh_builder.h:17-28)."""
    bmin = np.minimum(np.minimum(v0, v1), v2)
    bmax = np.maximum(np.maximum(v0, v1), v2)
    centers = (bmin + bmax) * 0.5  # AABB center, like geometry AABB::center()
    return centers, bmin, bmax


def attach_bvh(scene):
    """Build a BVH over the scene's triangles, permute them into leaf order
    (bvh.h:72-79 / rvpt.cpp:85-86), and return the new Scene."""
    if scene.num_triangles == 0:
        return scene
    v0 = np.asarray(scene.tri_v0)
    v1 = np.asarray(scene.tri_v1)
    v2 = np.asarray(scene.tri_v2)
    centers, bmin, bmax = triangle_bounds(v0, v1, v2)
    # Native builder first (it exists precisely because NumPy is slow on the
    # large meshes where build time matters); NumPy is the fallback.
    host = None
    try:
        from ..native import bvh_native

        host = bvh_native.build(centers, bmin, bmax)
    except Exception:
        host = None
    if host is None:
        host = build_bvh(centers, bmin, bmax)
    perm = host.prim_indices
    return dataclasses.replace(
        scene,
        tri_v0=jnp.asarray(v0[perm]),
        tri_v1=jnp.asarray(v1[perm]),
        tri_v2=jnp.asarray(v2[perm]),
        tri_mat=jnp.asarray(np.asarray(scene.tri_mat)[perm]),
        bvh=host.to_device(),
    )


def validate(host: BvhHost, bmin: np.ndarray, bmax: np.ndarray) -> None:
    """Structural invariants: every primitive in exactly one leaf; node boxes
    contain their children; sibling layout contiguous (SURVEY.md §4 test
    plan)."""
    n_prims = len(host.prim_indices)
    assert sorted(host.prim_indices.tolist()) == list(range(n_prims))
    covered = np.zeros(n_prims, bool)
    for i in range(len(host.first)):
        if host.count[i] > 0:
            s = slice(int(host.first[i]), int(host.first[i] + host.count[i]))
            assert not covered[s].any(), "overlapping leaves"
            covered[s] = True
            ids = host.prim_indices[s]
            assert (host.bmin[i] <= bmin[ids].min(axis=0) + 1e-5).all()
            assert (host.bmax[i] >= bmax[ids].max(axis=0) - 1e-5).all()
        else:
            c = int(host.first[i])
            assert c + 1 < len(host.first)
            for ch in (c, c + 1):
                assert (host.bmin[i] <= host.bmin[ch] + 1e-5).all()
                assert (host.bmax[i] >= host.bmax[ch] - 1e-5).all()
    assert covered.all(), "primitive not covered by any leaf"
