"""Multi-host initialization & film gather.

The reference is a single process (SURVEY.md §2 parallelism checklist: no
distributed backend).  For multi-host TPU slices: call
:func:`initialize_distributed` once per process before device use
(`jax.distributed.initialize` wires the PJRT coordination service over DCN),
build a global mesh with `parallel.mesh.make_mesh` (jax.devices() is then the
global device list), and render with `parallel.sharded`.  Cross-chip traffic
stays on ICI (the film is tile-sharded, the scene replicated); DCN only
carries the coordination handshake and, in training, the psum'd scene-
parameter gradients across hosts.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def initialize_distributed(coordinator: str | None = None,
                           num_processes: int | None = None,
                           process_id: int | None = None) -> None:
    """Wrapper over jax.distributed.initialize; arguments come from the
    launcher environment when omitted (TPU pods auto-detect)."""
    kwargs = {}
    if coordinator is not None:
        kwargs["coordinator_address"] = coordinator
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    jax.distributed.initialize(**kwargs)


def gather_film_to_host(film_image: jnp.ndarray) -> np.ndarray | None:
    """Assemble the (possibly sharded) film on process 0 as a NumPy array;
    other processes return None.  The analog of the reference's
    swapchain present — the one host->display hop per frame."""
    from jax.experimental import multihost_utils

    if jax.process_count() == 1:
        return np.asarray(film_image)
    gathered = multihost_utils.process_allgather(film_image, tiled=True)
    return np.asarray(gathered) if jax.process_index() == 0 else None
