"""Device mesh and sharding layout for population-parallel search.

The reference is single-GPU with a serial evaluation loop
(tf.config.set_visible_devices(gpus[0]), nsga_penalty.py:39-54;
one-by-one training, sa_nsga_penalty.py:237-253). The TPU-native scaling
model (SURVEY.md §2.3) is:

* mesh axes ('pop', 'data'): candidate models sharded over 'pop' (each chip
  trains a slice of the population — embarrassingly parallel, zero
  collectives on the forward/backward path), training batch optionally
  sharded over 'data' within a model's chip group (XLA inserts psum for
  gradient reduction over ICI).
* Host-side EA needs only the per-generation fitness vector back — a few
  hundred floats per generation of device->host traffic.

Multi-host: ``distributed_init`` wraps jax.distributed.initialize (the
moral equivalent of the NCCL/MPI world the reference never had).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def population_mesh(
    n_pop_devices: Optional[int] = None,
    n_data_devices: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Build a ('pop', 'data') mesh. Defaults to all visible devices on the
    pop axis."""
    devs = list(devices if devices is not None else jax.devices())
    if n_pop_devices is None:
        n_pop_devices = len(devs) // n_data_devices
    need = n_pop_devices * n_data_devices
    if need > len(devs):
        raise ValueError(
            f"mesh {n_pop_devices}x{n_data_devices} needs {need} devices, "
            f"have {len(devs)}"
        )
    grid = np.array(devs[:need]).reshape(n_pop_devices, n_data_devices)
    return Mesh(grid, ("pop", "data"))


def pop_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis population sharding for stacked params/flags."""
    return NamedSharding(mesh, P("pop"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard a global batch over the 'data' axis (grad psum over ICI)."""
    return NamedSharding(mesh, P("data"))


def shard_population(tree, mesh: Mesh):
    """Place a stacked population pytree with the pop axis sharded and all
    trailing axes replicated."""
    def place(x):
        spec = P(*(("pop",) + (None,) * (np.ndim(x) - 1)))
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree.map(place, tree)


def distributed_init(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Initialize multi-host JAX (ICI within slice, DCN across slices).
    No-op when running single-process."""
    if num_processes is None or num_processes <= 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
