"""Device meshes and sharded gate execution.

TPU-native replacement for the reference's parallel runtimes (SURVEY.md §2c):
OpenMP `parallel for` over parties / gate batches (src/
threshold_decryption_functions.cpp:407, src/KNN_medical_data.cpp:681) and the
Julia Distributed.jl fan-out (3-gen-mk-tfhe/VolumeMatching.jl:1-81). Instead of
threads and RPC, one `jax.sharding.Mesh` spans the chips:

  * axis "batch"  — data parallelism over independent ciphertexts/gates. The
    bootstrapping key and keyswitch table are replicated; each chip blind-
    rotates its shard of the gate batch. This is the throughput axis
    (BASELINE: bootsAND gates/s).
  * axis "party"  — the multikey / threshold party dimension. Per-party
    partial decryptions and per-party keyswitch contributions reduce with
    `psum` over this axis (the reference's `reduce(+, ...)` at
    mk_internals.jl:90,724,742 and the omp-critical accumulation at
    threshold_decryption_functions.cpp:423-431).

Multi-host: the same mesh built from `jax.devices()` after
`jax.distributed.initialize()` spans DCN; nothing below changes.
"""

from __future__ import annotations

from typing import Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

BATCH_AXIS = "batch"
PARTY_AXIS = "party"


def make_mesh(n_batch: int | None = None, n_party: int = 1,
              devices: Sequence[jax.Device] | None = None) -> Mesh:
    """Build a (batch, party) mesh over the available devices.

    With ``n_batch=None`` all remaining devices go to the batch axis.
    """
    devices = list(devices if devices is not None else jax.devices())
    if n_batch is None:
        n_batch = len(devices) // n_party
    use = np.asarray(devices[: n_batch * n_party]).reshape(n_batch, n_party)
    return Mesh(use, (BATCH_AXIS, PARTY_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding for (B, ...) ciphertext arrays: batch axis split over chips."""
    return NamedSharding(mesh, P(BATCH_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    """Sharding for keys (BK/KSK): replicated on every chip."""
    return NamedSharding(mesh, P())


def shard_lwe_batch(sample, mesh: Mesh):
    """Place a batched LweSample so its leading axis is split over `batch`."""
    from ..lwe import LweSample

    sh = batch_sharding(mesh)
    return LweSample(jax.device_put(sample.a, sh), jax.device_put(sample.b, sh))


def replicate_cloud_key(ck, mesh: Mesh):
    """Replicate a CloudKey pytree onto every device of the mesh."""
    rep = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, rep), ck)


def pad_to_multiple(n: int, m: int) -> int:
    return -(-n // m) * m
