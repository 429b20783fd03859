"""Device placement helpers.

Key generation is a one-time host-friendly job (SURVEY.md §7): its many small
sampling/packing ops would each pay a dispatch round-trip on a remote TPU, so
keygen runs on the local CPU backend and ships the finished key material to
the accelerator in one transfer — the TPU analogue of the reference doing all
keygen CPU-side before exporting key files (src/KeyGen.cpp:31-57).
"""

from __future__ import annotations

import contextlib

import jax


def cpu_device():
    return jax.devices("cpu")[0]


@contextlib.contextmanager
def on_host():
    """Run enclosed jax ops on the CPU backend (keygen, packing)."""
    with jax.default_device(cpu_device()):
        yield


def to_device(tree, device=None):
    """Move every array leaf of a pytree to ``device`` (default: the default
    accelerator) in one batched transfer."""
    if device is None:
        device = jax.devices()[0]
    return jax.tree.map(
        lambda x: jax.device_put(x, device) if hasattr(x, "dtype") else x, tree)
