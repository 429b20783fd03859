"""Keyed random sampling on the torus, built on jax.random.

Replaces the reference's stateful RNG paths (Julia MersenneTwister in
3-gen-mk-tfhe/src/numeric-functions.jl:7-62, C++ tfhe generator seeded with
{100, 20032, 21341} in src/libthfhe.cpp:362-363) with counter-based, splittable
jax PRNG keys so every keygen/encrypt is a pure function of its key — the
functional idiom jit/vmap/shard_map need.

Bit-exact keystream parity with the reference RNGs is deliberately not
attempted; correctness parity is established instead by exact round-trip and
noise-statistics tests plus the _wo_FFT-style exact-arithmetic kernel oracles
(see tests/), mirroring the reference's own statistical test strategy
(SURVEY.md §4).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .torus import double_to_torus


def uniform_torus(key, shape, dtype=jnp.int32):
    """Uniform torus elements: uniform bits reinterpreted as signed ints.

    Reference: rand_uniform_torus32/64 (numeric-functions.jl:36-44).
    """
    bits = jnp.dtype(dtype).itemsize * 8
    if bits == 32:
        raw = jax.random.bits(key, shape, dtype=jnp.uint32)
        return jax.lax.bitcast_convert_type(raw, jnp.int32)
    # build 64-bit values from two 32-bit draws (works without x64 for the draw)
    raw = jax.random.bits(key, shape + (2,), dtype=jnp.uint32).astype(jnp.uint64)
    combined = (raw[..., 0] << 32) | raw[..., 1]
    return jax.lax.bitcast_convert_type(combined, jnp.int64)


def uniform_binary(key, shape, dtype=jnp.int32):
    """Uniform bits in {0, 1} (rand_uniform_bool, numeric-functions.jl:18-20)."""
    return jax.random.bernoulli(key, 0.5, shape).astype(dtype)


NEGATIVE_BINARY_WEIGHT = 0.113546097609674  # numeric-functions.jl:12


def negative_binary(key, shape, dtype=jnp.int32):
    """Ternary key distribution {-1, 0, 1} with P(+-1) = 0.1135...

    Reference: rand_negative_binary (numeric-functions.jl:11-13).
    """
    u = jax.random.uniform(key, shape)
    w = NEGATIVE_BINARY_WEIGHT
    return (jnp.where(u < w, -1, 0) + jnp.where(u >= 1.0 - w, 1, 0)).astype(dtype)


def uniform_ternary(key, shape, dtype=jnp.int32):
    """Uniform {-1, 0, 1} (rand_uniform_negative_binary, numeric-functions.jl:7-9)."""
    return jax.random.randint(key, shape, -1, 2, dtype=jnp.int32).astype(dtype)


def gaussian_torus(key, message, sigma: float, shape, dtype=jnp.int32):
    """Gaussian sample on the torus centred at ``message`` with stddev ``sigma``.

    Reference: rand_gaussian_torus32/64 (numeric-functions.jl:52-60):
    message + dtot(randn() * sigma).
    """
    err = jax.random.normal(key, shape, dtype=jnp.float32) * np.float32(sigma)
    return jnp.asarray(message, dtype) + double_to_torus(err, dtype)


def gaussian_float(key, sigma: float, shape):
    """Plain float gaussian noise (rand_gaussian_float, numeric-functions.jl:47-49)."""
    return jax.random.normal(key, shape, dtype=jnp.float32) * np.float32(sigma)
