"""Shared helpers for the Pallas kernel tier."""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def cdiv(a: int, b: int) -> int:
    return -(-a // b)


def round_up(x: int, m: int) -> int:
    return cdiv(x, m) * m


@functools.cache
def on_tpu() -> bool:
    return jax.default_backend() == "tpu"


def default_interpret() -> bool:
    """Pallas kernels compile via Mosaic on TPU and run interpreted elsewhere
    (the CPU test path — SURVEY.md §4.2)."""
    return not on_tpu()


def pad_dim(x: jnp.ndarray, axis: int, target: int, value=0):
    """Pad ``axis`` of x up to ``target`` with ``value``."""
    pad = target - x.shape[axis]
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths, constant_values=value)


def pick_block(dim: int, preferred: int, multiple: int) -> int:
    """Block size: `preferred` when the dim is big enough, else the dim
    rounded up to the hardware `multiple` (keeps tiny shapes single-block)."""
    if dim >= preferred:
        return preferred
    return round_up(max(dim, 1), multiple)
