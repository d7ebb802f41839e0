"""QTensor: the quantized-tensor container (reference L2, `protoquant.QTensor`).

A registered JAX pytree holding an int8 payload plus fp32 scales and static
layout metadata. Unlike the reference's torch Tensor subclass (reconstructed
in SURVEY.md §2.1 R3 — source unavailable), a TPU-native QTensor is a plain
immutable pytree: it flows through jit/pjit/shard_map, shards over meshes
(int8 payload sharded like its fp parent; tiny fp32 scale vectors replicated
or sharded with their channel axis), and checkpoints via orbax.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp

from . import numerics


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["data", "scale"],
    meta_fields=["axis", "orig_dtype_name"],
)
@dataclasses.dataclass(frozen=True)
class QTensor:
    """int8 payload + per-axis fp32 scales.

    Attributes:
      data: int8 array, same shape as the original tensor.
      scale: f32 array, shape = data.shape with ``axis`` removed.
      axis: the axis of ``data`` that ``scale`` was reduced over (i.e. the
        quantization-group axis). For a [K, N] weight with per-output-channel
        scales this is 0. Normalized to be non-negative.
      orig_dtype_name: dtype name of the tensor before quantization, so
        dequantize can restore it.
    """

    data: jnp.ndarray
    scale: jnp.ndarray
    axis: int
    orig_dtype_name: str = "float32"

    # -- construction ------------------------------------------------------

    @classmethod
    def quantize(cls, x: jnp.ndarray, axis: int = 0) -> "QTensor":
        """Symmetric per-channel int8 quantization along ``axis``."""
        axis = axis % x.ndim
        q, s = numerics.quantize_channelwise(x, axis=axis)
        return cls(data=q, scale=s, axis=axis, orig_dtype_name=jnp.dtype(x.dtype).name)

    @classmethod
    def quantize_rowwise(cls, x: jnp.ndarray) -> "QTensor":
        """Dynamic per-row (last-axis-reduced) quantization."""
        q, s = numerics.quantize_rowwise(x)
        return cls(
            data=q, scale=s, axis=x.ndim - 1, orig_dtype_name=jnp.dtype(x.dtype).name
        )

    # -- views -------------------------------------------------------------

    @property
    def shape(self):
        return self.data.shape

    @property
    def ndim(self):
        return self.data.ndim

    @property
    def orig_dtype(self):
        return jnp.dtype(self.orig_dtype_name)

    def dequantize(self) -> jnp.ndarray:
        return numerics.dequantize(self.data, self.scale, self.axis).astype(
            self.orig_dtype
        )

    def transpose(self) -> "QTensor":
        """2D transpose; scale axis follows its channel."""
        if self.data.ndim != 2:
            raise ValueError("QTensor.transpose supports 2D tensors only")
        return QTensor(
            data=self.data.T,
            scale=self.scale,
            axis=1 - self.axis,
            orig_dtype_name=self.orig_dtype_name,
        )

    def nbytes(self) -> int:
        return self.data.size + self.scale.size * 4

    def __repr__(self):  # pragma: no cover
        return (
            f"QTensor(shape={tuple(self.shape)}, axis={self.axis}, "
            f"orig_dtype={self.orig_dtype_name})"
        )


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["data", "scale"],
    meta_fields=["group", "orig_k", "orig_dtype_name"],
)
@dataclasses.dataclass(frozen=True)
class QTensor4:
    """INT4 group-wise weight container (extension beyond the reference).

    Two storage layouts, distinguished by ``data.dtype``:
      * "packed" (int8 [K/2, N]): two 4-bit values per byte packed along K
        (byte i = k=i low nibble, k=i+K/2 high nibble) — consumed by the
        Pallas wo4 kernel's in-VMEM unpack.
      * "native" (jnp.int4 [K, N]): XLA's own s4 dtype — XLA:TPU stores s4
        packed in HBM and owns the unpack, so the convert fuses into the dot
        operand instead of burning VPU shifts (see ops/xla_backend.py).
    scale: f32 [K/group, N]; group: static contraction-group size.
    """

    data: jnp.ndarray
    scale: jnp.ndarray
    group: int
    orig_k: int
    orig_dtype_name: str = "float32"

    @classmethod
    def quantize(
        cls, w: jnp.ndarray, group: int = 128, storage: str = "packed",
        clip: str = "mse",
    ) -> "QTensor4":
        """2D [K, N] weights, or 3D [E, K, N] stacked MoE expert weights
        (models/moe.py): each expert quantizes/packs independently along its
        own K — data [E, K/2, N] packed (or [E, K, N] native s4), scales
        [E, K/group, N]."""
        if w.ndim == 3:
            q, s = jax.vmap(
                lambda we: numerics.quantize_groupwise_int4(
                    we, group=group, clip=clip
                )
            )(w)
            if storage == "native":
                data = q.astype(jnp.int4)
            elif storage == "packed":
                data = jax.vmap(
                    lambda qe: numerics.pack_int4(qe, group)
                )(q)
            else:
                raise ValueError(f"unknown int4 storage {storage!r}")
            return cls(
                data=data,
                scale=s,
                group=group,
                orig_k=w.shape[1],
                orig_dtype_name=jnp.dtype(w.dtype).name,
            )
        q, s = numerics.quantize_groupwise_int4(w, group=group, clip=clip)
        if storage == "native":
            data = q.astype(jnp.int4)
        elif storage == "packed":
            data = numerics.pack_int4(q, group)
        else:
            raise ValueError(f"unknown int4 storage {storage!r}")
        return cls(
            data=data,
            scale=s,
            group=group,
            orig_k=w.shape[0],
            orig_dtype_name=jnp.dtype(w.dtype).name,
        )

    @property
    def storage(self) -> str:
        return "native" if self.data.dtype == jnp.int4 else "packed"

    @property
    def shape(self):
        return (self.orig_k, self.data.shape[1])

    def dequantize(self) -> jnp.ndarray:
        if self.storage == "native":
            q = self.data.astype(jnp.int8)
        else:
            q = numerics.unpack_int4(self.data, self.group)
        k, n = q.shape
        w = (
            q.astype(jnp.float32).reshape(k // self.group, self.group, n)
            * self.scale[:, None, :]
        ).reshape(k, n)
        return w.astype(jnp.dtype(self.orig_dtype_name))

    def nbytes(self) -> int:
        payload = (
            self.data.size // 2 if self.storage == "native" else self.data.size
        )  # s4 is packed 2-per-byte in device memory either way
        return payload + self.scale.size * 4


_E4M3_MAX = 448.0  # largest finite float8_e4m3fn value


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["data", "scale"],
    meta_fields=["axis", "orig_dtype_name", "group"],
)
@dataclasses.dataclass(frozen=True)
class QTensorF8:
    """float8 (e4m3) weight container (extension beyond the reference).

    Same container contract as QTensor — data payload + per-channel f32
    scales reduced over ``axis`` — but the payload is float8_e4m3fn: 4
    exponent bits give per-element dynamic range, so fp8 needs no rounding
    contract and degrades gracefully on outliers (3 mantissa bits -> max
    relative error 2^-4 per element). Same HBM byte win as int8 weight-only.
    Consumed by the XLA formulation only (the cast-to-bf16 rides the dot
    operand); there is no Pallas fp8 kernel tier on this target.
    """

    data: jnp.ndarray
    scale: jnp.ndarray
    axis: int
    orig_dtype_name: str = "float32"
    # Contraction-group size: 0 = one scale per output channel (scale [N]);
    # g > 0 = one scale per (K-group, channel) (scale [K/g, N]) — recovers
    # mantissa resolution when a channel's amax is set by a few in-channel
    # outliers (measured: ~2x rmse reduction at g=32 in that regime;
    # Gaussian weights barely move — fp8 is mantissa-bound there).
    group: int = 0

    @classmethod
    def quantize(cls, x: jnp.ndarray, axis: int = 0, group: int = 0) -> "QTensorF8":
        """Per-channel (group=0) or per-(K-group, channel) scaling into the
        e4m3 representable range. Group-wise requires 2-D [K, N], axis=0."""
        axis = axis % x.ndim
        xf = x.astype(jnp.float32)
        if group > 0:
            if x.ndim != 2 or axis != 0:
                raise ValueError("group-wise fp8 needs a 2-D [K, N] kernel")
            K, N = xf.shape
            if K % group:
                raise ValueError(f"K={K} not divisible by fp8 group={group}")
            wg = xf.reshape(K // group, group, N)
            amax = jnp.max(jnp.abs(wg), axis=1)  # [K/g, N]
            s = jnp.maximum(amax / _E4M3_MAX, 1e-12)
            q = (wg / s[:, None, :]).astype(jnp.float8_e4m3fn).reshape(K, N)
            return cls(
                data=q, scale=s, axis=axis, group=group,
                orig_dtype_name=jnp.dtype(x.dtype).name,
            )
        amax = jnp.max(jnp.abs(xf), axis=axis)
        s = jnp.maximum(amax / _E4M3_MAX, 1e-12)
        q = (xf / jnp.expand_dims(s, axis)).astype(jnp.float8_e4m3fn)
        return cls(
            data=q, scale=s, axis=axis,
            orig_dtype_name=jnp.dtype(x.dtype).name,
        )

    @property
    def shape(self):
        return self.data.shape

    @property
    def ndim(self):
        return self.data.ndim

    def dequantize(self) -> jnp.ndarray:
        if self.group > 0:
            K, N = self.data.shape
            wg = self.data.astype(jnp.float32).reshape(-1, self.group, N)
            w = (wg * self.scale[:, None, :]).reshape(K, N)
        else:
            w = self.data.astype(jnp.float32) * jnp.expand_dims(
                self.scale, self.axis
            )
        return w.astype(jnp.dtype(self.orig_dtype_name))

    def nbytes(self) -> int:
        return self.data.size + self.scale.size * 4


def quantize(x: jnp.ndarray, axis: int = 0) -> QTensor:
    """Module-level convenience mirroring the reference's `quantize()` entry."""
    return QTensor.quantize(x, axis=axis)


def is_qtensor(x: Any) -> bool:
    return isinstance(x, QTensor)
