"""QLinear: drop-in quantized linear (reference L3, `protoquant.QLinear`).

The reference wraps a CUDA fused path behind an ``nn.Linear`` subclass
(SURVEY.md §2.1 R2, §3.2); the TPU-native analogue is a flax module whose
quantized kernel is a QTensor *pytree-valued parameter* — it flows through
jit/pjit, shards over meshes, and checkpoints like any other param.

Modes (SURVEY.md §1.2):
  * "dynamic":     rowquant(x) -> int8x int8 MXU matmul -> fused fp32 epilogue
  * "weight_only": int8 weight dequantized in-kernel -> bf16 MXU matmul
  * "fp":          plain dense (the un-quantized baseline / pre-conversion)
"""

from __future__ import annotations

from typing import Any, Callable

import flax.linen as nn
import jax
import jax.numpy as jnp

from .. import ops
from ..core.qtensor import QTensor

Initializer = Callable[..., Any]

# Trace-time calibration switch (set via nn.gptq.collect_grams): when True,
# every QLinear sows the Gram matrix of its input (sum over tokens of
# x^T x, [K, K] f32) into the "calib" collection — the Hessian proxy GPTQ's
# error-compensated rounding needs. Module-global like ops.LINEAR_BACKEND:
# calibration runs are fresh traces, so flipping it between applies is safe.
CALIB_MODE = False

# Static-activation calibration switch (set via nn.static.calibrate_static):
# when True, every fp-mode QLinear sows its input's ABS-MAX (scalar, max-
# reduced over calibration batches) into "calib" — the per-tensor activation
# scale the mode="static" W8A8 path serves with.
STATIC_CALIB = False


def pick_int4_group(k: int, want: int = 128) -> int:
    """Largest even group <= want that divides K (small models / odd K)."""
    import math

    g = math.gcd(k, want)
    if g % 2:
        g = math.gcd(k, 2 * want)
        if g % 2:
            raise ValueError(f"in_features={k} cannot form an even int4 group")
    return g


def _qtensor4_init(
    kernel_init: Initializer, shape, param_dtype, group: int = 128,
    storage: str = "packed",
):
    from ..core.qtensor import QTensor4

    def init(key):
        w = kernel_init(key, shape, param_dtype)
        return QTensor4.quantize(
            w, group=pick_int4_group(shape[0], group), storage=storage
        )

    return init


def _qtensor_init(kernel_init: Initializer, shape, param_dtype):
    """Draw an fp kernel and quantize it — standalone init path (tests/toy
    models); real checkpoints arrive via nn.convert.quantize_params."""

    def init(key):
        w = kernel_init(key, shape, param_dtype)
        return QTensor.quantize(w, axis=0)

    return init


def _qtensorf8_init(kernel_init: Initializer, shape, param_dtype,
                    group: int = 0):
    from ..core.qtensor import QTensorF8

    def init(key):
        w = kernel_init(key, shape, param_dtype)
        return QTensorF8.quantize(w, axis=0, group=group)

    return init


class QLinear(nn.Module):
    """Quantized (or fp) linear layer: y = x @ W + b.

    Weight layout is [K, N] = [in_features, features] with per-output-channel
    (axis N) scales, exactly the reference's per-channel scheme.
    """

    features: int
    mode: str = "dynamic"  # "dynamic" | "weight_only" | "fp"
    use_bias: bool = True
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32
    kernel_init: Initializer = nn.initializers.lecun_normal()
    bias_init: Initializer = nn.initializers.zeros_init()
    # Tensor parallelism: for a row-parallel layer (kernel sharded on K) run
    # inside shard_map, partial sums are all-reduced over this mesh axis
    # (SURVEY.md §2.2 TP). None => no collective.
    psum_axis: str | None = None
    # Sequence parallelism: replace the all-reduce with a reduce-scatter over
    # the token axis (axis 1 of [B, T, N]) so the output returns to the
    # token-sharded layout of the surrounding norm region (SURVEY.md §2.2 SP).
    scatter_tokens: bool = False
    # Overlapped collective matmul for the row-parallel reduction: the ring
    # reduce-scatter fused with chunked matmuls (parallel/collective.py) —
    # each ppermute hop rides ICI while the next chunk multiplies on the MXU
    # (SURVEY.md §5.8 mechanism 2). Requires ``tp`` (the psum_axis size).
    collective: bool = False
    tp: int = 1
    # Quantization-group size for mode="weight_only_int4" (must match the
    # QuantConfig used at conversion; under TP it must divide K/tp).
    int4_group: int = 128
    # int4 payload layout (must match QuantConfig.int4_storage at convert):
    # "packed" bytes (Pallas wo4) or "native" XLA s4 (XLA backend only).
    int4_storage: str = "packed"
    # fp8 scale granularity for mode="weight_only_fp8": 0 = per-channel,
    # g > 0 = per-(K-group, channel) (must match QuantConfig.fp8_group).
    fp8_group: int = 0
    # LoRA adapter on top of the (quantized) base weight: rank 0 = off.
    # y += (x @ A) @ B * (alpha / rank), A [K, r], B [r, N] fp32 — the
    # standard quantized-base + fp-adapter serving recipe (the base stays
    # int8/int4/fp8 in HBM; the adapter adds 2*r*(K+N)/... ~ negligible
    # bytes and rides the residual stream in fp). Under TP row-parallelism
    # A shards on K and the LoRA partial sums join the same psum as the
    # base matmul (added pre-reduce).
    lora_rank: int = 0
    lora_alpha: float = 16.0
    # Multi-LoRA: number of stacked adapters (0 = single adapter). When >0
    # the adapter params gain a leading [n] axis and every call must pass
    # ``adapter_ids`` [B] selecting one adapter per batch row (id 0 is the
    # reserved zero adapter = base model).
    lora_stack: int = 0

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, prequantized=None, adapter_ids=None
    ) -> jnp.ndarray:
        """``prequantized``: optional (xq int8, s_x) from a shared rowquant
        pass — sibling projections reading the same activation (q/k/v,
        gate/up) quantize it once in the parent block (the reference's
        'fuse rowquant into the producer' move, SURVEY.md §8.3.3).

        ``adapter_ids`` [B] int32: multi-LoRA — when the checkpoint carries
        STACKED adapters (lora_a [n, K, r] / lora_b [n, r, N], see
        nn/lora.py::attach_lora_stack), each batch row applies its own
        adapter. Required iff the params are stacked; id 0 is the reserved
        zero adapter (= base model)."""
        in_features = x.shape[-1]
        x = x.astype(self.dtype)
        if CALIB_MODE:
            xf = x.reshape(-1, in_features).astype(jnp.float32)
            self.sow(
                "calib",
                "gram",
                xf.T @ xf,
                reduce_fn=lambda prev, new: prev + new,
                init_fn=lambda: jnp.zeros(()),
            )
        if STATIC_CALIB and self.mode == "fp":
            self.sow(
                "calib",
                "act_amax",
                jnp.max(jnp.abs(x.astype(jnp.float32))),
                reduce_fn=jnp.maximum,
                init_fn=lambda: jnp.zeros(()),
            )
        bias = (
            self.param("bias", self.bias_init, (self.features,), self.param_dtype)
            if self.use_bias
            else None
        )

        # Bias rides the kernels' fused fp32 epilogue except in the
        # row-parallel case, where it must wait for the all-reduce (otherwise
        # every shard would add it).
        fused_bias = bias if self.psum_axis is None else None

        if self.mode == "fp":
            kernel = self.param(
                "kernel",
                self.kernel_init,
                (in_features, self.features),
                self.param_dtype,
            )
            y = jnp.matmul(x, kernel.astype(self.dtype))
            if fused_bias is not None:
                y = y + fused_bias.astype(self.dtype)
        elif self.mode == "dynamic":
            qkernel: QTensor = self.param(
                "qkernel",
                _qtensor_init(
                    self.kernel_init, (in_features, self.features), self.param_dtype
                ),
            )
            if self.psum_axis is not None and self.collective:
                from ..parallel.collective import dynamic_qlinear_collective

                y = dynamic_qlinear_collective(
                    x, qkernel.data, qkernel.scale, self.psum_axis, self.tp,
                    scatter_tokens=self.scatter_tokens, out_dtype=jnp.float32,
                )
                if self.lora_rank > 0:
                    y = y + self._lora_delta_reduced(x, adapter_ids)
                return self._finish_reduced(y, bias)
            if ops.resolve_linear_backend(
                x.size // in_features, in_features, self.features
            ) == "xla":
                if (prequantized is None
                        and ops.resolve_rowquant_backend(
                            x.size // in_features) == "pallas"):
                    # Standalone projections (o_proj/down_proj — no shared
                    # producer quant): the rowquant kernel's one-pass
                    # amax+cast beats XLA's reduction+rescale at prefill
                    # (BASELINE.md prefill decomposition, round 4).
                    prequantized = ops.rowquant(x)
                y = ops.dynamic_qlinear_xla(
                    x, qkernel.data, qkernel.scale, fused_bias,
                    out_dtype=self.dtype, prequantized=prequantized,
                )
            elif prequantized is not None:
                xq, s_x = prequantized
                y = ops.qmatmul(
                    xq, qkernel.data, s_x, qkernel.scale, fused_bias,
                    out_dtype=self.dtype,
                )
            else:
                y = ops.dynamic_qlinear(
                    x, qkernel.data, qkernel.scale, fused_bias, out_dtype=self.dtype
                )
        elif self.mode == "static":
            # W8A8 with a calibrated per-tensor activation scale: no amax
            # reduction at inference (the dynamic rowquant's unoverlappable
            # VPU pass — BASELINE.md prefill decomposition); the
            # multiply+round+cast fuses into the dot operand. Always the
            # XLA formulation (a fusion play, not a kernel one).
            qkernel = self.param(
                "qkernel",
                _qtensor_init(
                    self.kernel_init, (in_features, self.features),
                    self.param_dtype,
                ),
            )
            act_scale = self.param(
                "act_scale", lambda key: jnp.ones((), jnp.float32)
            )
            y = ops.static_qlinear_xla(
                x, qkernel.data, qkernel.scale, act_scale, fused_bias,
                out_dtype=self.dtype,
            )
        elif self.mode == "weight_only":
            qkernel = self.param(
                "qkernel",
                _qtensor_init(
                    self.kernel_init, (in_features, self.features), self.param_dtype
                ),
            )
            if self.psum_axis is not None and self.collective:
                from ..parallel.collective import weight_only_qlinear_collective

                y = weight_only_qlinear_collective(
                    x, qkernel.data, qkernel.scale, self.psum_axis, self.tp,
                    scatter_tokens=self.scatter_tokens, out_dtype=jnp.float32,
                )
                if self.lora_rank > 0:
                    y = y + self._lora_delta_reduced(x, adapter_ids)
                return self._finish_reduced(y, bias)
            if ops.resolve_linear_backend(
                x.size // in_features, in_features, self.features
            ) == "xla":
                y = ops.weight_only_matmul_xla(
                    x, qkernel.data, qkernel.scale, fused_bias, out_dtype=self.dtype
                )
            else:
                y = ops.weight_only_matmul(
                    x, qkernel.data, qkernel.scale, fused_bias, out_dtype=self.dtype
                )
        elif self.mode == "weight_only_fp8":
            # e4m3 payload, per-channel f32 scales. Always the XLA
            # formulation: the f8->bf16 convert rides the dot operand (same
            # HBM bytes as int8 weight-only; no Pallas fp8 tier on v5e —
            # there is no native fp8 MXU rate to chase, only the byte win).
            qkernel = self.param(
                "qkernel",
                _qtensorf8_init(
                    self.kernel_init, (in_features, self.features),
                    self.param_dtype, self.fp8_group,
                ),
            )
            if self.fp8_group > 0:
                y = ops.weight_only_fp8_group_matmul_xla(
                    x, qkernel.data, qkernel.scale, self.fp8_group,
                    fused_bias, out_dtype=self.dtype,
                )
            else:
                y = ops.weight_only_matmul_xla(
                    x, qkernel.data, qkernel.scale, fused_bias,
                    out_dtype=self.dtype,
                )
        elif self.mode == "weight_only_int4":
            qkernel = self.param(
                "qkernel",
                _qtensor4_init(
                    self.kernel_init,
                    (in_features, self.features),
                    self.param_dtype,
                    self.int4_group,
                    self.int4_storage,
                ),
            )
            # Native-s4 storage is only consumable by the XLA formulation
            # (the Pallas wo4 kernel reads the byte-packed layout).
            native = qkernel.data.dtype == jnp.int4
            wo4 = (
                ops.weight_only_int4_matmul_xla
                if native or ops.resolve_linear_backend(
                    x.size // in_features, in_features, self.features
                ) == "xla"
                else ops.weight_only_int4_matmul
            )
            y = wo4(
                x,
                qkernel.data,
                qkernel.scale,
                group=qkernel.group,
                bias=fused_bias,
                out_dtype=self.dtype,
            )
        elif self.mode == "dynamic_int4":
            # W4A8: packed int4 weights (quarter bytes) x dynamic int8
            # activations on the INT8 MXU (2x the bf16 rate the wo4 path
            # uses) — ops/w4a8_matmul.py. Packed storage only: the kernel
            # unpacks nibbles to exact int8 values in VMEM.
            qkernel = self.param(
                "qkernel",
                _qtensor4_init(
                    self.kernel_init,
                    (in_features, self.features),
                    self.param_dtype,
                    self.int4_group,
                    "packed",
                ),
            )
            if prequantized is not None:
                xq, s_x = prequantized
            else:
                xq, s_x = ops.shared_rowquant(x)
            y = ops.w4a8_matmul(
                xq, s_x, qkernel.data, qkernel.scale,
                group=qkernel.group, bias=fused_bias, out_dtype=self.dtype,
                formulation=ops.resolve_w4a8_formulation(),
            )
        else:
            raise ValueError(f"unknown mode {self.mode!r}")

        if self.lora_rank > 0:
            shape_a = (in_features, self.lora_rank)
            shape_b = (self.lora_rank, self.features)
            if self.lora_stack > 0:
                shape_a = (self.lora_stack,) + shape_a
                shape_b = (self.lora_stack,) + shape_b
            lora_a = self.param(
                "lora_a", nn.initializers.lecun_normal(), shape_a, jnp.float32
            )
            lora_b = self.param(
                "lora_b", nn.initializers.zeros_init(), shape_b, jnp.float32
            )
            # fp adapter path on the same activation the base consumed; the
            # [.., r] bottleneck keeps this O(r/N) of the base matmul cost.
            if lora_a.ndim == 3:
                # Multi-LoRA: per-batch-row adapter gather. The gathered
                # [B, K, r]/[B, r, N] slices stream r*(K+N) bytes per live
                # adapter — O(r/N) of the base weight traffic.
                if adapter_ids is None:
                    raise ValueError(
                        "stacked LoRA params need adapter_ids (multi-LoRA)"
                    )
                xf = x.astype(jnp.float32)
                if xf.ndim == 2:  # [B, K] -> treat tokens axis of size 1
                    xf = xf[:, None, :]
                a_g = lora_a[adapter_ids]  # [B, K, r]
                b_g = lora_b[adapter_ids]  # [B, r, N]
                delta = jnp.einsum("btk,bkr->btr", xf, a_g)
                delta = jnp.einsum("btr,brn->btn", delta, b_g)
                delta = delta.reshape(*x.shape[:-1], self.features)
            else:
                delta = (
                    x.astype(jnp.float32).reshape(-1, in_features) @ lora_a
                ) @ lora_b
                delta = delta.reshape(*x.shape[:-1], self.features)
            y = y + (delta * (self.lora_alpha / self.lora_rank)).astype(y.dtype)

        if self.psum_axis is not None:
            if self.scatter_tokens:
                y = jax.lax.psum_scatter(
                    y, self.psum_axis, scatter_dimension=1, tiled=True
                )
            else:
                y = jax.lax.psum(y, self.psum_axis)
            if bias is not None:
                y = (y + bias.astype(jnp.float32)).astype(self.dtype)
        return y

    def _finish_reduced(self, y: jnp.ndarray, bias) -> jnp.ndarray:
        """Post-reduction epilogue for the collective-matmul path (the ring
        already produced fully-reduced outputs, so no psum here)."""
        if bias is not None:
            y = y + bias.astype(jnp.float32)
        return y.astype(self.dtype)

    def _lora_delta_reduced(self, x, adapter_ids):
        """Adapter correction for the collective-ring path (VERDICT r3
        item 9): the ring returns fully reduced (or token-scattered)
        outputs, so the adapter's K-sharded partial reduces separately —
        a psum (or psum_scatter over the token axis, matching
        scatter_tokens) of the rank-r intermediate t = x @ A. Reducing
        [.., r] instead of [.., N] keeps the extra wire bytes at O(r/N) of
        the ring's own traffic."""
        in_features = x.shape[-1]
        shape_a = (in_features, self.lora_rank)
        shape_b = (self.lora_rank, self.features)
        if self.lora_stack > 0:
            shape_a = (self.lora_stack,) + shape_a
            shape_b = (self.lora_stack,) + shape_b
        lora_a = self.param(
            "lora_a", nn.initializers.lecun_normal(), shape_a, jnp.float32
        )
        lora_b = self.param(
            "lora_b", nn.initializers.zeros_init(), shape_b, jnp.float32
        )
        xf = x.astype(jnp.float32)
        squeeze = False
        if xf.ndim == 2:
            xf = xf[:, None, :]
            squeeze = True
        if lora_a.ndim == 3:
            if adapter_ids is None:
                raise ValueError(
                    "stacked LoRA params need adapter_ids (multi-LoRA)"
                )
            t = jnp.einsum("btk,bkr->btr", xf, lora_a[adapter_ids])
        else:
            t = jnp.einsum("btk,kr->btr", xf, lora_a)
        if self.scatter_tokens:
            t = jax.lax.psum_scatter(
                t, self.psum_axis, scatter_dimension=1, tiled=True
            )
        else:
            t = jax.lax.psum(t, self.psum_axis)
        if lora_b.ndim == 3:
            delta = jnp.einsum("btr,brn->btn", t, lora_b[adapter_ids])
        else:
            delta = jnp.einsum("btr,rn->btn", t, lora_b)
        if squeeze:
            delta = delta[:, 0, :]
        return delta * (self.lora_alpha / self.lora_rank)
