"""Explicit-DMA ring reduce-scatter matmul (SURVEY.md §5.8 mechanism 2,
"hand-written" tier; VERDICT r2 item 5 / ROADMAP item 1).

The ppermute tier (parallel/collective.py) decomposes the row-parallel
all-reduce into a ring of chunk matmuls and lets XLA's async
collective-permute + latency-hiding scheduler overlap each hop with the
next chunk's GEMM. This module is the second tier the survey names: the
SAME ring schedule as ONE Pallas kernel that drives the inter-chip DMAs
itself with ``pltpu.make_async_remote_copy`` — the partial-accumulator hop
to the right neighbor is started explicitly and overlaps the local chunk
GEMM on the MXU, with semaphores (not the XLA scheduler) pinning the
schedule.

Numerics match the ppermute tier by construction: the same int8 x int8 ->
int32 chunk GEMM, the same rank-1 f32 epilogue expression, and the same
ring addition order (partial arrives, local contribution adds, ring order).
The integer ring arithmetic is BITWISE-exact-match tested against the
ppermute tier on a simulated mesh in TPU interpret mode; with real f32
scales the two separately-compiled programs may differ by FMA-contraction
ulps (the compiler is free to contract the epilogue multiply into the ring
add differently per program), which the test bounds at float32-ulp scale
(tests/test_collective.py).

Scope: whole-operand VMEM kernel (no HBM grid) — decode/small-M shapes,
where the exposed all-reduce dominates and explicit scheduling pays. Large
prefill shapes should stay on the ppermute tier, whose chunk GEMMs tile
through the normal matmul pipeline. Selection lives in
``parallel.collective.RING_BACKEND`` ("ppermute" default, "dma" opt-in;
decision record in the module docstring there).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ._common import default_interpret

# Distinct collective_id for the ring's neighborhood barrier semaphore
# (must not collide with other collective Pallas kernels in one program).
_COLLECTIVE_ID = 7


def _ring_kernel(axis, tp, nc, xq_ref, sx_ref, wq_ref, sw_ref,
                 out_ref, comm_ref, send_sem, recv_sem, credit_sem):
    """One SPMD instance of the reduce-scatter ring.

    comm_ref [2, M, nc] f32: double-buffered partial accumulator. Step s
    sends slot (s-1)%2 to the RIGHT neighbor while the incoming partial from
    the LEFT lands in slot s%2; the local contribution for the chunk that
    terminates here after the remaining hops is added before forwarding.

    Flow control (credit_sem, found by interpret-mode race detection): a
    device running ahead could land its step-(s+2) copy in the neighbor's
    slot while the neighbor is still accumulating its step-s arrival there.
    So the receiver returns a per-slot credit to its LEFT sender once the
    slot's outbound send has completed (the data is safely forwarded), and
    a sender blocks on the slot's credit before re-targeting it. Verified
    race-free under ``InterpretParams(detect_races=True)``.
    """
    my = jax.lax.axis_index(axis)
    # MESH device ids as {ring_axis: index}: the target shares this device's
    # coordinates on every other mesh axis, so the ring stays within its
    # row of a product (e.g. data x model) mesh — no full-mesh coordinates
    # needed.
    right = jax.lax.rem(my + 1, tp)
    left = jax.lax.rem(my + tp - 1, tp)

    # Neighborhood barrier: both neighbors must have entered the kernel
    # (comm buffers live) before any RDMA lands.
    barrier = pltpu.get_barrier_semaphore()
    pltpu.semaphore_signal(barrier, inc=1, device_id={axis: left})
    pltpu.semaphore_signal(barrier, inc=1, device_id={axis: right})
    pltpu.semaphore_wait(barrier, 2)

    def mm_chunk(e):
        # Same math as ops.qmatmul: int8 operands, int32 MXU accumulator,
        # rank-1 f32 epilogue — keeps this tier bit-identical to the
        # ppermute tier's per-chunk results.
        wq_c = wq_ref[:, pl.ds(e * nc, nc)]
        sw_c = sw_ref[pl.ds(e * nc, nc)]
        acc = jax.lax.dot_general(
            xq_ref[...], wq_c, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        return acc.astype(jnp.float32) * sx_ref[...][:, None] * sw_c[None, :]

    comm_ref[0] = mm_chunk(jax.lax.rem(my + tp - 1, tp))
    for s in range(1, tp):  # tp is static: unrolled ring schedule
        send_slot = (s - 1) % 2
        recv_slot = s % 2
        if s >= 2:
            # Right must have forwarded the previous occupant of the slot
            # this copy targets (its step s-1 send completion).
            pltpu.semaphore_wait(credit_sem.at[recv_slot], 1)
        rdma = pltpu.make_async_remote_copy(
            src_ref=comm_ref.at[send_slot],
            dst_ref=comm_ref.at[recv_slot],
            send_sem=send_sem.at[send_slot],
            recv_sem=recv_sem.at[recv_slot],
            device_id={axis: right},
        )
        rdma.start()
        # The local GEMM for the chunk now in flight overlaps the hop.
        contrib = mm_chunk(jax.lax.rem(my + 2 * tp - 1 - s, tp))
        rdma.wait()
        if s < tp - 1:
            # send_slot's payload is forwarded; the LEFT sender may reuse it
            # (no step tp exists, so the last step returns no credit —
            # keeps every semaphore drained at kernel exit).
            pltpu.semaphore_signal(credit_sem.at[send_slot], inc=1,
                                   device_id={axis: left})
        comm_ref[recv_slot] = comm_ref[recv_slot] + contrib
    out_ref[...] = comm_ref[(tp - 1) % 2]


@functools.partial(
    jax.jit,
    static_argnames=("axis", "tp", "interpret"),
)
def qmatmul_reduce_scatter_dma(
    xq: jnp.ndarray,  # [M, K/tp] int8 (pre-quantized activations)
    s_x: jnp.ndarray,  # [M] f32 per-token scales
    wq: jnp.ndarray,  # [K/tp, N] int8
    s_w: jnp.ndarray,  # [N] f32
    *,
    axis: str,
    tp: int,
    interpret=None,
):
    """Explicit-DMA ring reduce-scatter int8 matmul (call inside shard_map).

    Returns this device's fully-reduced output chunk [M, N/tp] f32:
    integer-exact vs ``parallel.collective.qmatmul_reduce_scatter`` (same
    int32 ring arithmetic, same addition order); the f32 epilogue may differ
    by compiler FMA-contraction ulps between the two separately-compiled
    programs (tests pin integer-exactness bitwise and real scales to ulps).
    """
    M, _ = xq.shape
    N = wq.shape[1]
    assert N % tp == 0, (N, tp)
    nc = N // tp
    if interpret is None:
        interpret = default_interpret()
    if interpret is True:
        # Plain interpret=True cannot emulate remote DMAs; the TPU
        # interpreter (with its cross-device mailboxes) can.
        interpret = pltpu.InterpretParams()
    kernel = functools.partial(_ring_kernel, axis, tp, nc)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((M, nc), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, M, nc), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.REGULAR((2,)),
        ],
        compiler_params=pltpu.CompilerParams(collective_id=_COLLECTIVE_ID),
        interpret=interpret,
    )(xq, s_x, wq, s_w)
