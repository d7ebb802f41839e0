"""Sliding-window decode attention: Pallas flash (block-skipping) vs XLA.

Round-2 continuation probe. The windowed variants of the flash kernel
(ops/attention.py) mask on the sliding window AND clamp the S-grid's index
maps from below, so a windowed decode step reads O(window) cache bytes
regardless of context length. The XLA formulation must stream the whole
cache and mask. Expected: kernel time ~flat in S at fixed window; XLA time
~linear in S.

Also times the ring-cache variant (positions-masked kernel) at its native
O(window) capacity — the honest end-state for long-stream serving.

Timing: per-step decode attend, scan-looped inside one jitted program to
amortize tunnel dispatch (~1.8 ms RTT on this runtime).

Usage: python bench/window_probe.py   (prints one JSON line per case)
"""

import functools
import json
import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

from protoquant_tpu.ops.attention import (  # noqa: E402
    int8_kv_attention,
    int8_kv_attention_xla,
)

B, KV, G, Dh = 8, 8, 4, 128  # Mistral-7B GQA geometry
H = KV * G
STEPS = 64


def make_case(S, seed=0):
    rng = np.random.default_rng(seed)
    kq = jnp.asarray(rng.integers(-127, 128, (B, KV, S, Dh), dtype=np.int8))
    vq = jnp.asarray(rng.integers(-127, 128, (B, KV, S, Dh), dtype=np.int8))
    ks = jnp.asarray(rng.uniform(0.005, 0.02, (B, KV, S)).astype(np.float32))
    vs = jnp.asarray(rng.uniform(0.005, 0.02, (B, KV, S)).astype(np.float32))
    q = jnp.asarray((rng.standard_normal((B, 1, H, Dh)) * 0.5).astype(np.float32))
    return q, kq, ks, vq, vs


def timed(fn, *args, iters=5):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters / STEPS


def scan_attend(attend, q, kq, ks, vq, vs, lengths, **kw):
    @jax.jit
    def run(q, kq, ks, vq, vs, lengths):
        def body(acc, i):
            # Vary q per step so nothing hoists/CSEs out of the loop.
            qi = q + (i % 3).astype(q.dtype) * 1e-3
            o = attend(qi, kq, ks, vq, vs, lengths, **kw)
            return acc + jnp.abs(o.astype(jnp.float32)).sum(), ()

        acc, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(STEPS))
        return acc

    return run


def main():
    results = []
    window = 1024
    sizes = tuple(
        int(s) for s in os.environ.get("WINDOW_PROBE_S", "2048,4096,8192").split(",")
    )
    for S in sizes:
        q, kq, ks, vq, vs = make_case(S)
        lengths = jnp.full((B,), S - 2, jnp.int32)
        row = {"S": S, "window": window}
        for name, attend in (
            ("pallas", functools.partial(int8_kv_attention, interpret=False)),
            ("xla", int8_kv_attention_xla),
        ):
            print(f"# compiling {name} S={S}", file=sys.stderr, flush=True)
            run = scan_attend(attend, q, kq, ks, vq, vs, lengths, window=window)
            us = timed(run, q, kq, ks, vq, vs, lengths) * 1e6
            row[f"{name}_us"] = round(us, 1)
        row["speedup"] = round(row["xla_us"] / row["pallas_us"], 2)
        results.append(row)
        print(json.dumps(row), flush=True)

    # Ring cache at native capacity: C = window + 32 slack.
    C = 1056
    q, kq, ks, vq, vs = make_case(C, seed=1)
    lengths = jnp.full((B,), 9000, jnp.int32)
    L = lengths[:, None] + 1
    c = jnp.arange(C)[None, :]
    k_pos = (L - 1) - ((L - 1 - c) % C)
    row = {"S": C, "window": window, "ring": True}
    for name, attend in (
        ("pallas", functools.partial(int8_kv_attention, interpret=False)),
        ("xla", int8_kv_attention_xla),
    ):
        run = scan_attend(
            attend, q, kq, ks, vq, vs, lengths, window=window, k_positions=k_pos
        )
        us = timed(run, q, kq, ks, vq, vs, lengths) * 1e6
        row[f"{name}_us"] = round(us, 1)
    row["speedup"] = round(row["xla_us"] / row["pallas_us"], 2)
    print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
