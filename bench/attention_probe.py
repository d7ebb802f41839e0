"""Decode-attention formulation probe: where does the int8 path lose?

At ctx >= 1024 the product XLA attention runs ~2x off the int8 HBM roofline
while the bf16 baseline sits at its own roofline (bench.py ctx sweeps), and
the Pallas flash kernel loses outright at decode (per-program overhead).
This probe times isolated decode-shaped attention formulations to find the
fix:

  xla_int8        — product path (int8_kv_attention_xla, K/V as [B,KV,S,Dh])
  xla_int8_kt     — K stored pre-transposed [B,KV,Dh,S]: the scores dot
                    contracts over the rhs sublane dim, so the s8->bf16
                    convert can ride the MXU feed instead of materializing
                    a bf16 copy of the whole cache
  xla_int8_vt     — V transposed variant ([B,KV,Dh,S]) for the pv dot
  xla_int8_ktvt   — both transposed
  bf16            — bf16 cache reference (same einsum as product bf16 path)

Tunnel-hardened: scan-in-one-program, salted inputs, fetch-forced timing
(BASELINE.md "Timing methodology").

Usage: python bench/attention_probe.py [--ctx 2048] [--batch 8]
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time

sys.path.insert(0, ".")

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import numpy as np

V5E_HBM_GBS = 819.0
NEG_INF = -1e30


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ctx", type=int, default=2048)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--heads", type=int, default=32)
    ap.add_argument("--dh", type=int, default=128)
    ap.add_argument("--target-seconds", type=float, default=0.25)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    B, H, S, Dh = args.batch, args.heads, args.ctx, args.dh
    KV = H  # MHA decode (bench.py geometry)
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((B, 1, H, Dh)), jnp.bfloat16)
    kq = jnp.asarray(rng.integers(-127, 128, (B, KV, S, Dh), dtype=np.int8))
    vq = jnp.asarray(rng.integers(-127, 128, (B, KV, S, Dh), dtype=np.int8))
    ks = jnp.asarray(rng.uniform(0.01, 0.03, (B, KV, S)), jnp.float32)
    vs = jnp.asarray(rng.uniform(0.01, 0.03, (B, KV, S)), jnp.float32)
    kqt = jnp.swapaxes(kq, 2, 3)  # [B, KV, Dh, S]
    vqt = jnp.swapaxes(vq, 2, 3)
    k_bf = (kq.astype(jnp.float32) * ks[..., None]).astype(jnp.bfloat16)
    v_bf = (vq.astype(jnp.float32) * vs[..., None]).astype(jnp.bfloat16)
    lengths = jnp.full((B,), S - 1, jnp.int32)

    def mask_scores(scores, t=1):
        s_pos = jnp.arange(S)
        t_pos = lengths[:, None] + jnp.arange(t)[None, :]
        m = s_pos[None, None, None, :] <= t_pos[:, None, :, None]
        return jnp.where(m, scores, NEG_INF)

    scale = Dh**-0.5

    def xla_int8(q, kq, vq):
        qh = (q.astype(jnp.float32) * scale).astype(jnp.bfloat16)
        scores = jnp.einsum(
            "bthd,bhsd->bhts", qh, kq.astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        )
        scores = mask_scores(scores * ks[:, :, None, :])
        probs = jax.nn.softmax(scores, axis=-1)
        pv = (probs * vs[:, :, None, :]).astype(jnp.bfloat16)
        out = jnp.einsum(
            "bhts,bhsd->bthd", pv, vq.astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        )
        return out

    def xla_int8_kt(q, kqt, vq):
        qh = (q.astype(jnp.float32) * scale).astype(jnp.bfloat16)
        scores = jnp.einsum(
            "bthd,bhds->bhts", qh, kqt.astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        )
        scores = mask_scores(scores * ks[:, :, None, :])
        probs = jax.nn.softmax(scores, axis=-1)
        pv = (probs * vs[:, :, None, :]).astype(jnp.bfloat16)
        out = jnp.einsum(
            "bhts,bhsd->bthd", pv, vq.astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        )
        return out

    def xla_int8_vt(q, kq, vqt):
        qh = (q.astype(jnp.float32) * scale).astype(jnp.bfloat16)
        scores = jnp.einsum(
            "bthd,bhsd->bhts", qh, kq.astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        )
        scores = mask_scores(scores * ks[:, :, None, :])
        probs = jax.nn.softmax(scores, axis=-1)
        pv = (probs * vs[:, :, None, :]).astype(jnp.bfloat16)
        out = jnp.einsum(
            "bhts,bhds->bthd", pv, vqt.astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        )
        return out

    def xla_int8_ktvt(q, kqt, vqt):
        qh = (q.astype(jnp.float32) * scale).astype(jnp.bfloat16)
        scores = jnp.einsum(
            "bthd,bhds->bhts", qh, kqt.astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        )
        scores = mask_scores(scores * ks[:, :, None, :])
        probs = jax.nn.softmax(scores, axis=-1)
        pv = (probs * vs[:, :, None, :]).astype(jnp.bfloat16)
        out = jnp.einsum(
            "bhts,bhds->bthd", pv, vqt.astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        )
        return out

    def bf16(q, k_bf, v_bf):
        qh = (q.astype(jnp.float32) * scale).astype(jnp.bfloat16)
        scores = jnp.einsum(
            "bthd,bhsd->bhts", qh, k_bf, preferred_element_type=jnp.float32
        )
        scores = mask_scores(scores)
        probs = jax.nn.softmax(scores, axis=-1).astype(jnp.bfloat16)
        out = jnp.einsum(
            "bhts,bhsd->bthd", probs, v_bf, preferred_element_type=jnp.float32
        )
        return out

    def dots_only_int8(q, kq, vq):
        qh = (q.astype(jnp.float32) * scale).astype(jnp.bfloat16)
        scores = jnp.einsum(
            "bthd,bhsd->bhts", qh, kq.astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        )
        pv = scores.astype(jnp.bfloat16)  # skip mask/softmax: isolate dots
        out = jnp.einsum(
            "bhts,bhsd->bthd", pv, vq.astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        )
        return out

    def dots_only_bf16(q, k_bf, v_bf):
        qh = (q.astype(jnp.float32) * scale).astype(jnp.bfloat16)
        scores = jnp.einsum(
            "bthd,bhsd->bhts", qh, k_bf, preferred_element_type=jnp.float32
        )
        out = jnp.einsum(
            "bhts,bhsd->bthd", scores.astype(jnp.bfloat16), v_bf,
            preferred_element_type=jnp.float32,
        )
        return out

    bytes_i8 = 2 * B * KV * S * Dh + 8 * B * KV * S  # payloads + f32 scales
    bytes_bf = 4 * B * KV * S * Dh
    cases = [
        ("dots_only_int8", dots_only_int8, (kq, vq), bytes_i8),
        ("dots_only_bf16", dots_only_bf16, (k_bf, v_bf), bytes_bf),
        ("xla_int8", xla_int8, (kq, vq), bytes_i8),
        ("xla_int8_kt", xla_int8_kt, (kqt, vq), bytes_i8),
        ("xla_int8_vt", xla_int8_vt, (kq, vqt), bytes_i8),
        ("xla_int8_ktvt", xla_int8_ktvt, (kqt, vqt), bytes_i8),
        ("bf16", bf16, (k_bf, v_bf), bytes_bf),
    ]

    sol = bytes_i8 / (V5E_HBM_GBS * 1e9)
    iters = int(max(16, min(2048, args.target_seconds / (3 * sol))))

    for name, fn, operands, nbytes in cases:
        # Operands are explicit jit args: closure-captured caches embed as
        # HLO literals (a 134MB bf16 literal exceeded the tunnel's
        # remote-compile body limit) and could invite compile-time layout
        # tricks a real cache argument doesn't get.
        @functools.partial(jax.jit, static_argnames=())
        def run(q0, salt, *ops, fn=fn):
            def body(acc, i):
                qi = q0 + (0.001 * ((i + salt) % 7 - 3)).astype(jnp.bfloat16)
                y = fn(qi, *ops)
                return acc + jnp.abs(y.astype(jnp.float32)).sum(), ()

            acc, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(iters))
            return acc

        float(run(q, jnp.int32(1), *operands))  # warmup: compile+exec+fetch
        chainn = 3
        best = float("inf")
        for j in range(2, 5):
            salts = [jnp.int32(j * 1009 + c * 131071) for c in range(chainn)]
            t0 = time.perf_counter()
            out = [run(q, s, *operands) for s in salts]
            float(out[-1])
            best = min(best, time.perf_counter() - t0)
        dt = best / (iters * chainn)
        print(
            json.dumps(
                {
                    "case": name,
                    "ctx": S,
                    "iters": iters,
                    "us": round(dt * 1e6, 1),
                    "gbs": round(nbytes / dt / 1e9, 1),
                    "hbm_frac": round(nbytes / dt / 1e9 / V5E_HBM_GBS, 3),
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
