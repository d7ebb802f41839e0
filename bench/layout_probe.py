"""Verify the seq-major cache layout removes XLA's per-step layout copies.

hlo_dump_attend.py showed the head-major [B,KV,S,Dh] carry forces 4 x 64MB
int8 copies per decode step ({3,2,1,0} param layout <-> {3,1,2,0} dot
layout). {3,1,2,0} minor-to-major == physical order (B,S,KV,Dh), so a
seq-major logical layout should compile copy-free AND make the update a
contiguous slab write.

Prints: per-step copy bytes from HLO for both layouts, then measured
us/step (RTT-cancelled two-length scan differencing).
"""

import functools
import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import numpy as np

V5E_HBM_GBS = 819.0
NEG_INF = -1e30


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    import jax.numpy as jnp

    B, KV, S, Dh, T = 8, 32, 2048, 128, 1
    G = 1  # MHA
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((B, T, KV, Dh)), jnp.bfloat16)
    kn = jnp.asarray(rng.standard_normal((B, T, KV, Dh)), jnp.bfloat16)
    vn = jnp.asarray(rng.standard_normal((B, T, KV, Dh)), jnp.bfloat16)
    lengths = jnp.full((B,), S // 2, jnp.int32)
    scale = Dh**-0.5

    def quant(x):  # [..., Dh] -> int8 + scale over Dh
        m = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1, keepdims=True)
        s = jnp.maximum(m, 1e-6) / 127.0
        return jnp.clip(jnp.round(x / s), -127, 127).astype(jnp.int8), s[..., 0]

    # ---- head-major (current product): kq [B,KV,S,Dh], ks [B,KV,S] ----
    def step_hm(carry, q, kn, vn):
        kq, ks, vq, vs = carry
        k8, ksn = quant(kn)  # [B,T,KV,Dh], [B,T,KV]
        v8, vsn = quant(vn)
        b_idx = jnp.arange(B)[:, None]
        s_idx = lengths[:, None] + jnp.arange(T)[None, :]
        kq = kq.at[b_idx, :, s_idx].set(jnp.swapaxes(k8, 1, 2).transpose(0, 2, 1, 3)[:, :, 0][:, None][:, 0][:, None].reshape(B, 1, KV, Dh)) if False else kq.at[b_idx, :, s_idx].set(k8.reshape(B, T, KV, Dh))
        vq = vq.at[b_idx, :, s_idx].set(v8.reshape(B, T, KV, Dh))
        ks = ks.at[b_idx, :, s_idx].set(ksn.reshape(B, T, KV))
        vs = vs.at[b_idx, :, s_idx].set(vsn.reshape(B, T, KV))
        qh = (q.astype(jnp.float32) * scale).astype(jnp.bfloat16)
        scores = jnp.einsum("btkd,bksd->bkts", qh, kq.astype(jnp.bfloat16),
                            preferred_element_type=jnp.float32)
        scores = scores * ks[:, :, None, :]
        s_pos = jnp.arange(S)
        t_pos = lengths[:, None] + jnp.arange(T)[None, :]
        mask = s_pos[None, None, None, :] <= t_pos[:, None, :, None]
        scores = jnp.where(mask, scores, NEG_INF)
        probs = jax.nn.softmax(scores, axis=-1)
        pv = (probs * vs[:, :, None, :]).astype(jnp.bfloat16)
        out = jnp.einsum("bkts,bksd->btkd", pv, vq.astype(jnp.bfloat16),
                         preferred_element_type=jnp.float32)
        return (kq, ks, vq, vs), out.astype(jnp.bfloat16)

    def init_hm():
        return (jnp.zeros((B, KV, S, Dh), jnp.int8), jnp.zeros((B, KV, S), jnp.float32),
                jnp.zeros((B, KV, S, Dh), jnp.int8), jnp.zeros((B, KV, S), jnp.float32))

    # ---- seq-major: kq [B,S,KV,Dh], ks [B,S,KV] ----
    def step_sm(carry, q, kn, vn):
        kq, ks, vq, vs = carry
        k8, ksn = quant(kn)  # [B,T,KV,Dh], [B,T,KV]
        v8, vsn = quant(vn)
        b_idx = jnp.arange(B)[:, None]
        s_idx = lengths[:, None] + jnp.arange(T)[None, :]
        kq = kq.at[b_idx, s_idx].set(k8)
        vq = vq.at[b_idx, s_idx].set(v8)
        ks = ks.at[b_idx, s_idx].set(ksn)
        vs = vs.at[b_idx, s_idx].set(vsn)
        qh = (q.astype(jnp.float32) * scale).astype(jnp.bfloat16)
        scores = jnp.einsum("btkd,bskd->bkts", qh, kq.astype(jnp.bfloat16),
                            preferred_element_type=jnp.float32)
        scores = scores * jnp.swapaxes(ks, 1, 2)[:, :, None, :]
        s_pos = jnp.arange(S)
        t_pos = lengths[:, None] + jnp.arange(T)[None, :]
        mask = s_pos[None, None, None, :] <= t_pos[:, None, :, None]
        scores = jnp.where(mask, scores, NEG_INF)
        probs = jax.nn.softmax(scores, axis=-1)
        pv = (probs * jnp.swapaxes(vs, 1, 2)[:, :, None, :]).astype(jnp.bfloat16)
        out = jnp.einsum("bkts,bskd->btkd", pv, vq.astype(jnp.bfloat16),
                         preferred_element_type=jnp.float32)
        return (kq, ks, vq, vs), out.astype(jnp.bfloat16)

    def init_sm():
        return (jnp.zeros((B, S, KV, Dh), jnp.int8), jnp.zeros((B, S, KV), jnp.float32),
                jnp.zeros((B, S, KV, Dh), jnp.int8), jnp.zeros((B, S, KV), jnp.float32))

    # ---- HLO copy audit ----
    def copy_bytes(step, init):
        f = jax.jit(step, donate_argnums=(0,))
        txt = f.lower(init(), q, kn, vn).compile().as_text()
        total = 0
        for line in txt.splitlines():
            st = line.strip()
            m = re.match(r"%?[\w.-]+ = (\w+)\[([\d,]+)\][^ ]* copy\(", st)
            if m:
                nb = {"s8": 1, "bf16": 2, "f32": 4, "s32": 4}.get(m.group(1), 0)
                for d in m.group(2).split(","):
                    nb *= int(d)
                if nb >= 1024 * 1024:
                    total += nb
        return total

    for name, step, init in (("head_major", step_hm, init_hm), ("seq_major", step_sm, init_sm)):
        cb = copy_bytes(step, init)
        print(json.dumps({"case": name, "hlo_copy_mb_per_step": round(cb / 1e6, 1)}), flush=True)

    # ---- timing (RTT-cancelled) ----
    bytes_ideal = 2 * B * KV * S * Dh + 8 * B * KV * S

    def time_case(name, step, init):
        def make_run(n):
            @functools.partial(jax.jit, donate_argnums=(0,))
            def run(carry, salt):
                def body(c, i):
                    kni = kn + (0.001 * ((i + salt) % 7 - 3)).astype(jnp.bfloat16)
                    c, out = step(c, q, kni, vn)
                    return c, jnp.abs(out.astype(jnp.float32)).sum()

                c, accs = jax.lax.scan(body, carry, jnp.arange(n))
                return jnp.sum(accs)

            return run

        lo, hi = 128, 640
        run_lo, run_hi = make_run(lo), make_run(hi)
        float(run_lo(init(), jnp.int32(1)))
        float(run_hi(init(), jnp.int32(1)))
        best_lo = best_hi = float("inf")
        for j in range(2, 5):
            t0 = time.perf_counter()
            float(run_lo(init(), jnp.int32(j * 1009)))
            best_lo = min(best_lo, time.perf_counter() - t0)
            t0 = time.perf_counter()
            float(run_hi(init(), jnp.int32(j * 2027)))
            best_hi = min(best_hi, time.perf_counter() - t0)
        dt = max(best_hi - best_lo, 1e-9) / (hi - lo)
        print(json.dumps({
            "case": name, "us": round(dt * 1e6, 1),
            "gbs": round(bytes_ideal / dt / 1e9, 1),
            "hbm_frac": round(bytes_ideal / dt / 1e9 / V5E_HBM_GBS, 3),
        }), flush=True)

    time_case("head_major", step_hm, init_hm)
    time_case("seq_major", step_sm, init_sm)


if __name__ == "__main__":
    main()
