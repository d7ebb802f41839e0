"""Dump optimized TPU HLO for the decode update+attend composite and report
every buffer >= 8MB, to find where the int8 attention path materializes
large intermediates (suspected bf16 copy of the cache)."""

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from protoquant_tpu.models.kv_cache import Int8KVCache
    from protoquant_tpu.ops.attention import int8_kv_attention_xla

    B, KV, S, Dh, T = 8, 32, 2048, 128, 1
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((B, T, KV, Dh)), jnp.bfloat16)
    k_new = jnp.asarray(rng.standard_normal((B, T, KV, Dh)), jnp.bfloat16)
    v_new = jnp.asarray(rng.standard_normal((B, T, KV, Dh)), jnp.bfloat16)
    cache = Int8KVCache.init(B, S, KV, Dh)

    def step(c, q, kn, vn):
        out, c2 = c.update_and_attend(q, kn, vn)
        return out, c2

    lowered = jax.jit(step, donate_argnums=(0,)).lower(cache, q, k_new, v_new)
    compiled = lowered.compile()
    txt = compiled.as_text()
    with open("/tmp/attend_hlo.txt", "w") as f:
        f.write(txt)
    print(f"HLO written ({len(txt)} bytes) -> /tmp/attend_hlo.txt")

    dt_bytes = {"s8": 1, "u8": 1, "bf16": 2, "f16": 2, "f32": 4, "s32": 4, "u32": 4, "pred": 1}
    seen = {}
    for m in re.finditer(r"(\w+)\[([\d,]+)\]", txt):
        dt, dims = m.group(1), m.group(2)
        if dt not in dt_bytes:
            continue
        n = dt_bytes[dt]
        for d in dims.split(","):
            n *= int(d)
        if n >= 8 * 1024 * 1024:
            key = f"{dt}[{dims}]"
            seen[key] = seen.get(key, 0) + 1
    for k, v in sorted(seen.items(), key=lambda kv: -kv[1]):
        print(f"{v:4d} x {k}")

    # Top-level (non-fused) ops with big outputs: the real materializations.
    print("\n-- top-level ops with >=8MB outputs (outside fusion bodies) --")
    in_fusion = 0
    for line in txt.splitlines():
        stripped = line.strip()
        if re.match(r"%?fused_computation", stripped) or stripped.startswith("ENTRY"):
            pass
        m = re.match(r"(%?[\w.-]+) = (\w+)\[([\d,]+)\]", stripped)
        if not m:
            continue
        # Heuristic: entry-computation ops are indented 2 spaces in as_text.
        dt, dims = m.group(2), m.group(3)
        if dt not in dt_bytes:
            continue
        n = dt_bytes[dt]
        for d in dims.split(","):
            n *= int(d)
        if n >= 8 * 1024 * 1024 and ("fusion" in stripped or "convert" in stripped
                                     or "copy" in stripped or "transpose" in stripped
                                     or "dot" in stripped or "scatter" in stripped
                                     or "dynamic-update" in stripped):
            op = stripped.split("=")[1].strip()[:140]
            print(f"  {m.group(1)[:40]:42s} {dt}[{dims}]  {op.split('(')[0][len(dt)+len(dims)+2:]}")


if __name__ == "__main__":
    main()
