"""Layered attention kernels on the real chip: Mosaic compile time +
fwd/bwd step time vs the XLA jnp path (the round-1 stack kernel was
correct but uncompilable in practice — minutes of Mosaic time, 28.7MB
VMEM at tile 128).  Bench shapes: B=512, F=23, D=16, A=64, H=2, L=3."""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np

def main():
    import jax, jax.numpy as jnp
    from tpurec.ops.attention_pallas import (
        field_attention_reference, fused_field_attention_layered)

    B, F, D, A, H, L = 512, 23, 16, 64, 2, 3
    tile = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    rng = np.random.default_rng(0)
    mk = lambda *s: jnp.asarray(rng.normal(size=s) * 0.2, jnp.float32)
    flat = [mk(D, A), mk(A), mk(D, A), mk(A)]
    for _ in range(L):
        flat += [mk(A, 3 * A), mk(3 * A), mk(A, A), mk(A)]
    emb = jnp.asarray(rng.normal(size=(B, F, D)), jnp.float32)

    def loss_k(emb, flat):
        return jnp.sum(fused_field_attention_layered(
            emb, flat, 0, L, H, 0.0, False, tile, False) ** 2)

    def loss_r(emb, flat):
        return jnp.sum(field_attention_reference(emb, flat, L, H) ** 2)

    for name, fn in (("xla", loss_r), ("pallas-layered", loss_k)):
        g = jax.jit(jax.grad(fn, argnums=(0, 1)))
        t0 = time.perf_counter()
        out = g(emb, flat)
        jax.block_until_ready(out)
        t_compile = time.perf_counter() - t0
        # hard-synced timing loop
        t0 = time.perf_counter(); N = 50
        for _ in range(N):
            out = g(emb, flat)
        _ = np.asarray(out[0])
        dt = (time.perf_counter() - t0) / N
        print(f"{name:16s} tile={tile:4d} compile={t_compile:7.1f}s "
              f"fwd+bwd={dt*1e3:7.3f} ms/step")
        if name == "xla":
            ref = out
    # value check on chip
    err = float(jnp.max(jnp.abs(out[0] - ref[0])))
    print(f"max |demb diff| vs XLA: {err:.2e}")

if __name__ == "__main__":
    main()
