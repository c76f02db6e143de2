"""Prototype: block-diagonal head packing for the field attention.

The per-head einsums (bfhd,bghd->bhfg / bhfg,bghd->bfhd) force XLA to
materialize [B,F,H,hd] layout copies (~0.5ms each at eval scale) and run
51k tiny [23,32]x[32,23] MXU dots.  Packing the heads block-diagonally
keeps Q in its natural [B,F,A] layout and computes BOTH heads' scores in
ONE batched [23,A]x[A,F*H] dot per example:

    K2[b, g*H+h, :] = k_h(b,g) scattered into head-h's A-slice (zeros
    elsewhere)  ->  S[b, f, g*H+h] = q(b,f) . K2 = q_h . k_h   (exact:
    the extra terms are multiplications by zero)

and the context the same way: V2[b, g*H+h, :] = v_h in slice h ->
attn @ V2 emits the per-head outputs ALREADY concatenated on A.

Measures one 3-layer stack forward at CDC-eval scale vs the einsum path.
"""

import math
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    B, F, A, H, L = 25600, 23, 64, 2, 3
    hd = A // H
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B, F, A)).astype(np.float32))
    w_in = [jnp.asarray(rng.normal(size=(A, 3 * A)).astype(np.float32) * 0.05)
            for _ in range(L)]
    b_in = [jnp.zeros((3 * A,), jnp.float32) for _ in range(L)]
    w_out = [jnp.asarray(rng.normal(size=(A, A)).astype(np.float32) * 0.05)
             for _ in range(L)]
    b_out = [jnp.zeros((A,), jnp.float32) for _ in range(L)]
    eyeH = jnp.eye(H, dtype=jnp.float32)

    def layer_einsum(x, i):
        qkv = jnp.einsum("bfa,ac->bfc", x, w_in[i],
                         preferred_element_type=jnp.float32) + b_in[i]
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q4 = q.reshape(B, F, H, hd)
        k4 = k.reshape(B, F, H, hd)
        v4 = v.reshape(B, F, H, hd)
        s = jnp.einsum("bfhd,bghd->bhfg", q4, k4,
                       preferred_element_type=jnp.float32) / math.sqrt(hd)
        a = jax.nn.softmax(s, axis=-1)
        o = jnp.einsum("bhfg,bghd->bfhd", a, v4,
                       preferred_element_type=jnp.float32).reshape(B, F, A)
        return jnp.einsum("bfa,ao->bfo", o, w_out[i],
                          preferred_element_type=jnp.float32) + b_out[i]

    def layer_blockdiag(x, i):
        qkv = jnp.einsum("bfa,ac->bfc", x, w_in[i],
                         preferred_element_type=jnp.float32) + b_in[i]
        q, k, v = jnp.split(qkv, 3, axis=-1)
        # K2/V2: [B, F, H(hd-part), H(slot), hd] -> [B, F*H, A]
        k4 = k.reshape(B, F, H, 1, hd) * eyeH[None, None, :, :, None]
        v4 = v.reshape(B, F, H, 1, hd) * eyeH[None, None, :, :, None]
        K2 = k4.transpose(0, 1, 3, 2, 4).reshape(B, F * H, A)
        V2 = v4.transpose(0, 1, 3, 2, 4).reshape(B, F * H, A)
        s = jax.lax.dot_general(
            q, K2, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32) / math.sqrt(hd)
        # s: [B, F, F*H] with g-major h-minor -> softmax over g per slot h
        s = s.reshape(B, F, F, H)
        a = jax.nn.softmax(s, axis=2).reshape(B, F, F * H)
        o = jax.lax.dot_general(
            a, V2, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)  # [B, F, A], heads concat'd
        return jnp.einsum("bfa,ao->bfo", o, w_out[i],
                          preferred_element_type=jnp.float32) + b_out[i]

    def stack(layer):
        def f(x):
            def body(c, i):
                return c, None
            h = x
            for i in range(L):
                h = layer(h, i)
            return jax.nn.relu(h)
        return jax.jit(f)

    f_e = stack(layer_einsum)
    f_b = stack(layer_blockdiag)

    ye = f_e(x)
    yb = f_b(x)
    print("max abs diff:", float(jnp.max(jnp.abs(ye - yb))))

    def timeit(f, n=8):
        r = f(x)
        np.asarray(r)
        t0 = time.perf_counter()
        for _ in range(n):
            r = f(x)
        np.asarray(r)
        return (time.perf_counter() - t0) / n * 1e3

    print(f"einsum path:     {timeit(f_e):7.2f} ms")
    print(f"block-diag path: {timeit(f_b):7.2f} ms")


if __name__ == "__main__":
    main()
