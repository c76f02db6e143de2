"""Sweep of field-attention formulations, fwd+bwd at bench shapes.

The attention aux head is ~0.65ms of the 1.14ms fwd+bwd at bench shapes
(B=512, F=23, A=64, H=2, 3 layers) and is overhead/layout-bound, not
FLOP-bound (bf16 compute moves the full step only +1.6%).  This script
times isolated 3-layer-stack fwd+bwd for several formulations in ONE
process (the remote-TPU tunnel costs minutes per process):

  einsum      - current FieldMultiHeadAttention form (reshape-only heads)
  transpose   - explicit [B,H,F,hd] transposes (the known-bad baseline)
  bfhg        - scores emitted [B,F,H,G] (h inner) instead of [B,H,F,G]
  slice_qkv   - q/k/v from three separate matmuls against w_in slices
                (no jnp.split of the fused [B,F,3A] output)
  padF        - fields padded 23->24 (sublane-aligned) with masked scores
  merged_bh   - heads folded into the batch dim for the two batched dots
  nodrop      - einsum with dropout disabled (isolate PRNG+mask cost)
"""

import math
import time

import numpy as np

B, F, A, H, L = 512, 23, 64, 2, 3
hd = A // H
DROP = 0.2


def main():
    import jax

    jax.config.update("jax_default_prng_impl", "rbg")
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.normal(size=(B, F, A)).astype(np.float32))
    params = []
    for _ in range(L):
        params.append((
            jnp.asarray(rng.normal(size=(A, 3 * A)).astype(np.float32) * 0.05),
            jnp.zeros((3 * A,), jnp.float32),
            jnp.asarray(rng.normal(size=(A, A)).astype(np.float32) * 0.05),
            jnp.zeros((A,), jnp.float32),
        ))

    def dropout(a, key, rate):
        if rate == 0.0:
            return a
        keep = jax.random.bernoulli(key, 1.0 - rate, a.shape)
        return jnp.where(keep, a / (1.0 - rate), 0.0)

    def mk_stack(layer, drop=DROP):
        def f(params, x, key):
            h = x
            for i in range(L):
                key, sub = jax.random.split(key)
                h = layer(params[i], h, sub, drop)
            return jax.nn.relu(h)

        def loss(params, x, key):
            return jnp.sum(f(params, x, key) ** 2)

        return jax.jit(jax.value_and_grad(loss, argnums=(0, 1)))

    def layer_einsum(p, x, key, drop):
        w_in, b_in, w_out, b_out = p
        qkv = jnp.einsum("bfa,ac->bfc", x, w_in,
                         preferred_element_type=jnp.float32) + b_in
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q4 = q.reshape(B, F, H, hd)
        k4 = k.reshape(B, F, H, hd)
        v4 = v.reshape(B, F, H, hd)
        s = jnp.einsum("bfhd,bghd->bhfg", q4, k4,
                       preferred_element_type=jnp.float32) / math.sqrt(hd)
        a = dropout(jax.nn.softmax(s, axis=-1), key, drop)
        o = jnp.einsum("bhfg,bghd->bfhd", a, v4,
                       preferred_element_type=jnp.float32).reshape(B, F, A)
        return jnp.einsum("bfa,ao->bfo", o, w_out,
                          preferred_element_type=jnp.float32) + b_out

    def layer_transpose(p, x, key, drop):
        w_in, b_in, w_out, b_out = p
        qkv = x @ w_in + b_in
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q4 = q.reshape(B, F, H, hd).transpose(0, 2, 1, 3)
        k4 = k.reshape(B, F, H, hd).transpose(0, 2, 1, 3)
        v4 = v.reshape(B, F, H, hd).transpose(0, 2, 1, 3)
        s = q4 @ k4.transpose(0, 1, 3, 2) / math.sqrt(hd)
        a = dropout(jax.nn.softmax(s, axis=-1), key, drop)
        o = (a @ v4).transpose(0, 2, 1, 3).reshape(B, F, A)
        return o @ w_out + b_out

    def layer_bfhg(p, x, key, drop):
        w_in, b_in, w_out, b_out = p
        qkv = jnp.einsum("bfa,ac->bfc", x, w_in,
                         preferred_element_type=jnp.float32) + b_in
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q4 = q.reshape(B, F, H, hd)
        k4 = k.reshape(B, F, H, hd)
        v4 = v.reshape(B, F, H, hd)
        s = jnp.einsum("bfhd,bghd->bfhg", q4, k4,
                       preferred_element_type=jnp.float32) / math.sqrt(hd)
        a = dropout(jax.nn.softmax(s, axis=-1), key, drop)
        o = jnp.einsum("bfhg,bghd->bfhd", a, v4,
                       preferred_element_type=jnp.float32).reshape(B, F, A)
        return jnp.einsum("bfa,ao->bfo", o, w_out,
                          preferred_element_type=jnp.float32) + b_out

    def layer_slice_qkv(p, x, key, drop):
        w_in, b_in, w_out, b_out = p
        q = jnp.einsum("bfa,ac->bfc", x, w_in[:, :A],
                       preferred_element_type=jnp.float32) + b_in[:A]
        k = jnp.einsum("bfa,ac->bfc", x, w_in[:, A:2 * A],
                       preferred_element_type=jnp.float32) + b_in[A:2 * A]
        v = jnp.einsum("bfa,ac->bfc", x, w_in[:, 2 * A:],
                       preferred_element_type=jnp.float32) + b_in[2 * A:]
        q4 = q.reshape(B, F, H, hd)
        k4 = k.reshape(B, F, H, hd)
        v4 = v.reshape(B, F, H, hd)
        s = jnp.einsum("bfhd,bghd->bhfg", q4, k4,
                       preferred_element_type=jnp.float32) / math.sqrt(hd)
        a = dropout(jax.nn.softmax(s, axis=-1), key, drop)
        o = jnp.einsum("bhfg,bghd->bfhd", a, v4,
                       preferred_element_type=jnp.float32).reshape(B, F, A)
        return jnp.einsum("bfa,ao->bfo", o, w_out,
                          preferred_element_type=jnp.float32) + b_out

    FP = 24  # padded field count

    def layer_padF(p, x, key, drop):
        # x arrives [B, FP, A] (already padded once outside the stack);
        # pad KEY columns get -1e9 scores so softmax ignores them.
        w_in, b_in, w_out, b_out = p
        qkv = jnp.einsum("bfa,ac->bfc", x, w_in,
                         preferred_element_type=jnp.float32) + b_in
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q4 = q.reshape(B, FP, H, hd)
        k4 = k.reshape(B, FP, H, hd)
        v4 = v.reshape(B, FP, H, hd)
        s = jnp.einsum("bfhd,bghd->bhfg", q4, k4,
                       preferred_element_type=jnp.float32) / math.sqrt(hd)
        neg = jnp.where(jnp.arange(FP) < F, 0.0, -1e9)
        s = s + neg[None, None, None, :]
        a = dropout(jax.nn.softmax(s, axis=-1), key, drop)
        o = jnp.einsum("bhfg,bghd->bfhd", a, v4,
                       preferred_element_type=jnp.float32).reshape(B, FP, A)
        return jnp.einsum("bfa,ao->bfo", o, w_out,
                          preferred_element_type=jnp.float32) + b_out

    def mk_stack_padF():
        def loss(params, x, key):
            h = jnp.pad(x, ((0, 0), (0, FP - F), (0, 0)))
            for i in range(L):
                key, sub = jax.random.split(key)
                h = layer_padF(params[i], h, sub, DROP)
            return jnp.sum(jax.nn.relu(h[:, :F]) ** 2)

        return jax.jit(jax.value_and_grad(loss, argnums=(0, 1)))

    def layer_merged_bh(p, x, key, drop):
        w_in, b_in, w_out, b_out = p
        qkv = jnp.einsum("bfa,ac->bfc", x, w_in,
                         preferred_element_type=jnp.float32) + b_in
        q, k, v = jnp.split(qkv, 3, axis=-1)
        # [B,F,H,hd] -> [B*H, F, hd] via reshape+transpose once
        def split(t):
            return t.reshape(B, F, H, hd).transpose(0, 2, 1, 3).reshape(B * H, F, hd)
        q3, k3, v3 = split(q), split(k), split(v)
        s = jax.lax.dot_general(
            q3, k3, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32) / math.sqrt(hd)
        a = dropout(jax.nn.softmax(s, axis=-1), key, drop)
        o = jax.lax.dot_general(
            a, v3, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        o = o.reshape(B, H, F, hd).transpose(0, 2, 1, 3).reshape(B, F, A)
        return jnp.einsum("bfa,ao->bfo", o, w_out,
                          preferred_element_type=jnp.float32) + b_out

    variants = {
        "einsum": mk_stack(layer_einsum),
        "transpose": mk_stack(layer_transpose),
        "bfhg": mk_stack(layer_bfhg),
        "slice_qkv": mk_stack(layer_slice_qkv),
        "padF": mk_stack_padF(),
        "merged_bh": mk_stack(layer_merged_bh),
        "nodrop": mk_stack(layer_einsum, drop=0.0),
    }

    key = jax.random.PRNGKey(7)
    ref = None
    for name, f in variants.items():
        v, _ = f(params, x0, key)
        v = float(v)
        if name == "einsum":
            ref = v
        t0 = time.perf_counter()
        val = None
        for _ in range(32):
            val, grads = f(params, x0, key)
        np.asarray(val)
        dt = (time.perf_counter() - t0) / 32
        # dropout RNG identical across variants -> values must match
        tag = "" if (name in ("nodrop",) or ref is None or
                     abs(v - ref) < 1e-2 * abs(ref)) else "  VALUE-MISMATCH"
        print(f"{name:10s}: {dt*1e3:7.3f} ms fwd+bwd   loss={v:.1f}{tag}",
              flush=True)


if __name__ == "__main__" and not any(__import__("os").environ.get(v) for v in ("SCANNED", "REMAT", "DROPBITS")):
    main()


def main_scanned():
    """Same sweep but K steps per dispatch (lax.scan) to amortize the
    ~0.4-1ms per-dispatch runtime latency, like bench.py's K=16 scan."""
    import jax

    jax.config.update("jax_default_prng_impl", "rbg")
    import jax.numpy as jnp
    import math

    K = 16
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.normal(size=(B, F, A)).astype(np.float32))
    params = []
    for _ in range(L):
        params.append((
            jnp.asarray(rng.normal(size=(A, 3 * A)).astype(np.float32) * 0.05),
            jnp.zeros((3 * A,), jnp.float32),
            jnp.asarray(rng.normal(size=(A, A)).astype(np.float32) * 0.05),
            jnp.zeros((A,), jnp.float32),
        ))

    def dropout(a, key, rate):
        if rate == 0.0:
            return a
        keep = jax.random.bernoulli(key, 1.0 - rate, a.shape)
        return jnp.where(keep, a / (1.0 - rate), 0.0)

    def layer_einsum(p, x, key, drop):
        w_in, b_in, w_out, b_out = p
        qkv = jnp.einsum("bfa,ac->bfc", x, w_in,
                         preferred_element_type=jnp.float32) + b_in
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q4 = q.reshape(B, F, H, hd)
        k4 = k.reshape(B, F, H, hd)
        v4 = v.reshape(B, F, H, hd)
        s = jnp.einsum("bfhd,bghd->bhfg", q4, k4,
                       preferred_element_type=jnp.float32) / math.sqrt(hd)
        a = dropout(jax.nn.softmax(s, axis=-1), key, drop)
        o = jnp.einsum("bhfg,bghd->bfhd", a, v4,
                       preferred_element_type=jnp.float32).reshape(B, F, A)
        return jnp.einsum("bfa,ao->bfo", o, w_out,
                          preferred_element_type=jnp.float32) + b_out

    def layer_bfhg(p, x, key, drop):
        w_in, b_in, w_out, b_out = p
        qkv = jnp.einsum("bfa,ac->bfc", x, w_in,
                         preferred_element_type=jnp.float32) + b_in
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q4 = q.reshape(B, F, H, hd)
        k4 = k.reshape(B, F, H, hd)
        v4 = v.reshape(B, F, H, hd)
        s = jnp.einsum("bfhd,bghd->bfhg", q4, k4,
                       preferred_element_type=jnp.float32) / math.sqrt(hd)
        a = dropout(jax.nn.softmax(s, axis=-1), key, drop)
        o = jnp.einsum("bfhg,bghd->bfhd", a, v4,
                       preferred_element_type=jnp.float32).reshape(B, F, A)
        return jnp.einsum("bfa,ao->bfo", o, w_out,
                          preferred_element_type=jnp.float32) + b_out

    def layer_merged_bh(p, x, key, drop):
        w_in, b_in, w_out, b_out = p
        qkv = jnp.einsum("bfa,ac->bfc", x, w_in,
                         preferred_element_type=jnp.float32) + b_in
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def split(t):
            return t.reshape(B, F, H, hd).transpose(0, 2, 1, 3).reshape(B * H, F, hd)
        q3, k3, v3 = split(q), split(k), split(v)
        s = jax.lax.dot_general(
            q3, k3, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32) / math.sqrt(hd)
        a = dropout(jax.nn.softmax(s, axis=-1), key, drop)
        o = jax.lax.dot_general(
            a, v3, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        o = o.reshape(B, H, F, hd).transpose(0, 2, 1, 3).reshape(B, F, A)
        return jnp.einsum("bfa,ao->bfo", o, w_out,
                          preferred_element_type=jnp.float32) + b_out

    def layer_merged_bh_g(p, x, key, drop):
        # like merged_bh but heads split via reshape-to-[B,F*H,hd]-style
        # gather-free path: [B,F,H,hd]->[B,H,F,hd] handled by dot batch dims
        w_in, b_in, w_out, b_out = p
        qkv = jnp.einsum("bfa,ac->bfc", x, w_in,
                         preferred_element_type=jnp.float32) + b_in
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q4 = q.reshape(B, F, H, hd)
        k4 = k.reshape(B, F, H, hd)
        v4 = v.reshape(B, F, H, hd)
        # batch dims (B, H) carried without pre-transpose
        s = jax.lax.dot_general(
            q4, k4, (((3,), (3,)), ((0, 2), (0, 2))),
            preferred_element_type=jnp.float32) / math.sqrt(hd)  # [B,H,F,G]
        a = dropout(jax.nn.softmax(s, axis=-1), key, drop)
        o = jax.lax.dot_general(
            a, v4, (((3,), (1,)), ((0, 1), (0, 2))),
            preferred_element_type=jnp.float32)  # [B,H,F,hd]
        o = o.transpose(0, 2, 1, 3).reshape(B, F, A)
        return jnp.einsum("bfa,ao->bfo", o, w_out,
                          preferred_element_type=jnp.float32) + b_out

    def mk(layer, drop=DROP):
        def step(carry, key):
            h = carry
            def loss(params, x, key):
                hh = x
                for i in range(L):
                    key, sub = jax.random.split(key)
                    hh = layer(params[i], hh, sub, drop)
                return jnp.sum(jax.nn.relu(hh) ** 2)
            val, (gp, gx) = jax.value_and_grad(loss, argnums=(0, 1))(params, h, key)
            # fold the grad back in so nothing is dead-code-eliminated
            return h + 1e-12 * gx, val

        @jax.jit
        def run(x, keys):
            return jax.lax.scan(step, x, keys)

        return run

    variants = {
        "einsum": mk(layer_einsum),
        "bfhg": mk(layer_bfhg),
        "merged_bh": mk(layer_merged_bh),
        "merged_bh_g": mk(layer_merged_bh_g),
        "nodrop": mk(layer_einsum, drop=0.0),
        "nodrop_mbh": mk(layer_merged_bh, drop=0.0),
    }
    keys = jax.random.split(jax.random.PRNGKey(7), K)
    for name, f in variants.items():
        _, vals = f(x0, keys)
        np.asarray(vals)
        t0 = time.perf_counter()
        for _ in range(8):
            _, vals = f(x0, keys)
        np.asarray(vals)
        dt = (time.perf_counter() - t0) / (8 * K)
        print(f"{name:12s}: {dt*1e3:7.3f} ms/step fwd+bwd (scanned)", flush=True)


if __name__ == "__main__" and __import__("os").environ.get("SCANNED") and not __import__("os").environ.get("REMAT"):
    main_scanned()



def main_remat():
    """Experiment set 2: rematerialization of the attention layers (the
    [B,H,F,G] intermediates are 5.5x lane-padded, so saving them for the
    backward costs real HBM traffic; recompute may be cheaper), plus a
    single-PRNG-call dropout."""
    import jax

    jax.config.update("jax_default_prng_impl", "rbg")
    import jax.numpy as jnp
    import math

    K = 16
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.normal(size=(B, F, A)).astype(np.float32))
    params = []
    for _ in range(L):
        params.append((
            jnp.asarray(rng.normal(size=(A, 3 * A)).astype(np.float32) * 0.05),
            jnp.zeros((3 * A,), jnp.float32),
            jnp.asarray(rng.normal(size=(A, A)).astype(np.float32) * 0.05),
            jnp.zeros((A,), jnp.float32),
        ))

    def dropout(a, key, rate):
        if rate == 0.0:
            return a
        keep = jax.random.bernoulli(key, 1.0 - rate, a.shape)
        return jnp.where(keep, a / (1.0 - rate), 0.0)

    def layer_einsum(p, x, key, drop):
        w_in, b_in, w_out, b_out = p
        qkv = jnp.einsum("bfa,ac->bfc", x, w_in,
                         preferred_element_type=jnp.float32) + b_in
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q4 = q.reshape(B, F, H, hd)
        k4 = k.reshape(B, F, H, hd)
        v4 = v.reshape(B, F, H, hd)
        s = jnp.einsum("bfhd,bghd->bhfg", q4, k4,
                       preferred_element_type=jnp.float32) / math.sqrt(hd)
        a = dropout(jax.nn.softmax(s, axis=-1), key, drop)
        o = jnp.einsum("bhfg,bghd->bfhd", a, v4,
                       preferred_element_type=jnp.float32).reshape(B, F, A)
        return jnp.einsum("bfa,ao->bfo", o, w_out,
                          preferred_element_type=jnp.float32) + b_out

    def mk(layer, drop=DROP, remat=False):
        lay = jax.checkpoint(layer, static_argnums=(3,)) if remat else layer

        def step(carry, key):
            h = carry

            def loss(params, x, key):
                hh = x
                for i in range(L):
                    key, sub = jax.random.split(key)
                    hh = lay(params[i], hh, sub, drop)
                return jnp.sum(jax.nn.relu(hh) ** 2)

            val, (gp, gx) = jax.value_and_grad(loss, argnums=(0, 1))(params, h, key)
            return h + 1e-12 * gx, val

        @jax.jit
        def run(x, keys):
            return jax.lax.scan(step, x, keys)

        return run

    def mk_full_remat(layer, drop=DROP):
        def stack(params, x, key):
            hh = x
            for i in range(L):
                key, sub = jax.random.split(key)
                hh = layer(params[i], hh, sub, drop)
            return jnp.sum(jax.nn.relu(hh) ** 2)

        stack_r = jax.checkpoint(stack)

        def step(carry, key):
            h = carry
            val, (gp, gx) = jax.value_and_grad(stack_r, argnums=(0, 1))(params, h, key)
            return h + 1e-12 * gx, val

        @jax.jit
        def run(x, keys):
            return jax.lax.scan(step, x, keys)

        return run

    variants = {
        "einsum": mk(layer_einsum),
        "einsum_remat": mk(layer_einsum, remat=True),
        "einsum_fullremat": mk_full_remat(layer_einsum),
        "nodrop_remat": mk(layer_einsum, drop=0.0, remat=True),
    }
    keys = jax.random.split(jax.random.PRNGKey(7), K)
    for name, f in variants.items():
        _, vals = f(x0, keys)
        np.asarray(vals)
        t0 = time.perf_counter()
        for _ in range(8):
            _, vals = f(x0, keys)
        np.asarray(vals)
        dt = (time.perf_counter() - t0) / (8 * K)
        print(f"{name:16s}: {dt*1e3:7.3f} ms/step fwd+bwd (scanned)", flush=True)


if __name__ == "__main__" and __import__("os").environ.get("REMAT"):
    main_remat()


def main_dropbits():
    """Experiment set 3: cheaper dropout-mask generation.  bernoulli
    draws uint32 per element and compares in f32; random.bits(uint8)
    quarters the generated bytes and compares in int8.  Combined with
    the head-merged dots from set 1."""
    import jax

    jax.config.update("jax_default_prng_impl", "rbg")
    import jax.numpy as jnp
    import math

    K = 16
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.normal(size=(B, F, A)).astype(np.float32))
    params = []
    for _ in range(L):
        params.append((
            jnp.asarray(rng.normal(size=(A, 3 * A)).astype(np.float32) * 0.05),
            jnp.zeros((3 * A,), jnp.float32),
            jnp.asarray(rng.normal(size=(A, A)).astype(np.float32) * 0.05),
            jnp.zeros((A,), jnp.float32),
        ))

    def drop_bern(a, key, rate):
        keep = jax.random.bernoulli(key, 1.0 - rate, a.shape)
        return jnp.where(keep, a / (1.0 - rate), 0.0)

    def drop_bits8(a, key, rate):
        # keep iff u8 < round(keep_prob*256); keep_prob error < 0.2%
        thresh = jnp.uint8(min(255, round((1.0 - rate) * 256)))
        bits = jax.random.bits(key, a.shape, jnp.uint8)
        return jnp.where(bits < thresh, a / (1.0 - rate), 0.0)

    def mk_layer(score_form, dropout):
        def layer(p, x, key, rate):
            w_in, b_in, w_out, b_out = p
            qkv = jnp.einsum("bfa,ac->bfc", x, w_in,
                             preferred_element_type=jnp.float32) + b_in
            q, k, v = jnp.split(qkv, 3, axis=-1)
            if score_form == "einsum":
                q4 = q.reshape(B, F, H, hd)
                k4 = k.reshape(B, F, H, hd)
                v4 = v.reshape(B, F, H, hd)
                s = jnp.einsum("bfhd,bghd->bhfg", q4, k4,
                               preferred_element_type=jnp.float32) / math.sqrt(hd)
                a = dropout(jax.nn.softmax(s, axis=-1), key, 0.2)
                o = jnp.einsum("bhfg,bghd->bfhd", a, v4,
                               preferred_element_type=jnp.float32).reshape(B, F, A)
            else:  # merged_bh
                def split(t):
                    return t.reshape(B, F, H, hd).transpose(0, 2, 1, 3) \
                            .reshape(B * H, F, hd)
                q3, k3, v3 = split(q), split(k), split(v)
                s = jax.lax.dot_general(
                    q3, k3, (((2,), (2,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32) / math.sqrt(hd)
                a = dropout(jax.nn.softmax(s, axis=-1), key, 0.2)
                o = jax.lax.dot_general(
                    a, v3, (((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32)
                o = o.reshape(B, H, F, hd).transpose(0, 2, 1, 3).reshape(B, F, A)
            return jnp.einsum("bfa,ao->bfo", o, w_out,
                              preferred_element_type=jnp.float32) + b_out
        return layer

    def mk(layer):
        def step(carry, key):
            h = carry

            def loss(params, x, key):
                hh = x
                for i in range(L):
                    key, sub = jax.random.split(key)
                    hh = layer(params[i], hh, sub, 0.2)
                return jnp.sum(jax.nn.relu(hh) ** 2)

            val, (gp, gx) = jax.value_and_grad(loss, argnums=(0, 1))(params, h, key)
            return h + 1e-12 * gx, val

        @jax.jit
        def run(x, keys):
            return jax.lax.scan(step, x, keys)

        return run

    variants = {
        "einsum+bern": mk(mk_layer("einsum", drop_bern)),
        "einsum+bits8": mk(mk_layer("einsum", drop_bits8)),
        "mbh+bern": mk(mk_layer("mbh", drop_bern)),
        "mbh+bits8": mk(mk_layer("mbh", drop_bits8)),
    }
    keys = jax.random.split(jax.random.PRNGKey(7), K)
    for name, f in variants.items():
        _, vals = f(x0, keys)
        np.asarray(vals)
        t0 = time.perf_counter()
        for _ in range(8):
            _, vals = f(x0, keys)
        np.asarray(vals)
        dt = (time.perf_counter() - t0) / (8 * K)
        print(f"{name:14s}: {dt*1e3:7.3f} ms/step fwd+bwd (scanned)", flush=True)


if __name__ == "__main__" and __import__("os").environ.get("DROPBITS"):
    main_dropbits()
