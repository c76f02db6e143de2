"""Compile time + step time of the fused attention-stack kernel vs XLA
at bench shapes (B=512, F=23, D=16, A=64, 3 layers, 2 heads)."""

import time

import numpy as np
import jax
import jax.numpy as jnp

from tpurec.nn.interactions import FieldAttention

B, F, D, A = 512, 23, 16, 64


def run(fused: bool, train: bool):
    mod = FieldAttention(atten_embed_dim=A, att_layer_num=3, att_head_num=2,
                         dropout=0.2, fused=fused)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B, F, D)).astype(np.float32))
    variables = mod.init({"params": jax.random.PRNGKey(0),
                          "dropout": jax.random.PRNGKey(1)}, x, train=True)

    def loss(params, x, r):
        out = mod.apply({"params": params}, x, train=train,
                        rngs={"dropout": r} if train else {})
        return jnp.sum(out * out)

    if train:
        f = jax.jit(jax.value_and_grad(loss, argnums=(0, 1)))
    else:
        f = jax.jit(loss)

    t0 = time.perf_counter()
    r = f(variables["params"], x, jax.random.PRNGKey(2))
    jax.tree.map(lambda a: np.asarray(a), r)
    compile_s = time.perf_counter() - t0

    t0 = time.perf_counter()
    for _ in range(16):
        r = f(variables["params"], x, jax.random.PRNGKey(3))
    np.asarray(jax.tree.leaves(r)[0])
    dt = (time.perf_counter() - t0) / 16
    mode = "train fwd+bwd" if train else "eval fwd"
    print(f"fused={fused!s:5s} {mode:13s}: compile {compile_s:7.1f}s, "
          f"step {dt*1e3:7.3f} ms")


if __name__ == "__main__":
    run(False, True)
    run(False, False)
    run(True, False)
    run(True, True)
