"""On-hardware sanity of the Pallas kernels (CI runs interpret-mode only).

Run on the real chip: PYTHONPATH=/root/repo:/root/.axon_site python
scripts/check_kernels_tpu.py
"""

import numpy as np
import jax
import jax.numpy as jnp


def main():
    from tpurec.ops.crossnet_pallas import cross_network_fused

    rng = np.random.default_rng(0)
    B, D, L = 512, 368, 3
    x = jnp.asarray(rng.normal(size=(B, D)).astype(np.float32) * 0.1)
    w = jnp.asarray(rng.normal(size=(L, D)).astype(np.float32) * 0.1)
    b = jnp.asarray(rng.normal(size=(L, D)).astype(np.float32) * 0.1)

    def ref(x, w, b):
        x0, out = x, x
        for i in range(L):
            out = x0 * (out @ w[i][:, None]) + b[i] + out
        return out

    fwd_err = float(np.abs(
        np.asarray(cross_network_fused(x, w, b, False)) - np.asarray(ref(x, w, b))
    ).max())
    g = jax.grad(lambda *a: jnp.sum(cross_network_fused(*a, False) ** 2),
                 argnums=(0, 1, 2))(x, w, b)
    gr = jax.grad(lambda *a: jnp.sum(ref(*a) ** 2), argnums=(0, 1, 2))(x, w, b)
    grad_errs = [float(jnp.abs(a - b).max()) for a, b in zip(g, gr)]
    print(f"crossnet fused: fwd max err {fwd_err:.2e}, "
          f"grad max errs {['%.2e' % e for e in grad_errs]}")
    assert fwd_err < 1e-5 and max(grad_errs) < 1e-2
    print("OK")


if __name__ == "__main__":
    main()
