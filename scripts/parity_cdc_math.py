"""CDC math parity: run the ACTUAL reference functions (model/cdc.py from
/root/reference, torch CPU) against tpurec.cdc.algorithm on identical random
inputs.  Complements tests/test_cdc_algorithm.py's NumPy oracles with a
direct head-to-head (the same approach as scripts/parity_vs_reference.py for
the model zoo).

Covers: calc_causal_matrix (with/without alpha), calc_domain_lambda_in_group,
get_center_domain_in_group, calc_metric_in_source_group, get_source_domain
(with and without the decaying prior), update_p_weight decay schedules.
"""

import os
import sys
from types import SimpleNamespace

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
REF = os.environ.get("TPUREC_REFERENCE", "/root/reference")


def main():
    sys.path.insert(0, REF)
    import torch

    from model.cdc import CDC as RefCDC

    from tpurec.cdc import algorithm as alg
    from tpurec.config import CDCConfig

    rng = np.random.default_rng(0)
    n_domain, n_mask = 10, 40
    failures = []

    def check(name, a, b, tol=1e-9):
        a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
        err = float(np.max(np.abs(a - b))) if a.shape == b.shape else np.inf
        ok = a.shape == b.shape and err <= tol
        print(f"{name:45s} {'OK ' if ok else 'FAIL'} max|diff|={err:.3e}")
        if not ok:
            failures.append(name)

    # --- calc_causal_matrix (static on both sides) ---
    X = rng.normal(size=(n_mask, n_domain))
    check("calc_causal_matrix",
          RefCDC.calc_causal_matrix(X.copy()), alg.calc_causal_matrix(X))
    check("calc_causal_matrix(alpha=0.05)",
          RefCDC.calc_causal_matrix(X.copy(), alpha=0.05),
          alg.calc_causal_matrix(X, alpha=0.05))

    # --- shared random clustering state ---
    kappa = alg.calc_causal_matrix(X)
    causal = np.arccos(np.clip(kappa, -1.0, 1.0))
    matrix_A = rng.normal(size=(n_domain + 1, n_domain)) * 0.1
    matrix_B = rng.normal(size=(n_domain + 4, n_domain)) * 0.1
    w = rng.random(n_domain)
    w = w / w.sum()
    init_groups = [[0, 3, 5], [1, 2, 9], [4, 6, 7, 8]]

    ref = RefCDC.__new__(RefCDC)
    ref.n_domain = n_domain
    ref.device = "cpu"
    ref.matrix_causal = torch.tensor(causal)
    ref.matrix_A = torch.tensor(matrix_A)
    ref.matrix_B = torch.tensor(matrix_B)
    ref.domain_cnt_weight = torch.tensor(w)
    ref.default_metric_value = 1e6
    ref.is_max_metric_value_better = False
    ref.p_weight = 0.37
    ref.initial_s_group2domain_list = init_groups

    cfg = CDCConfig(n_cluster=3, p_weight=0.37)
    st = alg.CDCClusterState.create(n_domain, 3, cfg)
    st.matrix_causal = causal
    st.matrix_A = matrix_A
    st.matrix_B = matrix_B
    st.p_weight = 0.37
    st.initial_s_group2domain_list = init_groups

    group = [1, 4, 7, 9]
    check("calc_domain_lambda_in_group(all)",
          ref.calc_domain_lambda_in_group(group=group).numpy(),
          alg.calc_domain_lambda_in_group(st, group))
    dom = [0, 2, 9]
    check("calc_domain_lambda_in_group(subset)",
          ref.calc_domain_lambda_in_group(group=group, domain=dom).numpy(),
          alg.calc_domain_lambda_in_group(st, group, dom))
    check("get_center_domain_in_group",
          ref.get_center_domain_in_group(group, center_num=2),
          alg.get_center_domain_in_group(st, group, center_num=2))
    check("calc_metric_in_source_group",
          float(ref.calc_metric_in_source_group(3, group)),
          alg.calc_metric_in_source_group(st, 3, group))

    # --- get_source_domain: with prior and without ---
    for tag in ("with_prior", "no_prior"):
        if tag == "no_prior":
            ref.initial_s_group2domain_list = None
            st.initial_s_group2domain_list = None
        for gi, t_group in enumerate(init_groups):
            r = ref.get_source_domain(list(t_group), min(gi, 2))
            o = alg.get_source_domain(st, list(t_group), min(gi, 2), w)
            check(f"get_source_domain[{tag}][{gi}]",
                  np.asarray(r, np.float64), np.asarray(o, np.float64), tol=0)

    # --- p_weight decay schedules ---
    for method in ("linear_decay", "quadratic_decay", "exponential_decay"):
        ref.config = SimpleNamespace(p_weight=0.4, p_weight_exp_decay=0.4)
        ref.p_weight = 0.4
        ref.p_weight_method = method
        cfg_m = CDCConfig(p_weight=0.4, p_weight_method=method,
                          p_weight_exp_decay=0.4)
        st_m = alg.CDCClusterState.create(n_domain, 3, cfg_m)
        st_m.p_weight = 0.4
        refs, ours = [], []
        for call in range(1, 6):
            ref.call_update_group = call
            st_m.call_update_group = call
            ref.update_p_weight()
            alg._update_p_weight(st_m, cfg_m)
            refs.append(ref.p_weight)
            ours.append(st_m.p_weight)
        check(f"update_p_weight[{method}]", refs, ours)

    # --- full update_group: call 1 (KMeans seeding) + call 2 (iterative
    # re-assignment), with EMA matrix blending, on identical random
    # matrices.  save_draw_matrix is stubbed (artifact IO), and the
    # reference's unseeded sklearn KMeans is pinned to the same seeded
    # call ours uses so the comparison is deterministic. ---
    RefCDC.save_draw_matrix = lambda self, *a, **k: None
    RefCDC.kmeans_group = staticmethod(
        lambda mc, ncl: alg.kmeans_group(np.asarray(mc), ncl, seed=123))

    for affinity in ("minus", "divide"):
        cfg2 = CDCConfig(n_cluster=3, p_weight=0.4,
                         p_weight_method="exponential_decay",
                         p_weight_exp_decay=0.4, affinity_func=affinity,
                         old_matrix_weight=0.3, cluster_mode="iterative")
        st2 = alg.CDCClusterState.create(n_domain, 3, cfg2)

        r = RefCDC.__new__(RefCDC)
        r.n_domain, r.n_cluster, r.device = n_domain, 3, "cpu"
        r.config = SimpleNamespace(p_weight=0.4, p_weight_exp_decay=0.4,
                                   affinity_func=affinity)
        r.p_weight, r.p_weight_method = 0.4, "exponential_decay"
        r.old_matrix_weight = 0.3
        r.old_matrix_A = r.old_matrix_B = r.old_matrix_mask = None
        r.call_update_group = 0
        # metric direction flips for 'divide' (cdc.py:88-93); use_metric='loss'
        if affinity == "divide":
            r.default_metric_value, r.is_max_metric_value_better = -1e6, True
        else:
            r.default_metric_value, r.is_max_metric_value_better = 1e6, False
        r.domain_cnt_weight = torch.tensor(w)
        r.domain2group = torch.zeros(n_domain, dtype=torch.int64)
        r.domain2group_list = [0] * n_domain
        r.t_group2domain_list = None
        r.s_group2domain_list = None
        r.initial_s_group2domain_list = None

        for call in (1, 2):
            # fresh "populated" matrices, identical on both sides (divide
            # needs positive losses)
            mA = rng.random((n_domain + 1, n_domain)) + 0.3
            mB = rng.random((n_domain + 3, n_domain)) + 0.3
            mM = rng.random((n_mask, n_domain)) + 0.3
            r.matrix_A = torch.tensor(mA.copy())
            r.matrix_B = torch.tensor(mB.copy())
            r.matrix_mask = torch.tensor(mM.copy())
            st2.matrix_A, st2.matrix_B = mA.copy(), mB.copy()
            st2.matrix_mask = mM.copy()

            # call 1 seeds via KMeans; call 2 exercises the re-assignment —
            # iterative for 'minus', greedy for 'divide' (covers both modes)
            mode = "greedy" if (call == 2 and affinity == "divide") else "iterative"
            if mode == "greedy":
                cfg2 = CDCConfig(**{**cfg2.__dict__, "cluster_mode": "greedy"})
            ref_groups = r.update_group(mode=mode)
            our_groups = alg.update_group(st2, cfg2, w, kmeans_seed=123)
            check(f"update_group[{affinity}][call {call}].domain2group",
                  np.asarray(ref_groups, np.float64),
                  np.asarray(our_groups, np.float64), tol=0)
            for gi in range(3):
                check(f"update_group[{affinity}][call {call}].s_group[{gi}]",
                      np.asarray(r.s_group2domain_list[gi], np.float64),
                      np.asarray(st2.s_group2domain_list[gi], np.float64),
                      tol=0)
            check(f"update_group[{affinity}][call {call}].matrix_A",
                  r.matrix_A.numpy(), st2.matrix_A, tol=1e-12)
            check(f"update_group[{affinity}][call {call}].matrix_B",
                  r.matrix_B.numpy(), st2.matrix_B, tol=1e-12)
            check(f"update_group[{affinity}][call {call}].matrix_mask",
                  r.matrix_mask.numpy(), st2.matrix_mask, tol=1e-12)
            check(f"update_group[{affinity}][call {call}].matrix_causal",
                  r.matrix_causal.numpy(), st2.matrix_causal, tol=1e-5)
            check(f"update_group[{affinity}][call {call}].p_weight",
                  r.p_weight, st2.p_weight)

    print()
    if failures:
        print("FAILED:", failures)
        sys.exit(1)
    print("All CDC math functions match the reference implementation.")


if __name__ == "__main__":
    main()
