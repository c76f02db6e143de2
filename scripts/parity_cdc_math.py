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

    print()
    if failures:
        print("FAILED:", failures)
        sys.exit(1)
    print("All CDC math functions match the reference implementation.")


if __name__ == "__main__":
    main()
