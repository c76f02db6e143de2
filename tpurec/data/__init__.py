from tpurec.data.synthetic import SyntheticMultiDomain, make_synthetic
