from tpurec.data.hashing import apply_hash_trick, hash_ids
from tpurec.data.synthetic import SyntheticMultiDomain, make_synthetic
