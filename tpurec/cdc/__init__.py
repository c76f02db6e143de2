from tpurec.cdc.algorithm import (
    CDCClusterState,
    calc_causal_matrix,
    calc_domain_lambda_in_group,
    kmeans_group,
    update_group,
)
from tpurec.cdc.engine import CDCTrainer
