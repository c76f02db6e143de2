from tpurec.train.reg import reg_coef_tree, regularization_loss
from tpurec.train.step import (
    bce_with_logits,
    bce_on_probs,
    make_eval_step,
    make_train_step,
    TrainState,
)
from tpurec.train.loop import Trainer
