from d2r_tpu.train.trainer import Trainer  # noqa: F401
from d2r_tpu.train.state import TrainState, create_train_state, make_eval_step, make_train_step  # noqa: F401
from d2r_tpu.train.optimizer import make_optimizer, param_group_label  # noqa: F401
