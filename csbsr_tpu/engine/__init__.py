from .phase import PhaseConfig, phase_config_from_cfg, compute_phase
from .losses_glue import build_loss_fn
from .train_state import TrainState, create_train_state, grad_group_ids, make_train_step
from .trainer import do_train, build_train_step, build_eval_step, make_degrade_fn
