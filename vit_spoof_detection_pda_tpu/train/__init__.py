"""Training engine (reference L3).

`schedule.py`   — cosine LR schedule incl. the reference's no-warmup quirk.
`state.py`      — TrainState pytree + optimizer construction.
`step.py`       — pjit-compiled train/eval steps over a device mesh.
`early_stop.py` — patience-based early stopping controller.
`trainer.py`    — config-driven orchestrator (reference train(),
                  train_advanced.py:492-693).
`sweep.py`      — hyperparameter sweep driver (random + quasi-Bayes),
                  reference run_sweep(), train_advanced.py:697-744.
"""

from .early_stop import EarlyStopping  # noqa: F401
from .schedule import make_lr_schedule  # noqa: F401
from .state import TrainState, make_optimizer, create_train_state  # noqa: F401
from .step import make_train_step, make_eval_step  # noqa: F401
from .trainer import Trainer  # noqa: F401
