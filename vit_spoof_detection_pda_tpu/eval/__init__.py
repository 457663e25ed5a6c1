"""Evaluation engine (reference L4).

`runner.py`  — batched compiled inference over a dataset (fixed batch
               shape + tail padding: one XLA program, no recompiles).
`single.py`  — single-model evaluation with the test.py artifact contract
               (reference test.py:191-220, 319-451).
`harness.py` — cross-model sweep with the evaluate_all_models artifact
               contract + comparison reports (reference
               evaluate_all_models.py:122-176, 179-279, 358-434).
"""

from .runner import run_inference
from .single import run_single_model_eval
from .harness import run_cross_model_eval

__all__ = ["run_inference", "run_single_model_eval", "run_cross_model_eval"]
