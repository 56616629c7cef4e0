"""Optimizers matching the reference training recipe (train.py:88-120).

Two AdamW optimizers (G and D): lr 2e-4, betas (0.8, 0.99), eps 1e-9, and
torch AdamW's default weight decay 0.01 (the reference does not override it).
LR decays per *epoch* with gamma=lr_decay (ExponentialLR, train.py:109-110);
since steps-per-epoch is data-dependent, the schedule lives outside the jitted
step: the loop computes ``lr_for_epoch`` on the host and writes it into the
optimizer state via ``set_learning_rate`` (optax.inject_hyperparams).
"""

from __future__ import annotations

import optax


def make_optimizer(hps) -> optax.GradientTransformation:
    return optax.inject_hyperparams(optax.adamw)(
        learning_rate=hps.train.learning_rate,
        b1=hps.train.betas[0],
        b2=hps.train.betas[1],
        eps=hps.train.eps,
        weight_decay=0.01,  # torch.optim.AdamW default, used implicitly by train.py:88-97
    )


def lr_for_epoch(hps, epoch: int) -> float:
    """ExponentialLR with last_epoch=epoch-2 semantics: epoch 1 -> base lr
    (train.py:109-110, stepped once per epoch at train.py:119-120)."""
    return float(hps.train.learning_rate) * float(hps.train.lr_decay) ** (epoch - 1)


def set_learning_rate(opt_state, lr: float):
    """Return opt_state with the injected learning_rate hyperparam replaced."""
    import jax.numpy as jnp

    hp = dict(opt_state.hyperparams)
    hp["learning_rate"] = jnp.asarray(lr, dtype=jnp.float32)
    return opt_state._replace(hyperparams=hp)
