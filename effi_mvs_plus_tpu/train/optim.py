"""Optimizer + LR schedule matching the reference recipe.

Reference (train.py:441-442,510-511): AdamW(lr, weight_decay=1e-3,
eps=1e-8) over ALL parameters, with torch OneCycleLR(max_lr, total_steps,
pct_start=0.05, anneal_strategy='linear') — linear warmup from
max_lr/25 over 5% of steps, then linear anneal to max_lr/25/1e4.

BN running stats live in the same pytree as weights (they're state, not
parameters) — they are masked out of the optimizer so AdamW's decoupled
weight decay never touches them; their updates come from the forward
pass's Ctx (nn.merge_bn_updates).
"""

from __future__ import annotations

import optax


_STATE_LEAVES = ("running_mean", "running_var")


def trainable_mask(params):
    """Same-structure pytree of bools: False for BN running stats."""
    def rec(node, key=None):
        if isinstance(node, dict):
            return {k: rec(v, k) for k, v in node.items()}
        return key not in _STATE_LEAVES
    return rec(params)


def onecycle_linear(max_lr, total_steps, pct_start=0.05, div_factor=25.0,
                    final_div_factor=1e4):
    init = max_lr / div_factor
    final = init / final_div_factor
    warm = max(int(total_steps * pct_start), 1)
    return optax.join_schedules(
        [optax.linear_schedule(init, max_lr, warm),
         optax.linear_schedule(max_lr, final, max(total_steps - warm, 1))],
        [warm])


def make_optimizer(lr, total_steps, weight_decay=1e-3, params=None,
                   schedule=None):
    sched = schedule or onecycle_linear(lr, total_steps)
    tx = optax.adamw(sched, b1=0.9, b2=0.999, eps=1e-8,
                     weight_decay=weight_decay)
    if params is not None:
        tx = optax.masked(tx, trainable_mask(params))
    return tx, sched
