"""Tiny per-atom MLPs with the reference's activation-function table.

The reference evaluates a per-atom feed-forward network and its hand-coded
layer Jacobian (annp_feed_forward, fe/src/pair_annp.cpp:731-791). Here only
the forward pass is hand-written; dE/dG comes from `jax.grad`/`jax.vjp`,
which is algebraically identical to the reference's
diag(act') @ W layer-product.

Activation flags (fe/src/pair_annp.cpp:699-729) and their per-variant
coefficient sets:

  flag 0 "linear":  x
  flag 1 "hyperbolic": tanh(x)
  flag 2 "sigmoid": 1/(1+exp(+x))  -- the reference's sign quirk
                    (fe/src/pair_annp.cpp:715), reproduced verbatim
  flag 3 "modified tanh":
      fe:   1.7159*tanh(2x/3)
      ni:   tanh(x)                 (ni/src/pair_annp.cpp actf)
      anna: 1.7*tanh(0.3x)          (pair_anna_adp.cpp:695-717)
  flag 4 "tanh" (twisted):
      fe:   1.7159*tanh(2x/3) + 0.1x
      ni:   tanh(x)
      anna: 1.7*tanh(0.3x)

All shipped potentials use the "<descr> tanh tanh linear" line, which parses
to flags [4, 4, 0].
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..io.potential import ActivationStyle

_FE_A = 1.7159
_FE_B = 0.666666666666667
_FE_C = 0.1
_ANNA_A = 1.7
_ANNA_B = 0.3


def activation(x, flag: int, style: str):
    if flag == 0:
        return x
    if flag == 1:
        return jnp.tanh(x)
    if flag == 2:
        return 1.0 / (1.0 + jnp.exp(x))
    if style == ActivationStyle.FE:
        if flag == 3:
            return _FE_A * jnp.tanh(_FE_B * x)
        return _FE_A * jnp.tanh(_FE_B * x) + _FE_C * x
    if style == ActivationStyle.ANNA:
        return _ANNA_A * jnp.tanh(_ANNA_B * x)
    return jnp.tanh(x)          # ni: flags 3 and 4 are plain tanh


def mlp_apply(weights, biases, flagact, style, g):
    """Apply the stacked-layer MLP to descriptor vector(s).

    Args:
      weights/biases: tuples per layer; weights[l] is [n_out, n_in] (or
        [..., n_out, n_in] with leading element axes already selected).
      flagact: static tuple of activation flags per layer.
      style: ActivationStyle.
      g: [..., nsf] descriptor vector(s).
    Returns:
      [..., n_out_last] network output.
    """
    h = g
    for w, b, flag in zip(weights, biases, flagact):
        # HIGHEST precision: TPU matmuls otherwise run bfloat16 passes,
        # which breaks <1e-6 force parity through the dE/dG chain
        h = jnp.matmul(h, jnp.swapaxes(w, -1, -2),
                       precision=jax.lax.Precision.HIGHEST) + b
        h = activation(h, flag, style)
    return h
